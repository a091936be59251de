"""QR code encode/decode.

Reference analog: boofcv-recognition alg/fiducial/qrcode/ —
QrCode.java (spec tables), QrCodeEncoder/QrCodeGenerator,
QrCodeDecoderBits/QrCodeDecoderImage, ReidSolomonCodes.java,
GaliosFieldTableOps.java, QrCodeMaskPattern, position pattern detection.
"""

from boofcv_tpu.recognition.qr.galois import GF256  # noqa: F401
from boofcv_tpu.recognition.qr.reed_solomon import ReedSolomon  # noqa: F401
