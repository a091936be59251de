"""Scan a directory of images for QR codes.

Reference analog: applications/.../BatchScanQrCodes.java.

Usage: python -m boofcv_tpu.cli.batch_scan_qr --images DIR
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True)
    args = ap.parse_args(argv)

    from boofcv_tpu.io import image_io
    from boofcv_tpu.recognition.qr import detector

    files = sorted(f for f in os.listdir(args.images)
                   if os.path.splitext(f)[1].lower() in
                   (".png", ".pgm", ".ppm"))
    found = 0
    for f in files:
        img = image_io.to_gray(image_io.load(os.path.join(args.images, f)))
        out, info = detector.detect_and_decode(img)
        if out is None:
            print(f"{f}: no QR ({info.get('error')})")
        else:
            found += 1
            print(f"{f}: v{info['version']}-{info['level']} "
                  f"\"{out.decode('utf8', 'replace')}\"")
    print(f"decoded {found}/{len(files)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
