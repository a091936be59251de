"""Command-line applications.

Reference analog: applications/ (CameraCalibration.java,
BatchScanQrCodes.java, CreateFiducialSquareImage, ...) and examples/ —
thin argparse CLIs over the library.

Run as ``python -m boofcv_tpu.cli.<tool>``.
"""
