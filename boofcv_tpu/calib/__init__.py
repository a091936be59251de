"""Camera calibration (Zhang99 planar) — reference analog:
boofcv-calibration abst/geo/calibration/CalibrateMonoPlanar.java:62 and
alg/geo/calibration/CalibrationPlanarGridZhang99.java:67."""
