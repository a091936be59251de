"""I/O and simulation: calibration YAML, PLY point clouds, BAL codec,
image loading, synthetic-world rendering (test oracle).

Reference analog: boofcv-io (io/calibration/CalibrationIO.java,
io/points/PlyCodec, io/geo/CodecBundleAdjustmentInTheLarge.java) and
boofcv-simulation (SimulatePlanarWorld.java).
"""
