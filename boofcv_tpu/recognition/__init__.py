"""Recognition: calibration targets, fiducials, QR codes, scene
classification.

Reference analog: boofcv-recognition (alg/fiducial/, alg/tracker/tld,
alg/scene/; abst/fiducial/calib/).
"""
