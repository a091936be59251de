"""Structure-from-motion: stereo depth, visual odometry, reconstruction.

Reference analog: boofcv-sfm (abst/sfm/d3/StereoVisualOdometry.java,
alg/sfm/d3/VisOdomPixelDepthPnP.java, alg/sfm/structure/).
"""
