"""Smoke tests: every runnable example must pass its own built-in check
(exit code 0) on synthetic data — the examples are the de-facto
acceptance surface of the reference (78 files under examples/)."""

import importlib

import pytest

EXAMPLES = [
    "fundamental_matrix",
    "associate_points",
    "stereo_disparity",
    "image_stitching",
    "dense_optical_flow",
    "background_removal",
    "fiducial_pose",
    "tracker_object",
    "point_feature_tracker",
    "multiview_reconstruction",
    "pnp",
    "bundle_adjustment",
    "detect_qr_code",
    "segment_superpixels",
    "stereo_uncalibrated",
    "image_filtering",
    "image_enhancement",
    "line_detection",
    "template_matching",
    "classify_scene_knn",
    "detect_calibration_points",
    "remove_lens_distortion",
    "remove_perspective",
    "video_stabilization",
    "uncalibrated_reconstruction",
    "canny_edge",
    "morphological_thinning",
    "equirectangular_views",
    "color_histogram_lookup",
    "visual_odometry_depth",
    "visual_odometry_mono_plane",
    "stereo_disparity_3d",
    "trifocal_uncalibrated_stereo",
    "wavelet_denoise",
    "watershed_with_seeds",
    "stereo_calibration",
    "create_qr_document",
    "fit_shapes",
    "segment_graph_fh04",
    "dense_image_features",
    "fisheye_calibration",
    "tracker_mean_shift",
    "thresholding_techniques",
    "line_segments_ransac",
    "background_moving_camera",
    "binary_ops",
    "color_space",
    "fourier_transform",
    "interpolation_zoo",
    "image_pyramids",
    "corner_features",
    "feature_surf",
    "depth_point_cloud",
    "rectify_calibrated_stereo",
    "pose_of_calibration_target",
    "point_deform_mls",
    "overhead_view",
    "fiducial_image",
    "image_classification",
    "video_mosaic",
    "visual_odometry_stereo",
    "segment_mean_shift",
    "planar_images",
    "convolution",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    mod = importlib.import_module(f"boofcv_tpu.examples.{name}")
    rc = mod.main([])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "OK" in out
