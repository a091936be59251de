"""Geometric vision (reference analog: main/boofcv-geo, 66k LoC).

Camera models, epipolar geometry, PnP, triangulation, rectification,
hypothesis-parallel RANSAC, and the block-sparse Schur bundle-adjustment
solver the reference delegates to ddogleg (we own it — SURVEY §3.3).

All solvers are dtype-polymorphic pure functions over batched arrays:
points are [N, 2]/[N, 3], poses are (R [3,3], t [3]) or se3 6-vectors,
minimal solvers vmap over hypothesis banks.
"""
