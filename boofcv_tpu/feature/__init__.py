"""Feature detection/description/association/tracking, disparity, flow.

Reference analog: main/boofcv-feature (133k LoC).  Design rules:
* detections live in fixed-capacity (N, ...) arrays with validity masks,
  produced by top-k selection (never data-dependent shapes);
* per-feature work is vmap-batched; association is matmul-shaped.
"""
