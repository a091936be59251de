"""Image processing ops (reference analog: main/boofcv-ip, 225k LoC).

Everything operates on f32 (H, W) or (H, W, C) arrays and is jit-friendly:
static shapes, no data-dependent control flow.  The reference's ~40% of
generated per-dtype/per-thread code collapses into these dtype-generic
XLA-compiled functions.
"""
