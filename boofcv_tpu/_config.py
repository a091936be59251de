"""Global precision policy.

The reference does all geometry in f64 (Java doubles). On TPU the image /
feature path runs f32 (bf16 where accuracy allows), while the small-matrix
geometry solvers (epipolar, PnP, BA normal equations) want f64 for
conditioning.  We therefore enable jax x64 support once at import time —
this *permits* f64 arrays, it does not change the dtype of any op whose
inputs are f32 — and every image op in this package is explicit about its
compute dtype.

Reference analog: BoofCV generates `_F32` twins of `_F64` geometry code
(main/autocode Autocode64to32App.java:27); here the same solver is
dtype-polymorphic and the caller picks the precision.
"""

import jax

_X64_ENABLED = False


def enable_x64_for_geometry() -> None:
    global _X64_ENABLED
    if not _X64_ENABLED:
        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True


enable_x64_for_geometry()
