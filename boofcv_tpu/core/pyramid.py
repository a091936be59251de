"""Image-pyramid containers.

Reference analog: boofcv-types struct/pyramid/ImagePyramid.java,
PyramidDiscrete.java.  A pyramid is simply a tuple of arrays (one per
level) — a pytree, so it flows through jit/vmap.  Construction lives in
:mod:`boofcv_tpu.ip.pyramid_ops`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple


@dataclass(frozen=True)
class PyramidConfig:
    """Discrete pyramid scales, e.g. (1, 2, 4, 8).

    Matches the reference VO config PkltConfig.pyramidScaling
    (examples/ExampleVisualOdometryStereo.java:66).
    """

    scales: Tuple[int, ...] = (1, 2, 4, 8)
    sigma: float = -1.0  # blur applied before each decimation; <0 = auto

    def __post_init__(self):
        s = self.scales
        if not s or s[0] != 1:
            raise ValueError("pyramid scales must start at 1")
        for a, b in zip(s, s[1:]):
            if b % a != 0 or b <= a:
                raise ValueError("scales must be increasing and divisible")

    @property
    def num_levels(self) -> int:
        return len(self.scales)


def pyramid_shapes(config: PyramidConfig, height: int, width: int) -> Sequence[tuple[int, int]]:
    return [(height // s, width // s) for s in config.scales]
