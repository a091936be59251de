"""Native C++ host finishers vs the pure-Python/JAX reference paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu import native
from boofcv_tpu.ip import binary




def random_binary(rng, h, w, density=0.35):
    return (rng.random((h, w)) < density).astype(np.uint8)


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
@pytest.mark.parametrize("eight", [False, True])
def test_native_ccl_matches_jax_label_propagation(eight):
    rng = np.random.default_rng(0)
    for trial in range(4):
        img = random_binary(rng, 40, 57, density=0.3 + 0.1 * trial)
        lab_n, n = native.ccl(img, eight=eight)
        lab_j = binary.relabel_compact(
            binary.label_blobs(jnp.asarray(img), eight=eight))
        np.testing.assert_array_equal(lab_n, lab_j)
        assert n == int(lab_j.max())


@needs_native
def test_native_contours_match_python_tracer():
    rng = np.random.default_rng(1)
    for density in (0.15, 0.35, 0.6):
        img = random_binary(rng, 31, 44, density)
        got = binary.contour_external(img)          # native path
        want = binary._contour_external_py(img)     # python reference
        assert len(got) == len(want)
        for g, w_ in zip(got, want):
            np.testing.assert_array_equal(g, w_)


@needs_native
def test_native_contours_shapes():
    # single square blob: perimeter trace, CW, starts at top-left
    img = np.zeros((10, 12), np.uint8)
    img[2:7, 3:9] = 1
    (c,) = binary.contour_external(img)
    assert c[0].tolist() == [3, 2]
    # every contour pixel is on the blob boundary
    for x, y in c:
        assert img[y, x] == 1


def test_label_blobs_host_fallback_consistency():
    # works regardless of native availability
    rng = np.random.default_rng(2)
    img = random_binary(rng, 24, 30, 0.4)
    lab, n = binary.label_blobs_host(img, eight=True)
    lab_j = binary.relabel_compact(
        binary.label_blobs(jnp.asarray(img), eight=True))
    np.testing.assert_array_equal(lab, lab_j)
    assert n == int(lab_j.max())
