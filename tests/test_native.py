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
    # contour_external routes through contours_with_holes (one external
    # per blob); parity = native Chang2004 vs the pure-Python fallback
    from boofcv_tpu import native

    rng = np.random.default_rng(1)
    for density in (0.15, 0.35, 0.6):
        img = random_binary(rng, 31, 44, density)
        got = binary.contour_external(img)          # native when available
        orig = native.contours_with_holes
        native.contours_with_holes = lambda *a, **k: None
        try:
            want = binary.contour_external(img)     # python fallback
        finally:
            native.contours_with_holes = orig
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


def test_native_contours_with_holes_matches_python():
    import os
    import numpy as np
    from boofcv_tpu import native
    from boofcv_tpu.ip import binary

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    for trial in range(4):
        img = (rng.random((48, 64)) < 0.55).astype(np.uint8)
        # close morphologically so blobs have real holes
        import jax.numpy as jnp
        img = np.asarray(binary.closing(jnp.asarray(img), eight=True))
        res_n = native.contours_with_holes(img)
        assert res_n is not None, "native path did not run"
        os.environ["BOOFCV_TPU_NO_NATIVE"] = "1"
        try:
            # force the pure-Python walker (module reload not needed:
            # the fallback path is taken when native returns None, so
            # call the python internals directly)
            img_b = img > 0
            res_p = binary.contours_with_holes.__wrapped__(img_b) \
                if hasattr(binary.contours_with_holes, "__wrapped__") \
                else None
        finally:
            del os.environ["BOOFCV_TPU_NO_NATIVE"]
        if res_p is None:
            # compare against a manual python invocation of the walker
            # by temporarily hiding the native result
            orig = native.contours_with_holes
            native.contours_with_holes = lambda b: None
            try:
                res_p = binary.contours_with_holes(img_b)
            finally:
                native.contours_with_holes = orig
        assert len(res_n) == len(res_p), trial
        for bn, bp in zip(res_n, res_p):
            assert bn["label"] == bp["label"]
            assert (bn["external"] is None) == (bp["external"] is None)
            if bn["external"] is not None:
                assert np.array_equal(bn["external"], bp["external"]), trial
            assert len(bn["internal"]) == len(bp["internal"]), (
                trial, bn["label"])
            for cn, cp in zip(bn["internal"], bp["internal"]):
                assert np.array_equal(cn, cp), trial
