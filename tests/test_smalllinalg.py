"""Closed-form small-linalg oracles vs numpy."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.geo import smalllinalg as sl


def test_inv3_batched():
    rng = np.random.default_rng(0)
    A = rng.normal(0, 1, (50, 3, 3)) + 3 * np.eye(3)
    Ainv = np.asarray(sl.inv3(jnp.asarray(A)))
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), atol=1e-10)


def test_inv2_and_solve33():
    rng = np.random.default_rng(1)
    A2 = rng.normal(0, 1, (20, 2, 2)) + 2 * np.eye(2)
    np.testing.assert_allclose(np.asarray(sl.inv2(jnp.asarray(A2))),
                               np.linalg.inv(A2), atol=1e-10)
    A3 = rng.normal(0, 1, (20, 3, 3)) + 3 * np.eye(3)
    b = rng.normal(0, 1, (20, 3))
    np.testing.assert_allclose(np.asarray(sl.solve33(jnp.asarray(A3), jnp.asarray(b))),
                               np.linalg.solve(A3, b[..., None])[..., 0],
                               atol=1e-9)


def test_solve_spd():
    rng = np.random.default_rng(2)
    M = rng.normal(0, 1, (10, 6, 6))
    A = M @ M.transpose(0, 2, 1) + 0.1 * np.eye(6)
    b = rng.normal(0, 1, (10, 6))
    x = np.asarray(sl.solve_spd(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b[..., None])[..., 0],
                               atol=1e-8)


def test_cubic_roots_three_real():
    # (x-1)(x-2)(x+3) = x^3 - 7x + 6... expand: x^3 +0x^2 -7x +6
    roots, real = sl.cubic_roots(jnp.float64(1), jnp.float64(0),
                                 jnp.float64(-7), jnp.float64(6))
    r = np.sort(np.asarray(roots)[np.asarray(real)])
    np.testing.assert_allclose(r, [-3, 1, 2], atol=1e-9)


def test_cubic_roots_one_real():
    # (x-2)(x^2+1) = x^3 - 2x^2 + x - 2
    roots, real = sl.cubic_roots(jnp.float64(1), jnp.float64(-2),
                                 jnp.float64(1), jnp.float64(-2))
    r = np.asarray(roots)[np.asarray(real)]
    assert r.size == 1
    np.testing.assert_allclose(r, [2.0], atol=1e-9)


def test_cubic_roots_batch_random():
    rng = np.random.default_rng(3)
    c = rng.normal(0, 1, (200, 4))
    c[:, 0] = np.where(np.abs(c[:, 0]) < 0.1, 1.0, c[:, 0])
    roots, real = sl.cubic_roots(*[jnp.asarray(c[:, i]) for i in range(4)])
    roots, real = np.asarray(roots), np.asarray(real)
    vals = (c[:, [0]] * roots ** 3 + c[:, [1]] * roots ** 2
            + c[:, [2]] * roots + c[:, [3]])
    assert np.abs(vals[real]).max() < 1e-6


def test_quartic_roots_known():
    # (x-1)(x+2)(x-3)(x+4) = x^4 +2x^3 -13x^2 -14x + 24
    roots, real = sl.quartic_roots(jnp.float64(1), jnp.float64(2),
                                   jnp.float64(-13), jnp.float64(-14),
                                   jnp.float64(24))
    r = np.sort(np.asarray(roots)[np.asarray(real)])
    np.testing.assert_allclose(r, [-4, -2, 1, 3], atol=1e-7)


def test_quartic_roots_batch_random():
    rng = np.random.default_rng(4)
    c = rng.normal(0, 1, (300, 5))
    c[:, 0] = np.where(np.abs(c[:, 0]) < 0.1, 1.0, c[:, 0])
    roots, real = sl.quartic_roots(*[jnp.asarray(c[:, i]) for i in range(5)])
    roots, real = np.asarray(roots), np.asarray(real)
    vals = sum(c[:, [i]] * roots ** (4 - i) for i in range(5))
    # every reported-real root satisfies the quartic
    assert np.abs(vals[real]).max() < 1e-5
    # and we find at least as many real roots as numpy does
    for i in range(0, 300, 17):
        np_real = np.sort([r.real for r in np.roots(c[i]) if abs(r.imag) < 1e-9])
        ours = np.sort(roots[i][real[i]])
        assert len(ours) >= len(np_real) - 0  # same count
        if len(np_real):
            np.testing.assert_allclose(ours[: len(np_real)], np_real, atol=1e-5)
