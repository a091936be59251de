"""Color-space conversions (reference analog: boofcv-ip alg/color/*).

All elementwise on (H, W, 3) f32 arrays (or any leading shape with a
trailing channel axis); value conventions follow the reference:
RGB in [0,255] (or [0,1] for the *_unit variants), HSV hue in radians
[0, 2pi) as in ColorHsv.java.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Weighted average as in ConvertImage.average? BoofCV uses plain mean
    for Planar->gray; keep the plain mean to match."""
    return jnp.mean(rgb.astype(jnp.float32), axis=-1)


def rgb_to_hsv(rgb: jnp.ndarray):
    """ColorHsv.rgbToHsv: h in radians [0, 2pi), s in [0,1], v = max."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    s = jnp.where(v != 0, delta / v, 0.0)
    safe = jnp.where(delta == 0, 1.0, delta)
    hr = (g - b) / safe
    hg = 2.0 + (b - r) / safe
    hb = 4.0 + (r - g) / safe
    h = jnp.where(r == v, hr, jnp.where(g == v, hg, hb))
    h = h * (jnp.pi / 3.0)
    h = jnp.where(h < 0, h + 2 * jnp.pi, h)
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = h / (jnp.pi / 3.0)
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_yuv(rgb: jnp.ndarray):
    """ColorYuv.rgbToYuv (analog YUV, not YCbCr)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 0.492 * (b - y)
    v = 0.877 * (r - y)
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv: jnp.ndarray):
    y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    r = y + 1.13983 * v
    g = y - 0.39465 * u - 0.58060 * v
    b = y + 2.032 * u
    return jnp.stack([r, g, b], axis=-1)


def _srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    return jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * c ** (1 / 2.4) - 0.055)


# sRGB D65 matrices (ColorXyz.java)
_RGB2XYZ = jnp.array([[0.412453, 0.357580, 0.180423],
                      [0.212671, 0.715160, 0.072169],
                      [0.019334, 0.119193, 0.950227]], dtype=jnp.float32)
_XYZ2RGB = jnp.array([[3.240479, -1.53715, -0.498535],
                      [-0.969256, 1.875991, 0.041556],
                      [0.055648, -0.204043, 1.057311]], dtype=jnp.float32)


def rgb_to_xyz(rgb_unit: jnp.ndarray):
    """ColorXyz.rgbToXyz on [0,1] RGB (applies sRGB gamma linearization)."""
    lin = _srgb_to_linear(rgb_unit)
    return jnp.einsum("...c,rc->...r", lin, _RGB2XYZ)


def xyz_to_rgb(xyz: jnp.ndarray):
    lin = jnp.einsum("...c,rc->...r", xyz, _XYZ2RGB)
    return _linear_to_srgb(jnp.clip(lin, 0.0, 1.0))


_D65 = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)


def xyz_to_lab(xyz: jnp.ndarray):
    """ColorLab.java: CIELAB with D65 white point."""
    xr = xyz / _D65
    eps = 0.008856
    kap = 903.3
    f = jnp.where(xr > eps, jnp.cbrt(xr), (kap * xr + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_xyz(lab: jnp.ndarray):
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    eps = 0.008856
    kap = 903.3

    def inv(f, use_l=None):
        f3 = f ** 3
        return jnp.where(f3 > eps, f3, (116.0 * f - 16.0) / kap)

    x = inv(fx)
    y = jnp.where(L > kap * eps, ((L + 16.0) / 116.0) ** 3, L / kap)
    z = inv(fz)
    return jnp.stack([x, y, z], axis=-1) * _D65


def rgb_to_lab(rgb_unit: jnp.ndarray):
    return xyz_to_lab(rgb_to_xyz(rgb_unit))


def lab_to_rgb(lab: jnp.ndarray):
    return xyz_to_rgb(lab_to_xyz(lab))


def yuv420_to_rgb(y_plane, u_plane, v_plane):
    """Planar YUV 4:2:0 (e.g. Android Yuv420_888) -> RGB u8-range f32.

    Reference analog: boofcv-ip core/encoding/ConvertYuv420_888.java.
    y_plane: [H, W]; u/v planes: [H//2, W//2] (one chroma sample per 2x2
    luma block).  Uses the JPEG/Android full-range BT.601 coefficients the
    reference's NV21/YUV420 decoders use.
    """
    y = jnp.asarray(y_plane, jnp.float32)
    u = jnp.asarray(u_plane, jnp.float32) - 128.0
    v = jnp.asarray(v_plane, jnp.float32) - 128.0
    # upsample chroma 2x (nearest, as the reference's integer decoder);
    # odd-size luma planes need one row/col of edge padding — the bare
    # [:H] slice cannot EXTEND the 2*(H//2) upsample and the RGB
    # broadcast crashed for any odd H or W
    def up(c):
        c2 = jnp.repeat(jnp.repeat(c, 2, 0), 2, 1)
        pad_y = y.shape[0] - c2.shape[0]
        pad_x = y.shape[1] - c2.shape[1]
        if pad_y > 0 or pad_x > 0:
            c2 = jnp.pad(c2, ((0, max(pad_y, 0)), (0, max(pad_x, 0))),
                         mode="edge")
        return c2[: y.shape[0], : y.shape[1]]
    u = up(u)
    v = up(v)
    r = y + 1.402 * v
    g = y - 0.34414 * u - 0.71414 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], -1), 0.0, 255.0)


def rgb_to_yuv420(rgb):
    """RGB -> planar YUV 4:2:0 (2x2-averaged chroma), inverse of
    :func:`yuv420_to_rgb`."""
    rgb = jnp.asarray(rgb, jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.1687 * r - 0.3313 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.4187 * g - 0.0813 * b + 128.0
    h, w = y.shape
    h2, w2 = h - h % 2, w - w % 2
    du = u[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    dv = v[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    return y, du, dv
