"""Analytic skydome baked to an equirect HDR image at flatten time.

The reference's Skydome (src/core/primitives/Skydome.cpp:270-318) evaluates
the Hosek-Wilkie "alienworld" spectral model on a 512x256 lat-long grid at
prepareForRender and wraps the result in a BitmapTexture — i.e. the skydome
IS an env light with a baked emission map. We do exactly the same bake, but
evaluate the Preetham analytic sky (Preetham, Shirley & Smits 1999: Perez
luminance/chromaticity functions + zenith terms), because Hosek-Wilkie is a
fitted *dataset* (ArHosekSkyModelData) that cannot be re-derived from
formulas. The shape (sun-relative gradient, horizon brightening, turbidity
response) matches; absolute radiometry differs from the Hosek fit.

The reference's `temperature` parameter feeds the alienworld sun blackbody;
we apply it as a normalized blackbody tint (5777 K == neutral) on top of the
Preetham spectrum, and `intensity` as the overall scale, mirroring
arhosekskymodelstate_alienworld_alloc_init(elevation, intensity, temperature,
turbidity, albedo) in effect.
"""
from __future__ import annotations

import numpy as np

# Perez coefficients A..E as linear functions of turbidity T (Preetham table 2)
_PEREZ_Y = np.array(
    [[0.1787, -1.4630], [-0.3554, 0.4275], [-0.0227, 5.3251],
     [0.1206, -2.5771], [-0.0670, 0.3703]]
)
_PEREZ_x = np.array(
    [[-0.0193, -0.2592], [-0.0665, 0.0008], [-0.0004, 0.2125],
     [-0.0641, -0.8989], [-0.0033, 0.0452]]
)
_PEREZ_y = np.array(
    [[-0.0167, -0.2608], [-0.0950, 0.0092], [-0.0079, 0.2102],
     [-0.0441, -1.6537], [-0.0109, 0.0529]]
)


def _perez(coef, theta, gamma):
    a, b, c, d, e = coef
    cos_t = np.maximum(np.cos(theta), 1e-3)
    return (1.0 + a * np.exp(b / cos_t)) * (
        1.0 + c * np.exp(d * gamma) + e * np.cos(gamma) ** 2
    )


def _zenith(turb, theta_s):
    """Zenith luminance (kcd/m^2) and chromaticity (Preetham appendix A.2)."""
    chi = (4.0 / 9.0 - turb / 120.0) * (np.pi - 2.0 * theta_s)
    y_z = (4.0453 * turb - 4.9710) * np.tan(chi) - 0.2155 * turb + 2.4192
    t_vec = np.array([turb * turb, turb, 1.0])
    th = np.array([theta_s**3, theta_s**2, theta_s, 1.0])
    x_m = np.array(
        [[0.00166, -0.00375, 0.00209, 0.0],
         [-0.02903, 0.06377, -0.03202, 0.00394],
         [0.11693, -0.21196, 0.06052, 0.25886]]
    )
    y_m = np.array(
        [[0.00275, -0.00610, 0.00317, 0.0],
         [-0.04214, 0.08970, -0.04153, 0.00516],
         [0.15346, -0.26756, 0.06670, 0.26688]]
    )
    x_z = t_vec @ x_m @ th
    y_z2 = t_vec @ y_m @ th
    return max(y_z, 0.0), x_z, y_z2


def _blackbody_rgb(temp):
    """Normalized linear-sRGB tint of a blackbody at `temp` K (5777 == 1)."""
    # Planck over CIE fits is overkill for a tint; sample Planck at R/G/B
    # representative wavelengths and normalize against the solar temperature.
    lam = np.array([610.0, 549.0, 468.0]) * 1e-9
    h, c, k = 6.626e-34, 2.998e8, 1.381e-23

    def planck(t):
        return 1.0 / (lam**5 * (np.exp(h * c / (lam * k * t)) - 1.0))

    tint = planck(temp) / planck(5777.0)
    return tint / tint[1]  # green-normalized


_XYZ_TO_SRGB = np.array(
    [[3.2406, -1.5372, -0.4986],
     [-0.9689, 1.8758, 0.0415],
     [0.0557, -0.2040, 1.0570]]
)


def bake_skydome(
    sun_dir, turbidity=3.0, intensity=2.0, temperature=5777.0, gamma_scale=1.0,
    width=512, height=256,
):
    """Evaluate the sky on the reference's lat-long grid (Skydome.cpp:274-299:
    theta = (y+0.5)*pi/H over the upper half, phi = (x+0.5)*2pi/W, v-flipped
    mapping directionToUV = (atan2(z,x)/2pi + 0.5, acos(-y)/pi)); rows at and
    below the horizon repeat the last sky row. Returns (H, W, 3) float32."""
    sun = np.asarray(sun_dir, np.float64)
    sun = sun / max(np.linalg.norm(sun), 1e-9)
    theta_s = np.arccos(np.clip(sun[1], -1.0, 1.0))
    theta_s = min(theta_s, np.pi / 2 - 1e-3)
    turb = float(np.clip(turbidity, 1.2, 10.0))

    coef_Y = _PEREZ_Y @ [turb, 1.0]
    coef_x = _PEREZ_x @ [turb, 1.0]
    coef_y = _PEREZ_y @ [turb, 1.0]
    Yz, xz, yz = _zenith(turb, theta_s)

    ys = np.arange(height // 2)
    xs = np.arange(width)
    theta = (ys + 0.5) * np.pi / height  # zenith angle of the texel row
    phi = (xs + 0.5) * 2.0 * np.pi / width - np.pi
    # direction for uv (u, v): matches Skydome::uvToDirection
    dirs = np.zeros((height // 2, width, 3))
    st = np.sin(theta)[:, None]
    dirs[..., 0] = np.cos(phi)[None, :] * st
    # texel row r maps (through the BitmapTexture v-flip) to v = 1-(r+0.5)/H,
    # i.e. direction y = +cos(theta_r): row 0 is the zenith
    dirs[..., 1] = np.cos(theta)[:, None]
    dirs[..., 2] = np.sin(phi)[None, :] * st
    cos_gamma = np.clip(dirs @ sun, -1.0, 1.0)
    gamma = np.clip(np.arccos(cos_gamma) * gamma_scale, 0.0, np.pi)
    th = np.minimum(theta, np.pi / 2 - 1e-3)[:, None]

    Y = Yz * _perez(coef_Y, th, gamma) / _perez(coef_Y, 0.0, theta_s)
    x = xz * _perez(coef_x, th, gamma) / _perez(coef_x, 0.0, theta_s)
    y = yz * _perez(coef_y, th, gamma) / _perez(coef_y, 0.0, theta_s)
    y = np.maximum(y, 1e-4)

    X = x / y * Y
    Z = (1.0 - x - y) / y * Y
    xyz = np.stack([X, Y, Z], axis=-1)
    rgb = np.maximum(xyz @ _XYZ_TO_SRGB.T, 0.0)
    # kcd/m^2-scaled Perez -> a unit-mean-ish radiance map; `intensity` is the
    # user-facing scale as in the reference
    rgb = rgb * (float(intensity) / 8.0)
    rgb = rgb * _blackbody_rgb(float(temperature))[None, None, :]

    img = np.zeros((height, width, 3), np.float32)
    img[: height // 2] = rgb.astype(np.float32)
    # horizon extension: 2 rows just below the horizon repeat the last sky
    # row (Skydome.cpp:310-311); the rest of the lower hemisphere is black
    img[height // 2 : height // 2 + 2] = img[height // 2 - 1][None]
    return img
