"""Tabulated reconstruction filters with negative lobes.

Mirror of src/core/cameras/ReconstructionFilter.hpp:19-33 / .cpp:15-58:
mitchell_netravali (B=C=1/3), catmull_rom, lanczos (sinc-2) evaluated into a
31-bin table over [0, width); importance sampling draws |x| from the binned
CDF (sample weight 1, exactly the reference's estimator — the slightly
negative lobe bins get ~zero probability mass) and splatting uses the SIGNED
nearest-bin lookup `evalApproximate` so light-tracer / BDPT / MLT splats
reproduce the sharpening lobes.

All tables are precomputed host-side per filter NAME (they depend on nothing
else); the jitted samplers close over them as constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

RES = 31  # RFILTER_RESOLUTION


def _mitchell(x):
    B = C = 1.0 / 3.0
    if x < 1.0:
        return (1.0 / 6.0) * (
            (12 - 9 * B - 6 * C) * x**3 + (-18 + 12 * B + 6 * C) * x**2 + (6 - 2 * B)
        )
    if x < 2.0:
        return (1.0 / 6.0) * (
            (-B - 6 * C) * x**3 + (6 * B + 30 * C) * x**2
            + (-12 * B - 48 * C) * x + (8 * B + 24 * C)
        )
    return 0.0


def _catmull_rom(x):
    if x < 1.0:
        return (1.0 / 6.0) * ((12.0 - 3.0) * x**3 + (-18.0 + 3.0) * x**2 + 6.0)
    if x < 2.0:
        return (1.0 / 6.0) * (-3.0 * x**3 + 15.0 * x**2 - 24.0 * x + 12.0)
    return 0.0


def _lanczos(x):
    if x == 0.0:
        return 1.0
    if x < 2.0:
        return np.sin(np.pi * x) * np.sin(np.pi * x / 2.0) / (np.pi**2 * x**2 / 2.0)
    return 0.0


_EVAL = {
    "mitchell_netravali": _mitchell,
    "catmull_rom": _catmull_rom,
    "lanczos": _lanczos,
    # gaussian also goes through the table on the SPLAT side (the reference
    # has no analytic gaussian splat either); sampling stays analytic.
    "gaussian": lambda x: float(np.exp(-2.0 * x * x) - np.exp(-8.0)) if x < 2.0 else 0.0,
}

WIDTH = 2.0  # all tabulated filters have width 2 (ReconstructionFilter.cpp:24-28)

_CACHE = {}


def tables(name):
    """(filter (RES+1,), cdf (RES+1,), bin_size) as numpy, reference
    precompute() semantics: cdf over raw bin values, filter normalized so the
    2*width-wide splat kernel integrates to ~1."""
    if name not in _CACHE:
        f = np.array([_EVAL[name]((i * WIDTH) / RES) for i in range(RES)] + [0.0])
        s = f[:RES].sum()
        cdf = np.zeros(RES + 1)
        np.cumsum(f[:RES] / s, out=cdf[1:])
        cdf[RES] = 1.0
        filt = f / (s * 2.0 * WIDTH / RES)
        _CACHE[name] = (filt.astype(np.float32), cdf.astype(np.float32), WIDTH / RES)
    return _CACHE[name]


def is_tabulated(name):
    return name in _EVAL


def sample_offset_1d(name, xi):
    """ReconstructionFilter::sample (hpp:86-104), vectorized: mirror-fold xi
    around 0.5 for the sign, inverse-CDF the magnitude by bin.

    The raw cdf is NON-monotone where the filter has negative lobes (the
    reference accumulates signed bin values). Its linear scan 'first i with
    xi < cdf[i]' is exactly searchsorted over the RUNNING-MAX cdf (the first
    crossing of xi happens at the first index where the prefix max exceeds
    xi); lo/p still read the raw cdf like the reference does."""
    _, cdf, bin_size = tables(name)
    cdfj = jnp.asarray(cdf)
    runmax = jnp.asarray(np.maximum.accumulate(cdf))
    negative = xi < 0.5
    xi = jnp.where(negative, xi * 2.0, (xi - 0.5) * 2.0)
    # first i in [0, RES-1) with xi < cdf[i], else RES-1  (hpp:93-99)
    idx = jnp.clip(
        jnp.searchsorted(runmax[: RES - 1], xi, side="right"), 1, RES - 1
    ).astype(jnp.int32)
    lo = cdfj[idx - 1]
    p = cdfj[idx] - lo
    u = bin_size * (idx.astype(jnp.float32) + (xi - lo) / jnp.maximum(p, 1e-12))
    return jnp.where(negative, -u, u)


def sample_offset(name, u2):
    """(N, 2) filter displacement in pixels, weight 1."""
    return jnp.stack(
        [sample_offset_1d(name, u2[..., 0]), sample_offset_1d(name, u2[..., 1])],
        axis=-1,
    )


def eval_approx(name, x):
    """evalApproximate (hpp:210-213): SIGNED nearest-bin filter value."""
    filt, _, bin_size = tables(name)
    fj = jnp.asarray(filt)
    idx = jnp.minimum((jnp.abs(x) * (1.0 / bin_size)).astype(jnp.int32), RES)
    return fj[idx]
