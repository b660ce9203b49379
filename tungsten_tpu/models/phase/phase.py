"""Phase functions (src/core/phasefunctions/): isotropic, Henyey-Greenstein,
Rayleigh. Batched; directions follow the reference's convention where eval
takes (wi, wo) with wi the *incoming ray direction* (not negated) — HG with
positive g is forward scattering around +wi.

eval returns the phase value (== pdf; the reference's phase functions are
normalized and importance-sampled exactly, so sample weight is always 1).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from ...sampling import warps

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2

_NAMES = {"isotropic": PHASE_ISOTROPIC, "henyey_greenstein": PHASE_HG, "rayleigh": PHASE_RAYLEIGH}


def phase_id(name: str) -> int:
    return _NAMES[name]


def _hg(cos_theta, g):
    term = 1.0 + g * g - 2.0 * g * cos_theta
    return warps.INV_FOUR_PI * (1.0 - g * g) / (term * jnp.sqrt(jnp.maximum(term, 1e-12)))


def _rayleigh(cos_theta):
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)


def phase_eval(ptype, g, wi, wo):
    """ptype, g: (N,); wi, wo: (N, 3). Returns (N,)."""
    cos_theta = vo.dot(wi, wo)
    iso = jnp.full(cos_theta.shape, warps.INV_FOUR_PI)
    hg = jnp.where(jnp.abs(g) < 1e-4, iso, _hg(cos_theta, g))
    ray = _rayleigh(cos_theta)
    return jnp.where(ptype == PHASE_HG, hg, jnp.where(ptype == PHASE_RAYLEIGH, ray, iso))


def phase_pdf(ptype, g, wi, wo):
    return phase_eval(ptype, g, wi, wo)


def phase_sample(ptype, g, wi, u2):
    """Returns (w (N,3), pdf (N,)); weight is 1."""
    phi = u2[..., 0] * (2.0 * jnp.pi)

    g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    cos_hg = (1.0 + g_safe * g_safe - ((1.0 - g_safe * g_safe) / (1.0 + g_safe * (u2[..., 1] * 2.0 - 1.0))) ** 2) / (2.0 * g_safe)

    z = u2[..., 1] * 4.0 - 2.0
    inv_z = jnp.sqrt(z * z + 1.0)
    u = jnp.cbrt(z + inv_z)
    cos_ray = u - 1.0 / u

    cos_iso = 1.0 - 2.0 * u2[..., 1]

    use_hg = (ptype == PHASE_HG) & (jnp.abs(g) >= 1e-4)
    cos_theta = jnp.where(
        use_hg, cos_hg, jnp.where(ptype == PHASE_RAYLEIGH, cos_ray, cos_iso)
    )
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    local = jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )
    t, b = vo.tangent_frame(wi)
    w = vo.to_global(t, b, wi, local)
    return w, phase_eval(ptype, g, wi, w)
