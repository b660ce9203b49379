"""Fresnel terms (batched): dielectric (with cosThetaT out), conductor
(Shirley's form), thin film. Mirrors src/core/bsdfs/Fresnel.hpp:15-123."""
from __future__ import annotations

import jax.numpy as jnp


def dielectric_reflectance(eta, cos_i):
    """eta = etaI/etaT for cos_i > 0 rays; handles both sides like the
    reference (flips eta when cos_i < 0). Returns (F, cos_t)."""
    flip = cos_i < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    ci = jnp.abs(cos_i)
    sin_t_sq = eta * eta * (1.0 - ci * ci)
    tir = sin_t_sq > 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    rs = (eta * ci - ct) / jnp.maximum(eta * ci + ct, 1e-20)
    rp = (eta * ct - ci) / jnp.maximum(eta * ct + ci, 1e-20)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f), jnp.where(tir, 0.0, ct)


def conductor_reflectance(eta, k, cos_i):
    """eta, k: (..., 3) rgb; cos_i: (...,). Returns (..., 3)."""
    ci = jnp.maximum(cos_i, 0.0)[..., None]
    ci_sq = ci * ci
    sin_sq = jnp.maximum(1.0 - ci_sq, 0.0)
    sin_qu = sin_sq * sin_sq
    inner = eta * eta - k * k - sin_sq
    a_sq_b_sq = jnp.sqrt(jnp.maximum(inner * inner + 4.0 * eta * eta * k * k, 0.0))
    a = jnp.sqrt(jnp.maximum((a_sq_b_sq + inner) * 0.5, 0.0))
    rs = ((a_sq_b_sq + ci_sq) - 2.0 * a * ci) / jnp.maximum((a_sq_b_sq + ci_sq) + 2.0 * a * ci, 1e-20)
    rp = ((ci_sq * a_sq_b_sq + sin_qu) - 2.0 * a * ci * sin_sq) / jnp.maximum(
        (ci_sq * a_sq_b_sq + sin_qu) + 2.0 * a * ci * sin_sq, 1e-20
    )
    return 0.5 * (rs + rs * rp)
