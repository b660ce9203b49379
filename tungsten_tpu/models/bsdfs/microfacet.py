"""Microfacet distributions: Beckmann / Phong / GGX (batched jnp).

Same D / Smith-G1 / sample / pdf math as the reference Microfacet.hpp:14-157
(which the materialtest copper ball depends on), vectorized over the
wavefront. The distribution id is *static* per material instance (scene JSON),
so dispatch is a Python-level branch at trace time — but materials of the same
BSDF type may mix distributions, so the distribution enters the parameter row
and is dispatched with masks like everything else.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...sampling import warps

BECKMANN = 0
PHONG = 1
GGX = 2

_NAMES = {"beckmann": BECKMANN, "phong": PHONG, "ggx": GGX}


def dist_id(name: str) -> int:
    return _NAMES[name]


def roughness_to_alpha(dist, roughness):
    r = jnp.maximum(roughness, 1e-3)
    return jnp.where(dist == PHONG, 2.0 / (r * r) - 2.0, r)


def D(dist, alpha, m):
    mz = m[..., 2]
    cos_sq = mz * mz
    tan_sq = jnp.maximum(1.0 - cos_sq, 0.0) / jnp.maximum(cos_sq, 1e-20)
    cos_qu = jnp.maximum(cos_sq * cos_sq, 1e-20)
    a_sq = alpha * alpha

    beckmann = warps.INV_PI * jnp.exp(-tan_sq / jnp.maximum(a_sq, 1e-20)) / jnp.maximum(a_sq * cos_qu, 1e-20)
    phong = (alpha + 2.0) * warps.INV_TWO_PI * jnp.power(jnp.maximum(mz, 1e-20), alpha)
    ggx = a_sq * warps.INV_PI / jnp.maximum(cos_qu * (a_sq + tan_sq) ** 2, 1e-20)

    d = jnp.where(dist == BECKMANN, beckmann, jnp.where(dist == PHONG, phong, ggx))
    return jnp.where(mz > 0.0, d, 0.0)


def G1(dist, alpha, v, m):
    vz = v[..., 2]
    cos_sq = vz * vz
    tan_theta = jnp.abs(jnp.sqrt(jnp.maximum(1.0 - cos_sq, 0.0)) / jnp.where(vz == 0, 1e-20, vz))
    tan_theta = jnp.maximum(tan_theta, 1e-20)

    a_beck = 1.0 / (jnp.maximum(alpha, 1e-20) * tan_theta)
    a_phong = jnp.sqrt(jnp.maximum(0.5 * alpha + 1.0, 0.0)) / tan_theta
    a = jnp.where(dist == PHONG, a_phong, a_beck)
    rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    smith_approx = jnp.where(a < 1.6, rational, 1.0)

    a_sq = alpha * alpha
    tan_sq = jnp.maximum(1.0 - cos_sq, 0.0) / jnp.maximum(cos_sq, 1e-20)
    ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + a_sq * tan_sq))

    g = jnp.where(dist == GGX, ggx, smith_approx)
    side = jnp.sum(v * m, axis=-1) * vz > 0.0
    return jnp.where(side, g, 0.0)


def G(dist, alpha, wi, wo, m):
    return G1(dist, alpha, wi, m) * G1(dist, alpha, wo, m)


def pdf(dist, alpha, m):
    return D(dist, alpha, m) * jnp.maximum(m[..., 2], 0.0)


def sample(dist, alpha, xi):
    """xi (..., 2) -> microfacet normal m (..., 3)."""
    phi = xi[..., 1] * (2.0 * jnp.pi)
    x0 = jnp.clip(xi[..., 0], 0.0, 1.0 - 1e-7)

    tan_sq_beck = -alpha * alpha * jnp.log1p(-x0)
    cos_beck = 1.0 / jnp.sqrt(1.0 + tan_sq_beck)
    cos_phong = jnp.power(x0, 1.0 / (alpha + 2.0))
    tan_sq_ggx = alpha * alpha * x0 / (1.0 - x0)
    cos_ggx = 1.0 / jnp.sqrt(1.0 + tan_sq_ggx)

    cos_theta = jnp.where(
        dist == BECKMANN, cos_beck, jnp.where(dist == PHONG, cos_phong, cos_ggx)
    )
    r = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, cos_theta], axis=-1)
