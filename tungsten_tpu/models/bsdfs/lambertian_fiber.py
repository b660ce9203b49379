"""Lambertian fiber BCSDF (src/core/bsdfs/LambertianFiberBcsdf.cpp).

Closed-form far-field scattering of a perfectly Lambertian cylinder
("Light Scattering from Filaments"; exact solution from "Importance
Sampling for Physically-Based Hair Fiber Models"):

    N(phi) = cosThetaO * |((pi - phi) cos phi + sin phi)| / (4 pi)

Frame convention matches models/bsdfs/hair.py: the fiber tangent is the
local y axis (sin(theta) = dir.y) and phi is measured in the (x, z)
normal plane. The reference evaluates phi = atan2(wo.x, wo.z) in its
camera-facing ribbon frame where wi's azimuth is ~0
(LambertianFiberBcsdf.cpp:21-28); here phi is the azimuthal DIFFERENCE
between wo and wi — the rotation-invariant generalization that is exact
for arbitrary tube frames.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...sampling import warps
from .common import BsdfSample, Lobes

NAME = "lambertian_fiber"
LOBES = Lobes.DIFFUSE_R | Lobes.ANISOTROPIC

TWO_PI = 2.0 * np.pi
INV_FOUR_PI = 1.0 / (4.0 * np.pi)


def pack(spec, params, tex_builder):
    return params  # albedo only


def _trig_inv(x):
    return jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))


def _lambertian_cylinder(wi, wo):
    """N(dphi) * cosThetaO (LambertianFiberBcsdf.cpp:20-28) with phi taken
    as the wo-wi azimuth difference wrapped to [0, 2pi)."""
    cos_to = _trig_inv(jnp.clip(wo[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(wo[..., 0], wo[..., 2]) - jnp.arctan2(wi[..., 0], wi[..., 2])
    phi = jnp.mod(phi, TWO_PI)
    n = cos_to * jnp.abs(((np.pi - phi) * jnp.cos(phi) + jnp.sin(phi)) * INV_FOUR_PI)
    return jnp.where(jnp.isfinite(n), n, 0.0)


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return albedo * _lambertian_cylinder(wi, wo)[..., None]


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return _lambertian_cylinder(wi, wo)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    """Exact importance sampling (LambertianFiberBcsdf.cpp:43-61): pick a
    point across the lit fiber width (h uniform), cosine-sample about that
    surface normal, then rotate the result from the wi-azimuth frame into
    the shading frame."""
    n = wi.shape[0]
    h = u1 * 2.0 - 1.0
    nx = h
    nz = _trig_inv(nx)
    d = warps.cosine_hemisphere(u2)
    # reference frame (wi azimuth = 0): x' across the fiber, z' toward wi
    wo0 = jnp.stack(
        [
            d[..., 2] * nx + d[..., 0] * nz,
            d[..., 1],
            d[..., 2] * nz - d[..., 0] * nx,
        ],
        axis=-1,
    )
    phi_i = jnp.arctan2(wi[..., 0], wi[..., 2])
    c, s = jnp.cos(phi_i), jnp.sin(phi_i)
    wo = jnp.stack(
        [
            wo0[..., 0] * c + wo0[..., 2] * s,
            wo0[..., 1],
            -wo0[..., 0] * s + wo0[..., 2] * c,
        ],
        axis=-1,
    )
    p = _lambertian_cylinder(wi, wo)
    valid = p > 0.0
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], albedo, 0.0),
        pdf=p,
        lobe=jnp.full((n,), LOBES, jnp.int32),
        valid=valid,
    )
