"""Lambertian reflection (src/core/bsdfs/LambertBsdf.cpp)."""
from __future__ import annotations

import jax.numpy as jnp

from ...sampling import warps
from .common import BsdfSample, Lobes

NAME = "lambert"
LOBES = Lobes.DIFFUSE_R


def pack(spec, params, tex_builder):
    return params  # no extra parameters


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    f = albedo * (warps.INV_PI * jnp.maximum(wo[..., 2], 0.0))[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid, warps.cosine_hemisphere_pdf(wo), 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    wo = warps.cosine_hemisphere(u2)
    valid = wi[..., 2] > 0.0
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], albedo, 0.0),
        pdf=warps.cosine_hemisphere_pdf(wo),
        lobe=jnp.full(wi.shape[:-1], Lobes.DIFFUSE_R, jnp.int32),
        valid=valid,
    )
