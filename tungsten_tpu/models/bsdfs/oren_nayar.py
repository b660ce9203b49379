"""Oren-Nayar rough diffuse (src/core/bsdfs/OrenNayarBsdf.cpp): improved
Fujii model; sampling mixes uniform/cosine by roughness.
Params: [0] roughness."""
from __future__ import annotations

import jax.numpy as jnp

from ...sampling import warps
from .common import BsdfSample, Lobes

NAME = "oren_nayar"
LOBES = Lobes.DIFFUSE_R


def pack(spec, params, tex_builder):
    from ..textures import texture_from_spec

    # roughness is an ordinary Texture in the reference (OrenNayarBsdf.hpp);
    # pack a texture id and evaluate per hit
    params[0] = texture_from_spec(
        spec.get("roughness", 0.5), tex_builder, spec.get("_resolve_path"))
    return params


def _rough(ctx, params, uv):
    from ..textures import eval_texture

    _, texs = ctx
    return eval_texture(texs, params[..., 0].astype(jnp.int32), uv)[..., 0]


def _f(rough, albedo, wi, wo):
    wiz = wi[..., 2]
    woz = wo[..., 2]
    theta_r = jnp.arccos(jnp.clip(woz, -1.0, 1.0))
    theta_i = jnp.arccos(jnp.clip(wiz, -1.0, 1.0))
    alpha = jnp.maximum(theta_r, theta_i)
    beta = jnp.minimum(theta_r, theta_i)
    sin_alpha = jnp.sin(alpha)
    denom = (wi[..., 0] ** 2 + wi[..., 1] ** 2) * (wo[..., 0] ** 2 + wo[..., 1] ** 2)
    cos_dphi = jnp.where(
        denom == 0.0,
        1.0,
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
        / jnp.sqrt(jnp.maximum(denom, 1e-30)),
    )
    sigma = rough / jnp.sqrt(2.0)
    s2 = sigma * sigma
    c1 = 1.0 - 0.5 * s2 / (s2 + 0.33)
    c2 = 0.45 * s2 / (s2 + 0.09)
    c2 = c2 * jnp.where(
        cos_dphi >= 0.0, sin_alpha, sin_alpha - ((2.0 * warps.INV_PI) * beta) ** 3
    )
    c3 = 0.125 * (s2 / (s2 + 0.09)) * ((4.0 * warps.INV_PI * warps.INV_PI) * alpha * beta) ** 2
    fr1 = (
        c1
        + cos_dphi * c2 * jnp.tan(beta)
        + (1.0 - jnp.abs(cos_dphi)) * c3 * jnp.tan(0.5 * (alpha + beta))
    )
    fr2 = 0.17 * s2 / (s2 + 0.13) * (1.0 - cos_dphi * ((2.0 * warps.INV_PI) * beta) ** 2)
    return (albedo * fr1[..., None] + albedo * albedo * fr2[..., None]) * (
        woz * warps.INV_PI
    )[..., None]


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid[..., None], _f(_rough(ctx, params, uv), albedo, wi, wo), 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    ratio = jnp.clip(_rough(ctx, params, uv), 0.01, 1.0)
    p = warps.uniform_hemisphere_pdf(wo) * ratio + warps.cosine_hemisphere_pdf(wo) * (
        1.0 - ratio
    )
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid, p, 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    ratio = jnp.clip(_rough(ctx, params, uv), 0.01, 1.0)
    uniform = u1 < ratio
    wo = jnp.where(
        uniform[..., None], warps.uniform_hemisphere(u2), warps.cosine_hemisphere(u2)
    )
    p = warps.uniform_hemisphere_pdf(wo) * ratio + warps.cosine_hemisphere_pdf(wo) * (
        1.0 - ratio
    )
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (p > 0.0)
    w = _f(ratio, albedo, wi, wo) / jnp.maximum(p, 1e-30)[..., None]
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], w, 0.0),
        pdf=p,
        lobe=jnp.full(wi.shape[:-1], Lobes.DIFFUSE_R, jnp.int32),
        valid=valid,
    )
