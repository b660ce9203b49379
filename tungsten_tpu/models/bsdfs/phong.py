"""Modified Phong (src/core/bsdfs/PhongBsdf.cpp): glossy lobe around the
mirror direction + optional diffuse mix.
Params: [0] exponent, [1] diffuse_ratio."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from ...sampling import warps
from .common import BsdfSample, Lobes

NAME = "phong"
LOBES = Lobes.GLOSSY_R | Lobes.DIFFUSE_R


def pack(spec, params, tex_builder):
    params[0] = spec.get("exponent", 64.0)
    params[1] = spec.get("diffuse_ratio", 0.2)
    return params


def _common(params, wi, wo):
    exponent = params[..., 0]
    diffuse_ratio = params[..., 1]
    refl = vo.reflect(wi)
    cos_theta = vo.dot(refl, wo)
    return exponent, diffuse_ratio, cos_theta


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    exponent, dr, cos_theta = _common(params, wi, wo)
    brdf_factor = (exponent + 2.0) * warps.INV_TWO_PI
    result = dr * warps.INV_PI
    glossy = jnp.where(
        cos_theta > 0.0, jnp.power(jnp.maximum(cos_theta, 1e-20), exponent) * brdf_factor, 0.0
    )
    result = result + glossy * (1.0 - dr)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid[..., None], albedo * (wo[..., 2] * result)[..., None], 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    exponent, dr, cos_theta = _common(params, wi, wo)
    pdf_factor = (exponent + 1.0) * warps.INV_TWO_PI
    glossy = jnp.where(
        cos_theta > 0.0, jnp.power(jnp.maximum(cos_theta, 1e-20), exponent) * pdf_factor, 0.0
    )
    p = glossy * (1.0 - dr) + dr * warps.cosine_hemisphere_pdf(wo)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid, p, 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    exponent = params[..., 0]
    dr = params[..., 1]
    glossy_pick = u1 >= dr  # nextBoolean(1 - diffuseRatio)

    phi = u2[..., 0] * (2.0 * jnp.pi)
    cos_t = jnp.power(jnp.clip(u2[..., 1], 1e-7, 1.0), 1.0 / (1.0 + exponent))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    wo_lobe = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    refl = vo.reflect(wi)
    t, b = vo.tangent_frame(refl)
    wo_glossy = vo.to_global(t, b, refl, wo_lobe)
    wo_diffuse = warps.cosine_hemisphere(u2)
    wo = jnp.where(glossy_pick[..., None], wo_glossy, wo_diffuse)

    p = pdf(ctx, params, albedo, uv, wi, wo)
    f = eval(ctx, params, albedo, uv, wi, wo)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (p > 0.0)
    lobe = jnp.where(glossy_pick, Lobes.GLOSSY_R, Lobes.DIFFUSE_R).astype(jnp.int32)
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], f / jnp.maximum(p, 1e-30)[..., None], 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )
