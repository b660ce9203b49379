"""Rough plastic (src/core/bsdfs/RoughPlasticBsdf.cpp): rough dielectric
specular coat (reflection only) over internally-scattered diffuse, combined
with one-sample MIS between the two lobes.
Params: [0] ior, [1:4] scaledSigmaA, [4] avgTransmittance, [5] diffuseFresnel,
[6] roughness, [7] distribution, [8] substrateWeight (albedo average)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...sampling import warps
from . import microfacet as mf
from . import rough_dielectric as rd
from .common import BsdfSample, Lobes
from .fresnel import dielectric_reflectance
from .plastic import compute_diffuse_fresnel, pack_coat_common, _diffuse_f

NAME = "rough_plastic"
LOBES = Lobes.GLOSSY_R | Lobes.DIFFUSE_R


def pack(spec, params, tex_builder):
    params = pack_coat_common(spec, params)
    params[5] = compute_diffuse_fresnel(float(params[0]))
    from .common import pack_roughness

    params[6] = pack_roughness(spec, "roughness", 0.1, tex_builder)
    params[7] = mf.dist_id(spec.get("distribution", "ggx"))
    a = spec.get("albedo", 1.0)
    if isinstance(a, (int, float)):
        params[8] = a
    elif isinstance(a, (list, tuple)):
        params[8] = float(np.mean(a))
    else:
        params[8] = 0.5  # textured albedo: reference uses Texture::average
    return params


def _spec_prob(params, wi):
    fi, _ = dielectric_reflectance(1.0 / params[..., 0], wi[..., 2])
    substrate = params[..., 8] * params[..., 4] * (1.0 - fi)
    return fi / jnp.maximum(fi + substrate, 1e-20)


def _tr(params):
    return params[..., 6], params[..., 0], params[..., 7].astype(jnp.int32)


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    rough, ior, dist = _tr(params)
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, rough, uv)
    n = wi.shape[0]
    t = jnp.ones((n,), bool)
    f = jnp.zeros((n,), jnp.float32)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    glossy = rd.eval_base(wi, wo, rough, ior, dist, t, jnp.zeros((n,), bool))
    out = _diffuse_f(params, albedo, wi, wo) + glossy[..., None]
    return jnp.where(valid[..., None], out, 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    rough, ior, dist = _tr(params)
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, rough, uv)
    n = wi.shape[0]
    t = jnp.ones((n,), bool)
    fz = jnp.zeros((n,), bool)
    glossy_pdf = rd.pdf_base(wi, wo, rough, ior, dist, t, fz)
    diffuse_pdf = warps.cosine_hemisphere_pdf(wo)
    sp = _spec_prob(params, wi)
    p = glossy_pdf * sp + diffuse_pdf * (1.0 - sp)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid, p, 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    rough, ior, dist = _tr(params)
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, rough, uv)
    n = wi.shape[0]
    t = jnp.ones((n,), bool)
    fz = jnp.zeros((n,), bool)
    sp = _spec_prob(params, wi)
    pick_spec = u1 < sp
    u1_re = jnp.clip((u1 - sp) / jnp.maximum(1.0 - sp, 1e-7), 0.0, 1.0)

    s_gl = rd.sample_base(wi, u2, u1_re, rough, ior, dist, t, fz)
    wo_diff = warps.cosine_hemisphere(u2)
    wo = jnp.where(pick_spec[..., None], s_gl.wo, wo_diff)

    # one-sample MIS combination (RoughPlasticBsdf::sample)
    f = eval(ctx, params, albedo, uv, wi, wo)
    p = pdf(ctx, params, albedo, uv, wi, wo)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (p > 0.0)
    valid = valid & jnp.where(pick_spec, s_gl.valid, True)
    lobe = jnp.where(pick_spec, Lobes.GLOSSY_R, Lobes.DIFFUSE_R).astype(jnp.int32)
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], f / jnp.maximum(p, 1e-30)[..., None], 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )
