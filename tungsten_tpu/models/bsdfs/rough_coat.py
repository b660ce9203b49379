"""Rough dielectric coat over an arbitrary substrate
(src/core/bsdfs/RoughCoatBsdf.cpp): like smooth_coat but the coat interface
reflection is a rough-dielectric glossy lobe, combined with the refracted
substrate via one-sample MIS.
Params: [0] ior, [1:4] scaledSigmaA, [4] avgTransmittance,
[5] substrate index, [6] roughness, [7] distribution."""
from __future__ import annotations

import jax.numpy as jnp

from . import microfacet as mf
from . import rough_dielectric as rd
from .common import BsdfSample, Lobes
from .fresnel import dielectric_reflectance
from .plastic import pack_coat_common
from .smooth_coat import _absorption, _warp_in

NAME = "rough_coat"
IS_WRAPPER = True


def lobes_for(spec, sub_lobes_of):
    return Lobes.GLOSSY_R | sub_lobes_of(spec["_substrate_index"])


def pack(spec, params, tex_builder):
    params = pack_coat_common(spec, params, default_ior=1.3)
    params[5] = spec.get("_substrate_index", -1)
    if params[5] < 0:
        raise ValueError("rough_coat requires a substrate")
    from .common import pack_roughness

    r = pack_roughness(spec, "roughness", 0.1, tex_builder)
    params[6] = r
    params[7] = mf.dist_id(spec.get("distribution", "ggx"))
    return params


def _setup(params, wi):
    ior = params[..., 0]
    eta = 1.0 / ior
    fi, cos_ti = dielectric_reflectance(eta, wi[..., 2])
    spec_prob = fi / jnp.maximum(fi + params[..., 4] * (1.0 - fi), 1e-20)
    sub_id = params[..., 5].astype(jnp.int32)
    return ior, eta, fi, cos_ti, spec_prob, sub_id


def _substrate_eval_pdf(ctx, params, uv, wi, wo, nonspecular_only):
    """Substrate f*cos and pdf seen through the coat (substrateEvalAndPdf)."""
    from .dispatch import bsdf_eval, bsdf_pdf

    ior, eta, fi, cos_ti, _, sub_id = _setup(params, wi)
    fo, cos_to = dielectric_reflectance(eta, wo[..., 2])
    wi_sub = _warp_in(wi, eta, cos_ti)
    wo_sub = _warp_in(wo, eta, cos_to)
    f_sub = bsdf_eval(ctx, sub_id, uv, wi_sub, wo_sub, nonspecular_only, nested=True)
    f_sub = f_sub * _absorption(params, cos_to, cos_ti)
    laplacian = eta * eta * wo[..., 2] / jnp.maximum(cos_to, 1e-6)
    f = (laplacian * (1.0 - fi) * (1.0 - fo))[..., None] * f_sub
    p = bsdf_pdf(ctx, sub_id, uv, wi_sub, wo_sub, nonspecular_only, nested=True)
    p = p * eta * eta * jnp.abs(wo[..., 2] / jnp.maximum(cos_to, 1e-6))
    return f, p


def _coat(ctx, params, uv, wi, wo, what):
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, params[..., 6], uv)
    ior = params[..., 0]
    dist = params[..., 7].astype(jnp.int32)
    n = wi.shape[0]
    t = jnp.ones((n,), bool)
    fz = jnp.zeros((n,), bool)
    if what == "eval":
        return rd.eval_base(wi, wo, rough, ior, dist, t, fz)
    return rd.pdf_base(wi, wo, rough, ior, dist, t, fz)


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    f_sub, _ = _substrate_eval_pdf(ctx, params, uv, wi, wo, nonspecular_only)
    f_coat = _coat(ctx, params, uv, wi, wo, "eval")
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid[..., None], f_sub + f_coat[..., None], 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    _, _, _, _, spec_prob, _ = _setup(params, wi)
    _, p_sub = _substrate_eval_pdf(ctx, params, uv, wi, wo, nonspecular_only)
    p_coat = _coat(ctx, params, uv, wi, wo, "pdf")
    p = p_coat * spec_prob + p_sub * (1.0 - spec_prob)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid, p, 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    from .dispatch import bsdf_sample

    ior, eta, fi, cos_ti, spec_prob, sub_id = _setup(params, wi)
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, params[..., 6], uv)
    dist = params[..., 7].astype(jnp.int32)
    n = wi.shape[0]
    t = jnp.ones((n,), bool)
    fz = jnp.zeros((n,), bool)

    pick_spec = u1 < spec_prob
    u1_re = jnp.clip((u1 - spec_prob) / jnp.maximum(1.0 - spec_prob, 1e-7), 0.0, 1.0 - 1e-7)

    s_coat = rd.sample_base(wi, u2, u1_re, rough, ior, dist, t, fz)
    wi_sub = _warp_in(wi, eta, cos_ti)
    s_sub = bsdf_sample(ctx, sub_id, uv, wi_sub, u2, u1_re, nonspecular_only, nested=True)
    fo, cos_to = dielectric_reflectance(ior, s_sub.wo[..., 2])
    wo_sub_out = jnp.stack(
        [s_sub.wo[..., 0] * ior, s_sub.wo[..., 1] * ior, cos_to], axis=-1
    )

    wo = jnp.where(pick_spec[..., None], s_coat.wo, wo_sub_out)
    lobe = jnp.where(pick_spec, Lobes.GLOSSY_R, s_sub.lobe).astype(jnp.int32)
    valid_sub = s_sub.valid & (fo < 1.0) & (s_sub.wo[..., 2] > 0.0)
    valid = (wi[..., 2] > 0.0) & jnp.where(pick_spec, s_coat.valid, valid_sub)

    # one-sample MIS combination over the mixture pdf
    f = eval(ctx, params, albedo, uv, wi, wo, nonspecular_only)
    p = pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only)
    valid = valid & (p > 0.0) & (wo[..., 2] > 0.0)
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], f / jnp.maximum(p, 1e-30)[..., None], 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )
