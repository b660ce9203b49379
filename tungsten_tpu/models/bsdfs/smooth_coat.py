"""Smooth dielectric coat over an arbitrary substrate BSDF
(src/core/bsdfs/SmoothCoatBsdf.cpp): specular reflection lottery vs
refract-into-substrate with Snell-warped directions, absorption, and the
refraction Jacobian eta^2 * cosThetaT / cosThetaSubstrate.

Params: [0] ior, [1:4] scaledSigmaA, [4] avgTransmittance,
[5] substrate material index."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from .common import BsdfSample, Lobes
from .fresnel import dielectric_reflectance
from .plastic import pack_coat_common

NAME = "smooth_coat"
IS_WRAPPER = True


def lobes_for(spec, sub_lobes_of):
    return Lobes.SPECULAR_R | sub_lobes_of(spec["_substrate_index"])


def pack(spec, params, tex_builder):
    params = pack_coat_common(spec, params, default_ior=1.3)
    params[5] = spec.get("_substrate_index", -1)
    if params[5] < 0:
        raise ValueError("smooth_coat requires a substrate")
    return params


def _setup(params, wi):
    ior = params[..., 0]
    eta = 1.0 / ior
    fi, cos_ti = dielectric_reflectance(eta, wi[..., 2])
    avg_trans = params[..., 4]
    substrate_w = avg_trans * (1.0 - fi)
    spec_prob = fi / jnp.maximum(fi + substrate_w, 1e-20)
    sub_id = params[..., 5].astype(jnp.int32)
    return ior, eta, fi, cos_ti, spec_prob, sub_id


def _warp_in(wi, eta, cos_ti):
    return jnp.stack([wi[..., 0] * eta, wi[..., 1] * eta, jnp.sign(wi[..., 2]) * cos_ti], axis=-1)


def _absorption(params, cos_sub_o, cos_ti):
    sig = params[..., 1:4]
    att = jnp.exp(sig * (-1.0 / jnp.maximum(cos_sub_o, 1e-6) - 1.0 / jnp.maximum(cos_ti, 1e-6))[..., None])
    return jnp.where(jnp.any(sig > 0, axis=-1, keepdims=True), att, 1.0)


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    from .dispatch import bsdf_eval

    ior, eta, fi, cos_ti, _, sub_id = _setup(params, wi)
    fo, cos_to = dielectric_reflectance(eta, wo[..., 2])
    wi_sub = _warp_in(wi, eta, cos_ti)
    wo_sub = _warp_in(wo, eta, cos_to)
    laplacian = eta * eta * wo[..., 2] / jnp.maximum(cos_to, 1e-6)
    f_sub = bsdf_eval(ctx, sub_id, uv, wi_sub, wo_sub, nonspecular_only, nested=True)
    f_sub = f_sub * _absorption(params, cos_to, cos_ti)
    f = (laplacian * (1.0 - fi) * (1.0 - fo))[..., None] * f_sub
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid[..., None], f, 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    from .dispatch import bsdf_pdf

    ior, eta, fi, cos_ti, spec_prob, sub_id = _setup(params, wi)
    fo, cos_to = dielectric_reflectance(eta, wo[..., 2])
    wi_sub = _warp_in(wi, eta, cos_ti)
    wo_sub = _warp_in(wo, eta, cos_to)
    p_sub = bsdf_pdf(ctx, sub_id, uv, wi_sub, wo_sub, nonspecular_only, nested=True)
    jac = eta * eta * jnp.abs(wo[..., 2] / jnp.maximum(cos_to, 1e-6))
    if nonspecular_only:
        p = p_sub * jac
    else:
        p = p_sub * jac * (1.0 - spec_prob)
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid, p, 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    from .dispatch import bsdf_sample

    ior, eta, fi, cos_ti, spec_prob, sub_id = _setup(params, wi)
    if nonspecular_only:
        spec_prob = jnp.zeros_like(spec_prob)
    pick_spec = u1 < spec_prob
    u1_re = jnp.clip((u1 - spec_prob) / jnp.maximum(1.0 - spec_prob, 1e-7), 0.0, 1.0 - 1e-7)

    # substrate branch: refract in, sample substrate, refract out
    wi_sub = _warp_in(wi, eta, cos_ti)
    s = bsdf_sample(ctx, sub_id, uv, wi_sub, u2, u1_re, nonspecular_only, nested=True)
    fo, cos_to = dielectric_reflectance(ior, s.wo[..., 2])
    cos_sub = s.wo[..., 2]
    wo_sub_out = jnp.stack(
        [s.wo[..., 0] * ior, s.wo[..., 1] * ior, cos_to], axis=-1
    )
    w_sub = s.weight * ((1.0 - fi) * (1.0 - fo))[..., None]
    w_sub = w_sub * _absorption(params, cos_sub, cos_ti)
    w_sub = w_sub / jnp.maximum(1.0 - spec_prob, 1e-7)[..., None]
    p_sub = s.pdf * (1.0 - spec_prob) * eta * eta * cos_to / jnp.maximum(cos_sub, 1e-6)
    valid_sub = s.valid & (fo < 1.0) & (cos_sub > 0.0)

    wo_spec = vo.reflect(wi)
    w_spec = (fi / jnp.maximum(spec_prob, 1e-20))[..., None] * jnp.ones((1, 3))

    wo = jnp.where(pick_spec[..., None], wo_spec, wo_sub_out)
    w = jnp.where(pick_spec[..., None], w_spec, w_sub)
    p = jnp.where(pick_spec, spec_prob, p_sub)
    lobe = jnp.where(pick_spec, Lobes.SPECULAR_R, s.lobe).astype(jnp.int32)
    valid = (wi[..., 2] > 0.0) & jnp.where(pick_spec, True, valid_sub)
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], w, 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )
