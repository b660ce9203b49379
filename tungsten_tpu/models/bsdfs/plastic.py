"""Smooth plastic (src/core/bsdfs/PlasticBsdf.cpp): dirac specular coat over
internally-scattered diffuse with absorption.
Params: [0] ior, [1:4] scaledSigmaA, [4] avgTransmittance, [5] diffuseFresnel.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...math import vecops as vo
from ...sampling import warps
from .common import BsdfSample, Lobes
from .fresnel import dielectric_reflectance

NAME = "plastic"
LOBES = Lobes.SPECULAR_R | Lobes.DIFFUSE_R


def compute_diffuse_fresnel(ior: float, samples: int = 100000) -> float:
    """Fresnel::computeDiffuseFresnel (Fresnel.hpp:141): trapezoid integral of
    the dielectric reflectance over the projected hemisphere."""
    i = np.arange(1, samples + 1)
    cos_sq = i / samples
    cos_i = np.minimum(np.sqrt(cos_sq), 1.0)
    eta = ior
    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    cos_t = np.sqrt(np.maximum(1.0 - sin_t_sq, 0.0))
    rs = (eta * cos_i - cos_t) / np.maximum(eta * cos_i + cos_t, 1e-20)
    rp = (eta * cos_t - cos_i) / np.maximum(eta * cos_t + cos_i, 1e-20)
    fa = np.where(sin_t_sq > 1.0, 1.0, 0.5 * (rs * rs + rp * rp))
    fb = np.concatenate([[1.0 if eta > 1.0 else _f_scalar(eta, 0.0)], fa[:-1]])
    return float(np.sum((fa + fb) * (0.5 / samples)))


def _f_scalar(eta, cos_i):
    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    if sin_t_sq > 1.0:
        return 1.0
    cos_t = np.sqrt(max(1.0 - sin_t_sq, 0.0))
    rs = (eta * cos_i - cos_t) / max(eta * cos_i + cos_t, 1e-20)
    rp = (eta * cos_t - cos_i) / max(eta * cos_t + cos_i, 1e-20)
    return 0.5 * (rs * rs + rp * rp)


def pack_coat_common(spec, params, default_ior=1.5):
    params[0] = spec.get("ior", default_ior)
    sa = np.asarray(spec.get("sigma_a", 0.0), np.float64).ravel()
    sa = np.repeat(sa, 3) if sa.size == 1 else sa
    th = spec.get("thickness", 1.0)
    scaled = th * sa
    params[1:4] = scaled
    params[4] = np.exp(-2.0 * scaled.mean())
    return params


def pack(spec, params, tex_builder):
    params = pack_coat_common(spec, params)
    params[5] = compute_diffuse_fresnel(float(params[0]))
    return params


def _diffuse_f(params, albedo, wi, wo):
    """Inner diffuse term incl. both Fresnel factors, absorption, eta^2 and
    the multiple-scattering compensation. Returns f*cos."""
    ior = params[..., 0]
    eta = 1.0 / ior
    fi, _ = dielectric_reflectance(eta, wi[..., 2])
    fo, _ = dielectric_reflectance(eta, wo[..., 2])
    dfres = params[..., 5:6]
    brdf = ((1.0 - fi) * (1.0 - fo) * eta * eta * wo[..., 2] * warps.INV_PI)[..., None] * (
        albedo / (1.0 - albedo * dfres)
    )
    sig = params[..., 1:4]
    att = jnp.exp(sig * (-1.0 / jnp.maximum(wo[..., 2:3], 1e-6) - 1.0 / jnp.maximum(wi[..., 2:3], 1e-6)))
    return jnp.where(jnp.any(sig > 0, axis=-1, keepdims=True), brdf * att, brdf)


def _spec_prob(params, wi, sample_r, sample_t):
    fi, _ = dielectric_reflectance(1.0 / params[..., 0], wi[..., 2])
    substrate = params[..., 4] * (1.0 - fi)
    p = fi / jnp.maximum(fi + substrate, 1e-20)
    return jnp.where(sample_r & sample_t, p, jnp.where(sample_r, 1.0, 0.0)), fi


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(valid[..., None], _diffuse_f(params, albedo, wi, wo), 0.0)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    p = warps.cosine_hemisphere_pdf(wo)
    if not nonspecular_only:
        sp, _ = _spec_prob(params, wi, jnp.ones(wi.shape[:-1], bool), jnp.ones(wi.shape[:-1], bool))
        p = p * (1.0 - sp)
    return jnp.where(valid, p, 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    n = wi.shape[0]
    sample_r = jnp.full((n,), not nonspecular_only)
    sample_t = jnp.ones((n,), bool)
    sp, fi = _spec_prob(params, wi, sample_r, sample_t)
    pick_spec = sample_r & (u1 < sp)

    wo_spec = vo.reflect(wi)
    w_spec = (fi / jnp.maximum(sp, 1e-20))[..., None] * jnp.ones((1, 3))

    wo_diff = warps.cosine_hemisphere(u2)
    w_diff = _diffuse_f(params, albedo, wi, wo_diff) / jnp.maximum(
        warps.cosine_hemisphere_pdf(wo_diff), 1e-20
    )[..., None]
    w_diff = w_diff / jnp.maximum(1.0 - sp, 1e-20)[..., None]

    wo = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
    w = jnp.where(pick_spec[..., None], w_spec, w_diff)
    p = jnp.where(pick_spec, sp, warps.cosine_hemisphere_pdf(wo) * (1.0 - sp))
    lobe = jnp.where(pick_spec, Lobes.SPECULAR_R, Lobes.DIFFUSE_R).astype(jnp.int32)
    valid = wi[..., 2] > 0.0
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], w, 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )
