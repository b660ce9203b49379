"""Rough dielectric (src/core/bsdfs/RoughDielectricBsdf.cpp, Walter 2007):
microfacet reflection + refraction with Fresnel lottery. The *Base functions
are shared by rough_plastic / rough_coat, mirroring the reference statics.
Params: [0] ior, [1] roughness, [2] distribution, [3] enable_refraction.
Radiance eta^2 folded into transmission weights (Bsdf wrapper semantics)."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from . import microfacet as mf
from .common import BsdfSample, Lobes
from .fresnel import dielectric_reflectance

NAME = "rough_dielectric"
LOBES = Lobes.GLOSSY_R | Lobes.GLOSSY_T


def lobes_for(spec, sub_lobes):
    if spec.get("enable_refraction", True):
        return Lobes.GLOSSY_R | Lobes.GLOSSY_T
    return Lobes.GLOSSY_R


def pack(spec, params, tex_builder):
    params[0] = spec.get("ior", 1.5)
    from .common import pack_roughness

    params[1] = pack_roughness(spec, "roughness", 0.1, tex_builder)
    params[2] = mf.dist_id(spec.get("distribution", "ggx"))
    params[3] = 1.0 if spec.get("enable_refraction", True) else 0.0
    return params


def sample_base(wi, u2, u1, rough, ior, dist, sample_r, sample_t):
    """RoughDielectricBsdf::sampleBase. sample_r/sample_t: (N,) bool masks.
    Returns BsdfSample (weight excludes albedo and eta^2)."""
    wi_dot_n = wi[..., 2]
    eta = jnp.where(wi_dot_n < 0.0, ior, 1.0 / ior)
    sample_rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi_dot_n))) * rough
    alpha = mf.roughness_to_alpha(dist, rough)
    sample_alpha = mf.roughness_to_alpha(dist, sample_rough)

    m = mf.sample(dist, sample_alpha, u2)
    pm = mf.pdf(dist, sample_alpha, m)
    wi_dot_m = vo.dot(wi, m)
    f, cos_t = dielectric_reflectance(1.0 / ior, wi_dot_m)
    eta_m = jnp.where(wi_dot_m < 0.0, ior, 1.0 / ior)

    # lottery (only meaningful where both lobes allowed)
    reflect = jnp.where(
        sample_r & sample_t, u1 < f, jnp.where(sample_r, True, False)
    )
    wo_r = 2.0 * wi_dot_m[..., None] * m - wi
    wo_t = (eta_m * wi_dot_m - jnp.sign(wi_dot_m) * cos_t)[..., None] * m - eta_m[..., None] * wi
    wo = jnp.where(reflect[..., None], wo_r, wo_t)
    wo_dot_n = wo[..., 2]
    reflected = wi_dot_n * wo_dot_n > 0.0
    valid = (pm > 1e-10) & (reflected == reflect) & (sample_r | sample_t)
    valid = valid & jnp.where(reflect, True, f < 1.0)

    wo_dot_m = vo.dot(wo, m)
    g = mf.G(dist, alpha, wi, wo, m)
    d = mf.D(dist, alpha, m)
    w = jnp.abs(wi_dot_m) * g * d / jnp.maximum(jnp.abs(wi_dot_n) * pm, 1e-20)

    pdf_r = pm * 0.25 / jnp.maximum(jnp.abs(wi_dot_m), 1e-20)
    pdf_t = pm * jnp.abs(wo_dot_m) / jnp.maximum((eta * wi_dot_m + wo_dot_m) ** 2, 1e-20)
    p = jnp.where(reflect, pdf_r, pdf_t)

    both = sample_r & sample_t
    p = jnp.where(both, p * jnp.where(reflect, f, 1.0 - f), p)
    w = jnp.where(both, w, w * jnp.where(reflect, f, 1.0 - f))

    lobe = jnp.where(reflect, Lobes.GLOSSY_R, Lobes.GLOSSY_T).astype(jnp.int32)
    return BsdfSample(wo=wo, weight=w[..., None] * jnp.ones((1, 3)), pdf=p, lobe=lobe, valid=valid)


def eval_base(wi, wo, rough, ior, dist, sample_r, sample_t):
    """RoughDielectricBsdf::evalBase -> (N,) scalar f*cos (no albedo/eta^2)."""
    wi_dot_n = wi[..., 2]
    wo_dot_n = wo[..., 2]
    reflect = wi_dot_n * wo_dot_n >= 0.0
    alpha = mf.roughness_to_alpha(dist, rough)
    eta = jnp.where(wi_dot_n < 0.0, ior, 1.0 / ior)
    m_r = jnp.sign(wi_dot_n)[..., None] * vo.normalize(wi + wo, eps=1e-12)
    m_t = -vo.normalize(wi * eta[..., None] + wo, eps=1e-12)
    m = jnp.where(reflect[..., None], m_r, m_t)
    wi_dot_m = vo.dot(wi, m)
    wo_dot_m = vo.dot(wo, m)
    f, _ = dielectric_reflectance(1.0 / ior, wi_dot_m)
    g = mf.G(dist, alpha, wi, wo, m)
    d = mf.D(dist, alpha, m)
    fr = f * g * d * 0.25 / jnp.maximum(jnp.abs(wi_dot_n), 1e-20)
    fs = (
        jnp.abs(wi_dot_m * wo_dot_m)
        * (1.0 - f)
        * g
        * d
        / jnp.maximum((eta * wi_dot_m + wo_dot_m) ** 2 * jnp.abs(wi_dot_n), 1e-20)
    )
    out = jnp.where(reflect, fr, fs)
    allowed = jnp.where(reflect, sample_r, sample_t)
    return jnp.where(allowed, out, 0.0)


def pdf_base(wi, wo, rough, ior, dist, sample_r, sample_t):
    wi_dot_n = wi[..., 2]
    wo_dot_n = wo[..., 2]
    reflect = wi_dot_n * wo_dot_n >= 0.0
    sample_rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi_dot_n))) * rough
    sample_alpha = mf.roughness_to_alpha(dist, sample_rough)
    eta = jnp.where(wi_dot_n < 0.0, ior, 1.0 / ior)
    m_r = jnp.sign(wi_dot_n)[..., None] * vo.normalize(wi + wo, eps=1e-12)
    m_t = -vo.normalize(wi * eta[..., None] + wo, eps=1e-12)
    m = jnp.where(reflect[..., None], m_r, m_t)
    wi_dot_m = vo.dot(wi, m)
    wo_dot_m = vo.dot(wo, m)
    f, _ = dielectric_reflectance(1.0 / ior, wi_dot_m)
    pm = mf.pdf(dist, sample_alpha, m)
    pdf_r = pm * 0.25 / jnp.maximum(jnp.abs(wi_dot_m), 1e-20)
    pdf_t = pm * jnp.abs(wo_dot_m) / jnp.maximum((eta * wi_dot_m + wo_dot_m) ** 2, 1e-20)
    p = jnp.where(reflect, pdf_r, pdf_t)
    both = sample_r & sample_t
    p = jnp.where(both, p * jnp.where(reflect, f, 1.0 - f), p)
    allowed = jnp.where(reflect, sample_r, sample_t)
    return jnp.where(allowed, p, 0.0)


def _masks(params, wi, nonspecular_only):
    n = wi.shape[0]
    enable_t = params[..., 3] > 0.5
    # glossy lobes are not specular: AllButSpecular keeps both
    sample_r = jnp.ones((n,), bool)
    sample_t = enable_t
    return sample_r, sample_t


def _eta2(wi, wo, ior):
    transmit = wi[..., 2] * wo[..., 2] < 0.0
    eta = jnp.where(wi[..., 2] < 0.0, ior, 1.0 / ior)
    return jnp.where(transmit, eta * eta, 1.0)


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    sr, st = _masks(params, wi, nonspecular_only)
    ior = params[..., 0]
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, params[..., 1], uv)
    f = eval_base(wi, wo, rough, ior, params[..., 2].astype(jnp.int32), sr, st)
    return albedo * (f * _eta2(wi, wo, ior))[..., None]


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    sr, st = _masks(params, wi, nonspecular_only)
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, params[..., 1], uv)
    return pdf_base(wi, wo, rough, params[..., 0], params[..., 2].astype(jnp.int32), sr, st)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    sr, st = _masks(params, wi, nonspecular_only)
    ior = params[..., 0]
    from .common import resolve_roughness

    rough = resolve_roughness(ctx, params[..., 1], uv)
    s = sample_base(wi, u2, u1, rough, ior, params[..., 2].astype(jnp.int32), sr, st)
    return BsdfSample(
        wo=s.wo,
        weight=s.weight * albedo * _eta2(wi, s.wo, ior)[..., None],
        pdf=s.pdf,
        lobe=s.lobe,
        valid=s.valid,
    )


def eta_sq(params, wi, wo):
    return _eta2(wi, wo, params[..., 0])
