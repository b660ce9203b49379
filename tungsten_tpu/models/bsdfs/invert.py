"""BSDF sampling inversion (RJ-MLT machinery).

Mirror of the reference's Bsdf::invert hierarchy (Bsdf.hpp:68,
LambertBsdf.cpp:60-73, OrenNayarBsdf.cpp:102-123, PlasticBsdf.cpp:90-123,
MirrorBsdf.hpp, DielectricBsdf.cpp, RoughConductorBsdf.hpp with
Microfacet::invert, Microfacet.hpp:132-157): given (wi, wo) at a surface
vertex, reconstruct primary-sample uniforms (u2, u1) such that
bsdf_sample(ctx, mat, uv, wi, u2, u1) regenerates wo — the core of the
reversible-jump strategy perturbation (ReversibleJumpMltTracer.cpp:196).

`mu` (3 free uniforms) fills the dimensions the inversion does not
constrain: branch lotteries land at mu-proportional positions inside their
acceptance interval and degenerate azimuths take mu directly — mirroring the
reference's untrackedBoolean()/untracked1D() calls.

Types without an inversion (wrappers, rough_dielectric, hair, thinsheet,
forward, ...) report ok=False; the RJ-MLT proposal containing them is
rejected with proposalWeight 0, exactly the reference's failure path.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from ...sampling import warps
from . import microfacet as mf
from .common import Lobes
from .fresnel import dielectric_reflectance

_REFL_EPS = 1e-4


def _is_reflection(wi, wo):
    r = vo.reflect(wi)
    return vo.dot(r, wo) > 1.0 - _REFL_EPS


def _put_bool(p, value, mu):
    """Uniform that makes (u < p) == value, placed mu-deep in its interval."""
    p = jnp.clip(p, 0.0, 1.0)
    return jnp.where(value, mu * p, p + mu * (1.0 - p))


def microfacet_invert(dist, alpha, m, mu=0.5):
    """Microfacet::invert (Microfacet.hpp:132-157): half-vector m -> xi."""
    xi_phi = warps.invert_phi(m, mu)
    cos_t = jnp.clip(m[..., 2], 1e-7, 1.0)
    tan_sq = 1.0 / (cos_t * cos_t) - 1.0
    a_sq = jnp.maximum(alpha * alpha, 1e-20)
    x_beck = 1.0 - jnp.exp(-tan_sq / a_sq)
    x_phong = jnp.power(cos_t, alpha + 2.0)
    gamma = tan_sq / a_sq
    x_ggx = gamma / (1.0 + gamma)
    x0 = jnp.where(
        dist == mf.BECKMANN, x_beck, jnp.where(dist == mf.PHONG, x_phong, x_ggx)
    )
    return jnp.stack([jnp.clip(x0, 0.0, 1.0), xi_phi], axis=-1)


def _inv_lambert(ctx, params, albedo, uv, wi, wo, mu):
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return warps.invert_cosine_hemisphere(wo, mu[0]), mu[2], ok


def _inv_oren_nayar(ctx, params, albedo, uv, wi, wo, mu):
    from . import oren_nayar

    # roughness is a texture id (ordinary Texture, OrenNayarBsdf.hpp)
    ratio = jnp.clip(oren_nayar._rough(ctx, params, uv), 0.01, 1.0)
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    pdf_u = warps.uniform_hemisphere_pdf(wo) * ratio
    pdf_c = warps.cosine_hemisphere_pdf(wo) * (1.0 - ratio)
    pick_u = mu[1] < pdf_u / jnp.maximum(pdf_u + pdf_c, 1e-20)
    u2 = jnp.where(
        pick_u[..., None],
        warps.invert_uniform_hemisphere(wo, mu[0]),
        warps.invert_cosine_hemisphere(wo, mu[0]),
    )
    u1 = _put_bool(ratio, pick_u, mu[2])
    return u2, u1, ok


def _inv_mirror(ctx, params, albedo, uv, wi, wo, mu):
    ok = (wi[..., 2] > 0.0) & _is_reflection(wi, wo)
    n = wi.shape[0]
    u2 = jnp.stack([mu[0], mu[0]], axis=-1)
    return u2, mu[2], ok


def _inv_phong(ctx, params, albedo, uv, wi, wo, mu):
    exponent = params[..., 0]
    dr = params[..., 1]
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    refl = vo.reflect(wi)
    t, b = vo.tangent_frame(refl)
    loc = vo.to_local(t, b, refl, wo)
    in_lobe = loc[..., 2] > 0.0
    # branch posteriors (glossy_pick = u1 >= dr)
    pdf_g = jnp.where(
        in_lobe,
        (1.0 - dr) * (exponent + 1.0) * warps.INV_TWO_PI
        * jnp.power(jnp.maximum(loc[..., 2], 1e-7), exponent),
        0.0,
    )
    pdf_d = dr * warps.cosine_hemisphere_pdf(wo)
    pick_g = (mu[1] < pdf_g / jnp.maximum(pdf_g + pdf_d, 1e-20)) & in_lobe
    u2_g = jnp.stack(
        [
            warps.invert_phi(loc, mu[0]),
            jnp.power(jnp.clip(loc[..., 2], 1e-7, 1.0), 1.0 + exponent),
        ],
        axis=-1,
    )
    u2 = jnp.where(pick_g[..., None], u2_g, warps.invert_cosine_hemisphere(wo, mu[0]))
    u1 = _put_bool(dr, ~pick_g, mu[2])  # glossy_pick = (u1 >= dr)
    ok = ok & ((pdf_g + pdf_d) > 0.0)
    return u2, u1, ok


def _inv_plastic(ctx, params, albedo, uv, wi, wo, mu):
    from .plastic import _spec_prob

    n = wi.shape[0]
    sample_r = jnp.ones((n,), bool)
    sample_t = jnp.ones((n,), bool)
    sp, _ = _spec_prob(params, wi, sample_r, sample_t)
    is_spec = _is_reflection(wi, wo)
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    u1 = _put_bool(sp, is_spec, mu[2])  # pick_spec = (u1 < sp)
    u2 = warps.invert_cosine_hemisphere(wo, mu[0])
    u2 = jnp.where(is_spec[..., None], jnp.stack([mu[0], mu[0]], axis=-1), u2)
    return u2, u1, ok


def _inv_rough_plastic(ctx, params, albedo, uv, wi, wo, mu):
    from .common import resolve_roughness
    from .rough_plastic import _spec_prob as rp_spec_prob, _tr as rp_tr

    rough, ior, dist = rp_tr(params)
    rough = resolve_roughness(ctx, rough, uv)
    # the glossy lobe SAMPLES its half-vector with the scaled roughness
    # (RoughDielectricBsdf::sampleBase) — invert with the same alpha
    sample_rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi[..., 2]))) * rough
    alpha_s = mf.roughness_to_alpha(dist, sample_rough)
    sp = rp_spec_prob(params, wi)
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    m = vo.normalize(wi + wo, eps=1e-12)
    # glossy-vs-diffuse posterior at wo (sampling-measure pdfs)
    pdf_g = sp * mf.pdf(dist, alpha_s, m) * 0.25 / jnp.maximum(
        jnp.abs(vo.dot(wi, m)), 1e-20
    )
    pdf_d = (1.0 - sp) * warps.cosine_hemisphere_pdf(wo)
    pick_g = mu[1] < pdf_g / jnp.maximum(pdf_g + pdf_d, 1e-20)
    u2 = jnp.where(
        pick_g[..., None],
        microfacet_invert(dist, alpha_s, m, mu[0]),
        warps.invert_cosine_hemisphere(wo, mu[0]),
    )
    u1 = _put_bool(sp, pick_g, mu[2])
    ok = ok & ((pdf_g + pdf_d) > 0.0)
    return u2, u1, ok


def _inv_rough_conductor(ctx, params, albedo, uv, wi, wo, mu):
    from .common import resolve_roughness
    from .rough_conductor import _unpack as rc_unpack

    _, _, rough, dist = rc_unpack(params)
    rough = resolve_roughness(ctx, rough, uv)
    alpha = mf.roughness_to_alpha(dist, rough)
    m = vo.normalize(wi + wo, eps=1e-12)
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (vo.dot(wi, m) > 0.0)
    return microfacet_invert(dist, alpha, m, mu[0]), mu[2], ok


def _inv_conductor(ctx, params, albedo, uv, wi, wo, mu):
    return _inv_mirror(ctx, params, albedo, uv, wi, wo, mu)


def _inv_dielectric(ctx, params, albedo, uv, wi, wo, mu):
    n = wi.shape[0]
    ior = params[..., 0]
    enable_t = params[..., 1] > 0.5
    wiz = wi[..., 2]
    eta = jnp.where(wiz < 0.0, ior, 1.0 / ior)
    f, cos_t = dielectric_reflectance(eta, jnp.abs(wiz))
    reflect_prob = jnp.where(enable_t, f, 1.0)
    is_refl = _is_reflection(wi, wo)
    # refraction constraint: wo == the analytic refraction of wi
    wo_t = jnp.stack(
        [-wi[..., 0] * eta, -wi[..., 1] * eta, -jnp.sign(wiz) * cos_t], axis=-1
    )
    is_refr = vo.dot(vo.normalize(wo_t, eps=1e-12), wo) > 1.0 - _REFL_EPS
    is_refr = is_refr & enable_t & (f < 1.0)
    ok = is_refl | is_refr
    u1 = _put_bool(reflect_prob, is_refl, mu[2])
    return jnp.stack([mu[0], mu[0]], axis=-1), u1, ok


_INVERTERS = {
    "lambert": _inv_lambert,
    "oren_nayar": _inv_oren_nayar,
    "mirror": _inv_mirror,
    "conductor": _inv_conductor,
    "phong": _inv_phong,
    "plastic": _inv_plastic,
    "rough_plastic": _inv_rough_plastic,
    "rough_conductor": _inv_rough_conductor,
    "dielectric": _inv_dielectric,
}


def bsdf_invert(ctx, mat_id, uv, wi, wo, mu=(0.5, 0.5, 0.5)):
    """Masked dispatch over material types (like dispatch.bsdf_sample).
    Returns (u2 (N, 2), u1 (N,), ok (N,)); ok=False for non-invertible
    types or geometrically impossible (wi, wo) pairs."""
    from .dispatch import module_for_id

    materials, textures = ctx
    from ..textures import eval_texture

    albedo = eval_texture(textures, materials.albedo_tex[mat_id], uv)
    params = materials.params[mat_id]
    tid = materials.type[mat_id]

    n = wi.shape[0]
    mu_arr = tuple(
        jnp.broadcast_to(jnp.asarray(m, jnp.float32), (n,)) for m in mu
    )
    u2 = jnp.stack([mu_arr[0], mu_arr[0]], axis=-1)
    u1 = mu_arr[2]
    ok = jnp.zeros((n,), bool)
    for type_id in materials.present:
        mod = module_for_id(type_id)
        fn = _INVERTERS.get(mod.NAME)
        if fn is None:
            continue
        iu2, iu1, iok = fn(ctx, params, albedo, uv, wi, wo, mu_arr)
        mask = tid == type_id
        u2 = jnp.where(mask[..., None], iu2, u2)
        u1 = jnp.where(mask, jnp.broadcast_to(iu1, (n,)), u1)
        ok = jnp.where(mask, iok, ok)
    return u2, u1, ok
