"""Thin sheet (src/core/bsdfs/ThinSheetBsdf.cpp): infinitely thin dielectric
slab — specular reflection with summed internal bounces, transmission as a
forward lobe. Params: [0] ior, [1:4] sigmaA, [4] thickness,
[5] enable_interference. The interference variant evaluates the
wavelength-dependent thin-film reflectance at the RGB primaries
(Fresnel::thinFilmReflectanceInterference, Fresnel.hpp:39-67; thickness
in units of 500 nm per ThinSheetBsdf.cpp:68-70)."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from .common import BsdfSample, Lobes

NAME = "thinsheet"
LOBES = Lobes.SPECULAR_R | Lobes.FORWARD


def pack(spec, params, tex_builder):
    import numpy as np

    params[0] = spec.get("ior", 1.5)
    params[5] = 1.0 if spec.get("enable_interference", False) else 0.0
    sa = np.asarray(spec.get("sigma_a", 0.0), np.float32).ravel()
    params[1:4] = np.repeat(sa, 3) if sa.size == 1 else sa
    # thickness is an ordinary Texture in the reference (ThinSheetBsdf.hpp)
    from ..textures import texture_from_spec

    params[4] = texture_from_spec(
        spec.get("thickness", 0.5), tex_builder, spec.get("_resolve_path"))
    return params


def _thin_film_reflectance(eta, cos_i):
    """Fresnel::thinFilmReflectance (Fresnel.hpp:15): summed multiple internal
    reflections of a thin slab. Returns (R, cos_t)."""
    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin_t_sq > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    rs = ((eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-20)) ** 2
    rp = ((eta * cos_t - cos_i) / jnp.maximum(eta * cos_t + cos_i, 1e-20)) ** 2
    r = 1.0 - ((1.0 - rs) / (1.0 + rs) + (1.0 - rp) / (1.0 + rp)) * 0.5
    return jnp.where(tir, 1.0, r), jnp.where(tir, 0.0, cos_t)


def _thin_film_interference(eta, cos_i, thickness_nm):
    """Fresnel::thinFilmReflectanceInterference (Fresnel.hpp:39-67):
    wavelength-dependent slab reflectance at the 650/510/475 nm RGB
    primaries. eta = 1/ior (the reference's calling convention); returns
    (R (N, 3), cos_t (N,))."""
    inv_lam = 1.0 / jnp.array([650.0, 510.0, 475.0], jnp.float32)
    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin_t_sq > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    ts = 4.0 * eta * cos_i * cos_t / jnp.maximum((eta * cos_i + cos_t) ** 2, 1e-20)
    tp = 4.0 * eta * cos_i * cos_t / jnp.maximum((eta * cos_t + cos_i) ** 2, 1e-20)
    rs = 1.0 - ts
    rp = 1.0 - tp
    phi = (thickness_nm * cos_t * (4.0 * jnp.pi) / eta)[..., None] * inv_lam
    cphi = jnp.cos(phi)
    t_s = ts[..., None] ** 2 / jnp.maximum(
        (rs[..., None] ** 2 + 1.0) - 2.0 * rs[..., None] * cphi, 1e-20
    )
    t_p = tp[..., None] ** 2 / jnp.maximum(
        (rp[..., None] ** 2 + 1.0) - 2.0 * rp[..., None] * cphi, 1e-20
    )
    r = 1.0 - (t_s + t_p) * 0.5
    return jnp.where(tir[..., None], 1.0, r), jnp.where(tir, 0.0, cos_t)


def _transmittance(ctx, params, uv, wi):
    """-> (R (N, 3), trans (N, 3)); R colored only under interference."""
    eta = 1.0 / params[..., 0]
    cos_i = jnp.abs(wi[..., 2])
    r_p, cos_t_p = _thin_film_reflectance(eta, cos_i)
    from ..textures import eval_texture

    _, texs = ctx
    thickness = eval_texture(texs, params[..., 4].astype(jnp.int32), uv)[..., 0]
    r_i, cos_t_i = _thin_film_interference(eta, cos_i, thickness * 500.0)
    interf = params[..., 5] > 0.5
    r3 = jnp.where(interf[..., None], r_i, r_p[..., None] * jnp.ones((1, 3)))
    cos_t = jnp.where(interf, cos_t_i, cos_t_p)
    trans = 1.0 - r3
    sigma = params[..., 1:4] * thickness[..., None]
    att = jnp.exp(-sigma * (2.0 / jnp.maximum(cos_t, 1e-6))[..., None])
    trans = jnp.where(
        (jnp.any(sigma > 0, axis=-1) & (cos_t > 0.0))[..., None], trans * att, trans
    )
    return r3, trans


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def forward_transparency(ctx, params, albedo, uv, wi):
    _, trans = _transmittance(ctx, params, uv, wi)
    return trans


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    if nonspecular_only:
        return BsdfSample.invalid(wi.shape[0])
    r3, trans = _transmittance(ctx, params, uv, wi)
    # reflection weight normalized by the forward-lottery complement
    # (ThinSheetBsdf::sample: weight = R / (1 - avg(trans)))
    w = r3 / jnp.maximum(1.0 - vo.avg3(trans), 1e-6)[..., None]
    return BsdfSample(
        wo=vo.reflect(wi),
        weight=w,
        pdf=jnp.ones(wi.shape[:-1], jnp.float32),
        lobe=jnp.full(wi.shape[:-1], Lobes.SPECULAR_R, jnp.int32),
        valid=jnp.ones(wi.shape[:-1], bool),
    )
