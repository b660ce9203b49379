"""Thin sheet (src/core/bsdfs/ThinSheetBsdf.cpp): infinitely thin dielectric
slab — specular reflection with summed internal bounces, transmission as a
forward lobe. Params: [0] ior, [1:4] sigmaA, [4] thickness.
(Thin-film interference variant not yet implemented.)"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from .common import BsdfSample, Lobes

NAME = "thinsheet"
LOBES = Lobes.SPECULAR_R | Lobes.FORWARD


def pack(spec, params, tex_builder):
    import numpy as np

    if spec.get("enable_interference", False):
        raise NotImplementedError("thin-film interference")
    params[0] = spec.get("ior", 1.5)
    sa = np.asarray(spec.get("sigma_a", 0.0), np.float32).ravel()
    params[1:4] = np.repeat(sa, 3) if sa.size == 1 else sa
    th = spec.get("thickness", 0.5)
    if not isinstance(th, (int, float)):
        raise NotImplementedError("textured thickness")
    params[4] = th
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


def _transmittance(params, wi):
    eta = 1.0 / params[..., 0]
    r, cos_t = _thin_film_reflectance(eta, jnp.abs(wi[..., 2]))
    trans = (1.0 - r)[..., None] * jnp.ones((1, 3))
    sigma = params[..., 1:4] * params[..., 4:5]
    att = jnp.exp(-sigma * (2.0 / jnp.maximum(cos_t, 1e-6))[..., None])
    trans = jnp.where(
        (jnp.any(sigma > 0, axis=-1) & (cos_t > 0.0))[..., None], trans * att, trans
    )
    return r, trans


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def forward_transparency(ctx, params, albedo, uv, wi):
    _, trans = _transmittance(params, wi)
    return trans


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    if nonspecular_only:
        return BsdfSample.invalid(wi.shape[0])
    r, trans = _transmittance(params, wi)
    # reflection weight normalized by the forward-lottery complement
    # (ThinSheetBsdf::sample: weight = R / (1 - avg(trans)))
    w = r[..., None] / jnp.maximum(1.0 - vo.avg3(trans), 1e-6)[..., None]
    return BsdfSample(
        wo=vo.reflect(wi),
        weight=w,
        pdf=jnp.ones(wi.shape[:-1], jnp.float32),
        lobe=jnp.full(wi.shape[:-1], Lobes.SPECULAR_R, jnp.int32),
        valid=jnp.ones(wi.shape[:-1], bool),
    )
