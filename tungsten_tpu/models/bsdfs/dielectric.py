"""Smooth dielectric (src/core/bsdfs/DielectricBsdf.cpp): dirac specular
reflection + refraction with Fresnel lottery. Radiance-transport eta^2
(Bsdf.hpp:87 non-adjoint wrapper with DielectricBsdf::eta) is folded into the
transmission weight. Params: [0] ior, [1] enable_refraction."""
from __future__ import annotations

import jax.numpy as jnp

from .common import BsdfSample, Lobes
from .fresnel import dielectric_reflectance

NAME = "dielectric"
LOBES = Lobes.SPECULAR_R | Lobes.SPECULAR_T


def lobes_for(spec, sub_lobes):
    if spec.get("enable_refraction", True):
        return Lobes.SPECULAR_R | Lobes.SPECULAR_T
    return Lobes.SPECULAR_R


def pack(spec, params, tex_builder):
    params[0] = spec.get("ior", 1.5)
    params[1] = 1.0 if spec.get("enable_refraction", True) else 0.0
    return params


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    if nonspecular_only:
        return BsdfSample.invalid(wi.shape[0])
    ior = params[..., 0]
    enable_t = params[..., 1] > 0.5
    wiz = wi[..., 2]
    eta = jnp.where(wiz < 0.0, ior, 1.0 / ior)
    f, cos_t = dielectric_reflectance(eta, jnp.abs(wiz))

    reflect_prob = jnp.where(enable_t, f, 1.0)
    reflect = u1 < reflect_prob

    wo_r = wi * jnp.array([-1.0, -1.0, 1.0])
    wo_t = jnp.stack(
        [
            -wi[..., 0] * eta,
            -wi[..., 1] * eta,
            -jnp.sign(wiz) * cos_t,
        ],
        axis=-1,
    )
    wo = jnp.where(reflect[..., None], wo_r, wo_t)
    # weight: with both lobes enabled the lottery cancels Fresnel (weight 1);
    # reflection-only keeps F. Transmission gets the radiance eta^2 factor.
    w_r = jnp.where(enable_t, 1.0, f)
    eta2 = eta * eta
    w = jnp.where(reflect, w_r, eta2)
    p = jnp.where(reflect, reflect_prob, 1.0 - reflect_prob)
    valid = reflect | (f < 1.0)
    lobe = jnp.where(reflect, Lobes.SPECULAR_R, Lobes.SPECULAR_T).astype(jnp.int32)
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], albedo * w[..., None], 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )


def eta_sq(params, wi, wo):
    ior = params[..., 0]
    transmit = wi[..., 2] * wo[..., 2] < 0.0
    eta = jnp.where(wi[..., 2] < 0.0, ior, 1.0 / ior)
    return jnp.where(transmit, eta * eta, 1.0)
