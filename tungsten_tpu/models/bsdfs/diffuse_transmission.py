"""Diffuse transmission (src/core/bsdfs/DiffuseTransmissionBsdf.cpp):
two-sided cosine lobes split by a transmittance ratio.
Params: [0] transmittance."""
from __future__ import annotations

import jax.numpy as jnp

from ...sampling import warps
from .common import BsdfSample, Lobes

NAME = "diffuse_transmission"
LOBES = Lobes.DIFFUSE_R | Lobes.DIFFUSE_T


def pack(spec, params, tex_builder):
    params[0] = spec.get("transmittance", 0.5)
    return params


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    tr = params[..., 0]
    factor = jnp.where(wi[..., 2] * wo[..., 2] < 0.0, tr, 1.0 - tr)
    return albedo * (factor * warps.INV_PI * jnp.abs(wo[..., 2]))[..., None]


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    tr = params[..., 0]
    factor = jnp.where(wi[..., 2] * wo[..., 2] < 0.0, tr, 1.0 - tr)
    return factor * warps.INV_PI * jnp.abs(wo[..., 2])


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    tr = params[..., 0]
    transmit = u1 < tr
    wo = warps.cosine_hemisphere(u2)
    woz = jnp.abs(wo[..., 2]) * jnp.sign(wi[..., 2]) * jnp.where(transmit, -1.0, 1.0)
    wo = wo.at[..., 2].set(woz)
    p = warps.INV_PI * jnp.abs(woz) * jnp.where(transmit, tr, 1.0 - tr)
    lobe = jnp.where(transmit, Lobes.DIFFUSE_T, Lobes.DIFFUSE_R).astype(jnp.int32)
    return BsdfSample(
        wo=wo,
        weight=albedo,
        pdf=p,
        lobe=lobe,
        valid=jnp.ones(wi.shape[:-1], bool),
    )
