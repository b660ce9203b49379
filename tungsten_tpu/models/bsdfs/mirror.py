"""Perfect mirror (src/core/bsdfs/MirrorBsdf.cpp): dirac specular reflection.

eval()/pdf() return 0 for path-space MIS (dirac lobes never participate);
sample() reports pdf = 1 as a discrete probability with weight = albedo.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from .common import BsdfSample, Lobes

NAME = "mirror"
LOBES = Lobes.SPECULAR_R


def pack(json_obj, params, tex_builder):
    return params


def eval(params, albedo, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def pdf(params, albedo, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(params, albedo, wi, u2, u1, nonspecular_only=False):
    if nonspecular_only:
        return BsdfSample.invalid(wi.shape[0])
    valid = wi[..., 2] > 0.0
    return BsdfSample(
        wo=vo.reflect(wi),
        weight=jnp.where(valid[..., None], albedo, 0.0),
        pdf=jnp.ones(wi.shape[:-1], jnp.float32),
        lobe=jnp.full(wi.shape[:-1], Lobes.SPECULAR_R, jnp.int32),
        valid=valid,
    )
