"""Null BSDF (src/core/bsdfs/NullBsdf.cpp) — absorbs everything; used on
light geometry so paths terminate after collecting emission."""
from __future__ import annotations

import jax.numpy as jnp

from .common import BsdfSample, Lobes

NAME = "null"
LOBES = Lobes.NULL


def pack(json_obj, params, tex_builder):
    return params


def eval(params, albedo, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def pdf(params, albedo, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(params, albedo, wi, u2, u1, nonspecular_only=False):
    return BsdfSample.invalid(wi.shape[0])
