"""Forward BSDF (src/core/bsdfs/ForwardBsdf.cpp): pure pass-through; only
participates via the integrator's transparency lottery (forward lobe)."""
from __future__ import annotations

import jax.numpy as jnp

from .common import BsdfSample, Lobes

NAME = "forward"
LOBES = Lobes.FORWARD


def pack(spec, params, tex_builder):
    return params


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def forward_transparency(ctx, params, albedo, uv, wi):
    """bsdf.eval(forwardEvent): transmitted fraction for straight-through
    continuation (TraceBase::handleSurface lottery)."""
    return jnp.ones(wi.shape[:-1] + (3,), jnp.float32)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    return BsdfSample.invalid(wi.shape[0])
