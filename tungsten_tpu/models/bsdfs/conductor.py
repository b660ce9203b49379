"""Smooth conductor (src/core/bsdfs/ConductorBsdf.cpp): dirac specular
reflection with complex-IOR Fresnel. Params: [0:3] eta, [3:6] k."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...math import vecops as vo
from .common import BsdfSample, Lobes
from .complex_ior import lookup
from .fresnel import conductor_reflectance

NAME = "conductor"
LOBES = Lobes.SPECULAR_R


def pack(spec, params, tex_builder):
    eta = spec.get("eta")
    k = spec.get("k")
    if eta is None or k is None:
        mat = lookup(spec.get("material", "Cu"))
        if mat is None:
            raise ValueError(f"unknown conductor material {spec.get('material')!r}")
        eta, k = mat
    params[0:3] = np.asarray(eta, np.float32)
    params[3:6] = np.asarray(k, np.float32)
    return params


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1] + (3,), jnp.float32)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return jnp.zeros(wi.shape[:-1], jnp.float32)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    if nonspecular_only:
        return BsdfSample.invalid(wi.shape[0])
    f = conductor_reflectance(params[..., 0:3], params[..., 3:6], wi[..., 2])
    return BsdfSample(
        wo=vo.reflect(wi),
        weight=albedo * f,
        pdf=jnp.ones(wi.shape[:-1], jnp.float32),
        lobe=jnp.full(wi.shape[:-1], Lobes.SPECULAR_R, jnp.int32),
        valid=jnp.ones(wi.shape[:-1], bool),
    )
