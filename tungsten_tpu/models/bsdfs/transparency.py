"""Transparency wrapper (src/core/bsdfs/TransparencyBsdf.cpp): adds a forward
(pass-through) lobe weighted by 1 - alpha to a base BSDF.
Params: [0] base material index, [1] alpha texture id."""
from __future__ import annotations

import jax.numpy as jnp

from .common import BsdfSample, Lobes

NAME = "transparency"
IS_WRAPPER = True


def lobes_for(spec, sub_lobes_of):
    return Lobes.FORWARD | sub_lobes_of(spec["_base_index"])


def pack(spec, params, tex_builder):
    params[0] = spec.get("_base_index", -1)
    if params[0] < 0:
        raise ValueError("transparency requires a base bsdf")
    from ..textures import texture_from_spec

    params[1] = texture_from_spec(
        spec.get("alpha", 1.0), tex_builder, spec.get("_resolve_path"))
    return params


def forward_transparency(ctx, params, albedo, uv, wi):
    """eval(forwardEvent) = 1 - opacity (TransparencyBsdf::eval)."""
    from ..textures import eval_texture

    _, texs = ctx
    opacity = eval_texture(texs, params[..., 1].astype(jnp.int32), uv)[..., 0]
    return jnp.broadcast_to((1.0 - opacity)[..., None], wi.shape[:-1] + (3,))


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    from .dispatch import bsdf_eval

    return bsdf_eval(ctx, params[..., 0].astype(jnp.int32), uv, wi, wo, nonspecular_only, nested=True)


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    from .dispatch import bsdf_pdf

    return bsdf_pdf(ctx, params[..., 0].astype(jnp.int32), uv, wi, wo, nonspecular_only, nested=True)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    from .dispatch import bsdf_sample

    return bsdf_sample(ctx, params[..., 0].astype(jnp.int32), uv, wi, u2, u1, nonspecular_only, nested=True)
