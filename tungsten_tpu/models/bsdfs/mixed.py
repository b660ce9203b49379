"""Mixed BSDF (src/core/bsdfs/MixedBsdf.cpp): texture-ratio blend of two
BSDFs with one-sample MIS combination.
Params: [0] bsdf0 index, [1] bsdf1 index, [2] ratio texture id."""
from __future__ import annotations

import jax.numpy as jnp

from .common import BsdfSample, Lobes

NAME = "mixed"
IS_WRAPPER = True


def lobes_for(spec, sub_lobes_of):
    return sub_lobes_of(spec["_bsdf0_index"]) | sub_lobes_of(spec["_bsdf1_index"])


def pack(spec, params, tex_builder):
    params[0] = spec.get("_bsdf0_index", -1)
    params[1] = spec.get("_bsdf1_index", -1)
    if params[0] < 0 or params[1] < 0:
        raise ValueError("mixed requires bsdf0 and bsdf1")
    from ..textures import texture_from_spec

    params[2] = texture_from_spec(
        spec.get("ratio", 0.5), tex_builder, spec.get("_resolve_path"))
    return params


def _parts(ctx, params, uv):
    from ..textures import eval_texture

    _, texs = ctx
    id0 = params[..., 0].astype(jnp.int32)
    id1 = params[..., 1].astype(jnp.int32)
    ratio = eval_texture(texs, params[..., 2].astype(jnp.int32), uv)[..., 0]
    return id0, id1, ratio


def _adjusted_ratio(ctx, id0, id1, ratio, nonspecular_only):
    mats, _ = ctx
    if not nonspecular_only:
        return ratio
    mask = ~(Lobes.SPECULAR | Lobes.FORWARD)
    ok0 = (mats.lobes[id0] & mask) != 0
    ok1 = (mats.lobes[id1] & mask) != 0
    return jnp.where(ok0 & ok1, ratio, jnp.where(ok0, 1.0, jnp.where(ok1, 0.0, -1.0)))


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    from .dispatch import bsdf_eval

    id0, id1, ratio = _parts(ctx, params, uv)
    f0 = bsdf_eval(ctx, id0, uv, wi, wo, nonspecular_only, nested=True)
    f1 = bsdf_eval(ctx, id1, uv, wi, wo, nonspecular_only, nested=True)
    return albedo * (f0 * ratio[..., None] + f1 * (1.0 - ratio)[..., None])


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    from .dispatch import bsdf_pdf

    id0, id1, ratio = _parts(ctx, params, uv)
    r = _adjusted_ratio(ctx, id0, id1, ratio, nonspecular_only)
    p0 = bsdf_pdf(ctx, id0, uv, wi, wo, nonspecular_only, nested=True)
    p1 = bsdf_pdf(ctx, id1, uv, wi, wo, nonspecular_only, nested=True)
    return jnp.where(r >= 0.0, p0 * r + p1 * (1.0 - r), 0.0)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    from .dispatch import bsdf_eval, bsdf_pdf, bsdf_sample

    id0, id1, ratio = _parts(ctx, params, uv)
    r = _adjusted_ratio(ctx, id0, id1, ratio, nonspecular_only)
    pick0 = u1 < r
    u1_re = jnp.clip(
        jnp.where(pick0, u1 / jnp.maximum(r, 1e-7), (u1 - r) / jnp.maximum(1.0 - r, 1e-7)),
        0.0,
        1.0 - 1e-7,
    )
    s0 = bsdf_sample(ctx, id0, uv, wi, u2, u1_re, nonspecular_only, nested=True)
    s1 = bsdf_sample(ctx, id1, uv, wi, u2, u1_re, nonspecular_only, nested=True)
    wo = jnp.where(pick0[..., None], s0.wo, s1.wo)
    lobe = jnp.where(pick0, s0.lobe, s1.lobe)
    valid = jnp.where(pick0, s0.valid, s1.valid) & (r >= 0.0)

    # one-sample MIS (MixedBsdf::sample): f/pdf with the mixture pdf, where
    # the sampled side's f is reconstructed from weight*pdf
    own_f = jnp.where(pick0[..., None], s0.weight * s0.pdf[..., None], s1.weight * s1.pdf[..., None])
    other_f = jnp.where(
        pick0[..., None],
        bsdf_eval(ctx, id1, uv, wi, wo, nonspecular_only, nested=True),
        bsdf_eval(ctx, id0, uv, wi, wo, nonspecular_only, nested=True),
    )
    other_pdf = jnp.where(
        pick0,
        bsdf_pdf(ctx, id1, uv, wi, wo, nonspecular_only, nested=True),
        bsdf_pdf(ctx, id0, uv, wi, wo, nonspecular_only, nested=True),
    )
    r_own = jnp.where(pick0, r, 1.0 - r)
    f = own_f * r_own[..., None] + other_f * (1.0 - r_own)[..., None]
    p = jnp.where(pick0, s0.pdf, s1.pdf) * r_own + other_pdf * (1.0 - r_own)
    w = albedo * f / jnp.maximum(p, 1e-30)[..., None]
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], w, 0.0),
        pdf=p,
        lobe=lobe,
        valid=valid,
    )
