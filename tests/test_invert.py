"""RJ-MLT inversion machinery: sample -> invert -> sample round-trips.

Mirrors the reference's invert contract (Bsdf.hpp:68): re-sampling with the
inverted primary numbers must reproduce the same outgoing direction (and the
same branch/lobe), up to fp rounding.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.models.bsdfs.dispatch import pack_materials
from tungsten_tpu.models.bsdfs import bsdf_sample
from tungsten_tpu.models.bsdfs.invert import bsdf_invert
from tungsten_tpu.models.textures import TextureBuilder
from tungsten_tpu.sampling import warps


SPECS = [
    {"type": "lambert", "albedo": 0.7},
    {"type": "oren_nayar", "albedo": 0.7, "roughness": 0.3},
    {"type": "mirror", "albedo": 1.0},
    {"type": "phong", "albedo": 0.7, "exponent": 30.0, "diffuse_ratio": 0.4},
    {"type": "plastic", "albedo": 0.7, "ior": 1.5},
    {"type": "rough_conductor", "material": "Cu", "roughness": 0.3},
    {"type": "rough_plastic", "albedo": 0.7, "ior": 1.5, "roughness": 0.25},
    {"type": "dielectric", "albedo": 1.0, "ior": 1.5},
    {"type": "conductor", "material": "Cu"},
]


def _ctx_for(specs):
    tb = TextureBuilder()
    mats = pack_materials([dict(s) for s in specs], tb)
    return (mats, tb.build())


@pytest.mark.parametrize("mi", range(len(SPECS)))
def test_bsdf_invert_roundtrip(mi):
    ctx = _ctx_for(SPECS)
    n = 2048
    rng = np.random.default_rng(17 + mi)
    wi = rng.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wi[..., 2] = np.abs(wi[..., 2]) + 1e-3
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wi = jnp.asarray(wi)
    u2 = jnp.asarray(rng.random((n, 2), np.float32))
    u1 = jnp.asarray(rng.random((n,), np.float32))
    mat_id = jnp.full((n,), mi, jnp.int32)
    uv = jnp.zeros((n, 2))

    bs = bsdf_sample(ctx, mat_id, uv, wi, u2, u1)
    mu = tuple(float(x) for x in rng.random(3))
    iu2, iu1, ok = bsdf_invert(ctx, mat_id, uv, wi, bs.wo, mu=mu)
    valid = np.asarray(bs.valid)
    ok = np.asarray(ok) & valid
    # invertibility among VALID samples (the sampler itself rejects
    # below-horizon microfacet directions; those never enter a path)
    assert ok[valid].mean() > 0.95, (
        f"{SPECS[mi]['type']}: only {ok[valid].mean():.2f} of valid "
        "samples invertible"
    )

    bs2 = bsdf_sample(ctx, mat_id, uv, wi, iu2, iu1)
    dots = np.asarray(jnp.sum(bs2.wo * bs.wo, axis=-1))
    bad = ok & (dots < 1.0 - 1e-4)
    # NOTE: the reproduced sample may land in a DIFFERENT lobe of a
    # multi-lobe bsdf (the branch is re-randomized by the mu posterior,
    # untrackedBoolean in the reference) — only the direction must match.
    assert bad.mean() < 0.01, (
        f"{SPECS[mi]['type']}: {bad.mean():.3f} of inverted samples diverge "
        f"(min dot {dots[ok].min():.6f})"
    )


def test_invert_warp_roundtrips():
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random((4096, 2), np.float32))
    for fwd, inv in [
        (warps.cosine_hemisphere, warps.invert_cosine_hemisphere),
        (warps.uniform_hemisphere, warps.invert_uniform_hemisphere),
        (warps.uniform_sphere, warps.invert_uniform_sphere),
    ]:
        w = fwd(u)
        w2 = fwd(inv(w))
        assert float(jnp.abs(w2 - w).max()) < 1e-4, fwd.__name__
    bary = warps.uniform_triangle_uv(u)
    b2 = warps.uniform_triangle_uv(warps.invert_uniform_triangle_uv(bary))
    assert float(jnp.abs(b2 - bary).max()) < 1e-4
