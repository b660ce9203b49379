"""Hair BCSDF (models/bsdfs/hair.py vs HairBcsdf.cpp semantics): pdf
normalization, sample/pdf consistency, and bounded energy."""
import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.models.bsdfs import hair
from tungsten_tpu.models.bsdfs.dispatch import MaterialTable, N_PARAMS


def _hair_ctx(sigma=(0.1, 0.2, 0.3), roughness=0.25, scale_deg=2.0):
    beta_r = max(np.pi / 2 * roughness, 0.04)
    tab, cdf, sums = hair.precompute_azimuthal(np.asarray(sigma), beta_r)
    params = np.zeros((1, N_PARAMS), np.float32)
    params[0, 0] = np.deg2rad(scale_deg)
    params[0, 1] = beta_r
    params[0, 2] = 0.0
    mats = MaterialTable(
        type=jnp.zeros(1, jnp.int32),
        lobes=jnp.zeros(1, jnp.int32),
        params=jnp.asarray(params),
        albedo_tex=jnp.zeros(1, jnp.int32),
        hair_tables=jnp.asarray(tab[None]),
        hair_cdf=jnp.asarray(cdf[None]),
        hair_sums=jnp.asarray(sums[None]),
    )
    return (mats, None), jnp.asarray(params)


def _dirs(n, rng):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))


def test_hair_pdf_normalizes():
    """MC integral of pdf over the sphere must be ~1 for a fixed wi."""
    ctx, params = _hair_ctx()
    rng = np.random.default_rng(3)
    n = 200_000
    wi = jnp.broadcast_to(jnp.asarray([0.3, 0.4, np.sqrt(1 - 0.09 - 0.16)]), (n, 3))
    wo = _dirs(n, rng)
    pr = np.broadcast_to(np.asarray(params), (n, params.shape[-1]))
    p = np.asarray(hair.pdf(ctx, jnp.asarray(pr), None, None, wi, wo))
    assert np.all(np.isfinite(p)) and np.all(p >= 0)
    integral = p.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_hair_sample_matches_pdf_and_eval():
    """sample() must report pdf consistent with pdf(), weight = eval/pdf."""
    ctx, params = _hair_ctx()
    rng = np.random.default_rng(4)
    n = 4096
    wi = _dirs(n, rng)
    pr = jnp.broadcast_to(params, (n, params.shape[-1]))
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    bs = hair.sample(ctx, pr, None, None, wi, u2, u1)
    ok = np.asarray(bs.valid)
    assert ok.mean() > 0.95
    p_check = np.asarray(hair.pdf(ctx, pr, None, None, wi, bs.wo))
    np.testing.assert_allclose(
        np.asarray(bs.pdf)[ok], p_check[ok], rtol=1e-4
    )
    f = np.asarray(hair.eval(ctx, pr, None, None, wi, bs.wo))
    w = np.asarray(bs.weight)
    np.testing.assert_allclose(
        w[ok], (f / np.maximum(p_check[:, None], 1e-20))[ok], rtol=1e-3, atol=1e-5
    )
    # wo must be unit
    assert np.allclose(np.linalg.norm(np.asarray(bs.wo), axis=1)[ok], 1.0, atol=1e-4)


def test_hair_energy_bounded():
    """With zero absorption the R+TT+TRT sum scatters at most all incident
    energy: MC integral of eval over the sphere <= ~1 (the three-lobe model
    drops higher-order paths, so < 1)."""
    ctx, params = _hair_ctx(sigma=(0.0, 0.0, 0.0))
    rng = np.random.default_rng(5)
    n = 200_000
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.2, np.sqrt(0.96)]), (n, 3))
    wo = _dirs(n, rng)
    pr = jnp.broadcast_to(params, (n, params.shape[-1]))
    f = np.asarray(hair.eval(ctx, pr, None, None, wi, wo))
    integral = f.mean(0) * 4.0 * np.pi
    assert np.all(integral < 1.05), integral
    assert np.all(integral > 0.3), integral  # and not degenerate


def test_hair_absorption_darkens():
    ctx0, params = _hair_ctx(sigma=(0.0, 0.0, 0.0))
    ctx1, _ = _hair_ctx(sigma=(2.0, 2.0, 2.0))
    rng = np.random.default_rng(6)
    n = 50_000
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.1, np.sqrt(0.99)]), (n, 3))
    wo = _dirs(n, rng)
    pr = jnp.broadcast_to(params, (n, params.shape[-1]))
    f0 = np.asarray(hair.eval(ctx0, pr, None, None, wi, wo)).mean()
    f1 = np.asarray(hair.eval(ctx1, pr, None, None, wi, wo)).mean()
    assert f1 < f0 * 0.8
