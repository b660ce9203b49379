import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.accel.bvh import build_bvh
from tungsten_tpu.ops.intersect import (
    TriangleSoA,
    BvhSoA,
    intersect_brute,
    intersect_bvh,
    pack_bvh,
    INF,
)


def random_scene(rng, n_tris=200, spread=2.0):
    base = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n_tris, 3)).astype(np.float32)
    return base, e1, e2


def make_bvh(v0, e1, e2):
    p1, p2 = v0 + e1, v0 + e2
    bmin = np.minimum(np.minimum(v0, p1), p2)
    bmax = np.maximum(np.maximum(v0, p1), p2)
    bvh = build_bvh(bmin, bmax)
    perm = bvh.prim_order
    tris = TriangleSoA(
        v0=jnp.asarray(v0[perm]), e1=jnp.asarray(e1[perm]), e2=jnp.asarray(e2[perm])
    )
    soa = pack_bvh(
        BvhSoA(
            node_min=jnp.asarray(bvh.node_min),
            node_max=jnp.asarray(bvh.node_max),
            first=jnp.asarray(bvh.first),
            count=jnp.asarray(bvh.count),
            skip=jnp.asarray(bvh.skip),
        ),
        tris,
    )
    return tris, soa, perm


def test_bvh_matches_bruteforce(rng):
    v0, e1, e2 = random_scene(rng, 300)
    tris, soa, _ = make_bvh(v0, e1, e2)

    n = 2048
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tnear = jnp.full((n,), 1e-4)
    tfar = jnp.full((n,), INF)

    hb = intersect_brute(tris, o, d, tnear, tfar)
    hv = intersect_bvh(soa, tris, o, d, tnear, tfar)

    hit_b, hit_v = np.asarray(hb.prim >= 0), np.asarray(hv.prim >= 0)
    np.testing.assert_array_equal(hit_b, hit_v)
    tb, tv = np.asarray(hb.t), np.asarray(hv.t)
    np.testing.assert_allclose(tb[hit_b], tv[hit_b], rtol=1e-4)
    # same triangle except exact-tie cases
    same = np.asarray(hb.prim) == np.asarray(hv.prim)
    assert same[hit_b].mean() > 0.999


def test_bvh_respects_tfar_and_tnear(rng):
    v0, e1, e2 = random_scene(rng, 100)
    tris, soa, _ = make_bvh(v0, e1, e2)
    n = 512
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    full = intersect_bvh(soa, tris, o, d, jnp.full((n,), 1e-4), jnp.full((n,), INF))
    t = np.asarray(full.t)
    hit = t < 1e30
    # shorten rays to just before their hit: must all miss
    tfar_short = jnp.asarray(np.where(hit, t * 0.99, 1e30))
    short = intersect_bvh(soa, tris, o, d, jnp.full((n,), 1e-4), tfar_short)
    assert not np.asarray(short.prim >= 0)[hit].any()
    # tnear past the hit: the first hit must be excluded
    tnear_past = jnp.asarray(np.where(hit, t * 1.01, 1e-4))
    past = intersect_bvh(soa, tris, o, d, tnear_past, jnp.full((n,), INF))
    changed = np.asarray(past.prim) != np.asarray(full.prim)
    assert changed[hit].all()


def test_any_hit_mode(rng):
    v0, e1, e2 = random_scene(rng, 100)
    tris, soa, _ = make_bvh(v0, e1, e2)
    n = 512
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    nearest = intersect_bvh(soa, tris, o, d, jnp.full((n,), 1e-4), jnp.full((n,), INF))
    anyh = intersect_bvh(soa, tris, o, d, jnp.full((n,), 1e-4), jnp.full((n,), INF), any_hit=True)
    np.testing.assert_array_equal(np.asarray(nearest.prim >= 0), np.asarray(anyh.prim >= 0))


def test_native_bvh_matches_bruteforce(rng):
    from tungsten_tpu.accel.bvh import build_bvh_native

    v0, e1, e2 = random_scene(rng, 500)
    p1, p2 = v0 + e1, v0 + e2
    bmin = np.minimum(np.minimum(v0, p1), p2)
    bmax = np.maximum(np.maximum(v0, p1), p2)
    bvh = build_bvh_native(bmin, bmax)
    if bvh is None:
        pytest.skip("native builder not built (no toolchain?); conftest "
                    "auto-builds it when make/g++ are present")
    perm = bvh.prim_order
    tris = TriangleSoA(
        v0=jnp.asarray(v0[perm]), e1=jnp.asarray(e1[perm]), e2=jnp.asarray(e2[perm])
    )
    soa = pack_bvh(
        BvhSoA(
            node_min=jnp.asarray(bvh.node_min),
            node_max=jnp.asarray(bvh.node_max),
            first=jnp.asarray(bvh.first),
            count=jnp.asarray(bvh.count),
            skip=jnp.asarray(bvh.skip),
        ),
        tris,
    )
    n = 2048
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tnear = jnp.full((n,), 1e-4)
    tfar = jnp.full((n,), INF)
    hb = intersect_brute(tris, o, d, tnear, tfar)
    hv = intersect_bvh(soa, tris, o, d, tnear, tfar)
    np.testing.assert_array_equal(np.asarray(hb.prim >= 0), np.asarray(hv.prim >= 0))
    m = np.asarray(hb.prim >= 0)
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-4)
