"""Per-lane gather BVH traversal (ops.gather_bvh) vs brute force.

Covers the gen-5 production intersector: closest-hit prim/t/uv agreement,
any-hit latch consistency, finite tfar, and degenerate scenes (single leaf).
"""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.ops.intersect import TriangleSoA, intersect_brute, INF
from tungsten_tpu.ops.gather_bvh import (
    build_gather_pack,
    intersect_bvh_gather,
    occluded_bvh_gather,
)


def random_scene(rng, n_tris=200, spread=2.0):
    base = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n_tris, 3)).astype(np.float32)
    return base, e1, e2


def random_rays(rng, n=2048, spread=4.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check_match(v0, e1, e2, o, d, tnear, tfar):
    tris = TriangleSoA(v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2))
    pack = build_gather_pack(v0, e1, e2)
    hb = intersect_brute(tris, o, d, tnear, tfar)
    hg = intersect_bvh_gather(pack, o, d, tnear, tfar)
    hit_b = np.asarray(hb.prim >= 0)
    hit_g = np.asarray(hg.prim >= 0)
    np.testing.assert_array_equal(hit_b, hit_g)
    both = hit_b & hit_g
    np.testing.assert_allclose(
        np.asarray(hg.t)[both], np.asarray(hb.t)[both], rtol=1e-4, atol=1e-5
    )
    # same closest prim except exact-tie cases
    same = np.asarray(hg.prim)[both] == np.asarray(hb.prim)[both]
    assert same.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(hg.u)[both][same],
        np.asarray(hb.u)[both][same],
        rtol=1e-3,
        atol=1e-4,
    )
    # any-hit agrees with closest-hit's hit mask
    occ = np.asarray(occluded_bvh_gather(pack, o, d, tnear, tfar))
    np.testing.assert_array_equal(occ, hit_b)


def test_gather_matches_bruteforce(rng):
    v0, e1, e2 = random_scene(rng, 700)
    o, d = random_rays(rng, 4096)
    n = o.shape[0]
    _check_match(v0, e1, e2, o, d, jnp.full((n,), 1e-4), jnp.full((n,), INF))


def test_gather_finite_tfar(rng):
    v0, e1, e2 = random_scene(rng, 300)
    o, d = random_rays(rng, 2048)
    n = o.shape[0]
    tfar = jnp.asarray(rng.uniform(0.5, 6.0, (n,)).astype(np.float32))
    _check_match(v0, e1, e2, o, d, jnp.full((n,), 1e-4), tfar)


def test_gather_single_leaf(rng):
    v0, e1, e2 = random_scene(rng, 5)
    o, d = random_rays(rng, 512)
    n = o.shape[0]
    _check_match(v0, e1, e2, o, d, jnp.full((n,), 1e-4), jnp.full((n,), INF))


def test_gather_compaction_phases(rng):
    """N >= 2*MIN_PHASE takes the 3-phase compacting driver: straggler
    lanes restart from the root in smaller buffers. Must be bit-identical
    in hit/prim to the brute force reference."""
    v0, e1, e2 = random_scene(rng, 900)
    o, d = random_rays(rng, 16384)
    n = o.shape[0]
    _check_match(v0, e1, e2, o, d, jnp.full((n,), 1e-4), jnp.full((n,), INF))


def test_gather_disabled_rays(rng):
    v0, e1, e2 = random_scene(rng, 100)
    o, d = random_rays(rng, 256)
    n = o.shape[0]
    pack = build_gather_pack(v0, e1, e2)
    # tfar <= tnear disables the lane: must report miss
    h = intersect_bvh_gather(
        pack, o, d, jnp.full((n,), 1e-4), jnp.zeros((n,))
    )
    assert np.all(np.asarray(h.prim) == -1)
    assert np.all(np.asarray(h.t) == np.float32(INF))
