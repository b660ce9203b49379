#!/usr/bin/env python
"""Feasibility numbers for a binned two-level traversal: cut the BVH into
~K treelets, count (ray, treelet) pairs and triangle tests for coherent and
incoherent rays with/without closest-hit pruning. If pairs/ray stays small
(<8) and tri tests/ray stays ~1-3k, a sort-by-treelet + dense-MXU-sweep
kernel replaces the scalar per-node traversal loop for incoherent bounces.

Usage: python tools/treelet_stats.py [n_rays] [cut_tris...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

from tungsten_tpu.scene.load import load_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.accel.bvh import build_bvh_cached

N_RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
CUTS = [int(a) for a in sys.argv[2:]] or [64, 128, 256]

doc = load_scene("/root/reference/data/materialtest/materialtest.json")
doc.camera["resolution"] = [250, 141]
scene = flatten_scene(doc)
v0 = np.asarray(scene.tris.v0)
e1 = np.asarray(scene.tris.e1)
e2 = np.asarray(scene.tris.e2)
p1, p2 = v0 + e1, v0 + e2
lo = np.minimum(np.minimum(v0, p1), p2)
hi = np.maximum(np.maximum(v0, p1), p2)
bvh = build_bvh_cached(lo, hi, leaf_size=8)
m = len(bvh.count)
nmin, nmax, skip, count = (
    np.asarray(bvh.node_min),
    np.asarray(bvh.node_max),
    np.asarray(bvh.skip),
    np.asarray(bvh.count),
)

# subtree triangle counts from the preorder span [i, skip[i])
leaf_tris = np.where(count > 0, count, 0)
csum = np.concatenate([[0], np.cumsum(leaf_tris)])
span_end = np.where(skip > 0, skip, m)
sub_tris = csum[span_end] - csum[np.arange(m)]

rng = np.random.default_rng(7)
ctr = 0.5 * (lo + hi)
scene_lo, scene_hi = nmin[0], nmax[0]


def gen_incoherent(n):
    # bounce-like: origins on random triangle surfaces, cosine-ish directions
    ti = rng.integers(0, len(v0), n)
    u = rng.random((n, 2))
    su = np.sqrt(u[:, 0:1])
    o = v0[ti] + e1[ti] * (su * (1 - u[:, 1:2])) + e2[ti] * (su * u[:, 1:2])
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o + d * 1e-3, d


def closest_t(o, d, chunk=256):
    ts = np.full(len(o), np.inf, np.float32)
    for i in range(0, len(o), chunk):
        oo, dd = o[i : i + chunk], d[i : i + chunk]
        pv = np.cross(dd[:, None], e2[None])
        det = np.einsum("rtk,tk->rt", pv, e1)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, np.inf, det)
        tv = oo[:, None] - v0[None]
        uu = np.einsum("rtk,rtk->rt", tv, pv) * inv
        qv = np.cross(tv, e1[None])
        vv = np.einsum("rtk,rk->rt", qv, dd) * inv
        tt = np.einsum("rtk,tk->rt", qv, e2) * inv
        ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-4)
        tt = np.where(ok, tt, np.inf)
        ts[i : i + chunk] = tt.min(1)
    return ts


o, d = gen_incoherent(N_RAYS)
t_hit = closest_t(o, d)
print(f"rays={N_RAYS} tris={len(v0)} hit_rate={(np.isfinite(t_hit)).mean():.2f}")

for cut_tris in CUTS:
    # cut: smallest subtrees with sub_tris <= cut whose parent exceeds it.
    # walk preorder with an explicit "inside-cut" skip
    cut_nodes = []
    i = 0
    while i < m:
        if sub_tris[i] <= cut_tris or count[i] > 0:
            cut_nodes.append(i)
            i = span_end[i]
        else:
            i += 1
    cut_nodes = np.array(cut_nodes)
    k = len(cut_nodes)
    tpt = sub_tris[cut_nodes]

    bmin, bmax = nmin[cut_nodes], nmax[cut_nodes]  # (k, 3)
    invd = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0 = (bmin[None] - o[:, None]) * invd[:, None]
    t1 = (bmax[None] - o[:, None]) * invd[:, None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit_inf = (tn <= tf) & (tf > 1e-4)
    hit_prune = hit_inf & (tn < t_hit[:, None])

    for name, hits in (("no-prune", hit_inf), ("pruned", hit_prune)):
        pairs = hits.sum(1)
        tritests = (hits * tpt[None]).sum(1)
        print(
            f"cut<={cut_tris:4d}: k={k:5d} avg tris/treelet={tpt.mean():6.1f} "
            f"[{name}] pairs/ray mean={pairs.mean():6.2f} p95={np.percentile(pairs,95):5.0f} "
            f"tritests/ray mean={tritests.mean():7.0f} p95={np.percentile(tritests,95):7.0f}"
        )
