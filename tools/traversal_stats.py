#!/usr/bin/env python
"""Host-side traversal statistics: per-ray node visits vs tile-union visits
for the bench scene BVH, for coherent (camera) and incoherent rays.
Informs the kernel design: packet lockstep cost ~ union, per-lane cost ~ max,
ideal ordered cost ~ mean with near-first pruning."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

from tungsten_tpu.scene.load import load_scene
from tungsten_tpu.scene.flatten import flatten_scene

doc = load_scene("/root/reference/data/materialtest/materialtest.json")
doc.camera["resolution"] = [250, 141]
scene = flatten_scene(doc)

from tungsten_tpu.accel.bvh import build_bvh_cached

v0 = np.asarray(scene.tris.v0); e1 = np.asarray(scene.tris.e1); e2 = np.asarray(scene.tris.e2)
p1, p2 = v0 + e1, v0 + e2
lo = np.minimum(np.minimum(v0, p1), p2); hi = np.maximum(np.maximum(v0, p1), p2)

for leaf in (128, 16, 8):
    bvh = build_bvh_cached(lo, hi, leaf_size=leaf)
    m = len(bvh.count)
    n_leaves = int((bvh.count > 0).sum())
    print(f"leaf={leaf}: nodes={m} leaves={n_leaves} "
          f"avg tris/leaf={len(v0)/n_leaves:.1f}")

bvh = build_bvh_cached(lo, hi, leaf_size=128)
m = len(bvh.count)
nmin, nmax, skip, count = bvh.node_min, bvh.node_max, bvh.skip, bvh.count

# left child = i+1, right child = skip of left (preorder)
left = np.arange(m) + 1
right = np.where(count == 0, skip[np.minimum(left, m - 1)], -1)

def gen_rays(kind, n):
    rng = np.random.default_rng(1)
    if kind == "camera":
        import jax.numpy as jnp
        from tungsten_tpu.models.cameras import camera_rays
        from tungsten_tpu.sampling import Sampler
        import jax
        meta = scene.meta
        px = np.tile(np.arange(meta.res_x, dtype=np.int32), meta.res_y)[:n]
        py = np.repeat(np.arange(meta.res_y, dtype=np.int32), meta.res_x)[:n]
        smp = Sampler.create(jnp.array([1, 0], jnp.uint32), jnp.arange(n, dtype=jnp.uint32))
        u_cam, smp = smp.next_2d()
        u_lens, smp = smp.next_2d()
        o, d = camera_rays(scene.camera, meta, jnp.asarray(px), jnp.asarray(py), u_cam, u_lens)
        return np.asarray(o), np.asarray(d)
    o = rng.uniform(nmin[0], nmax[0], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d

def simulate(o, d, ordered):
    """Vectorized per-ray traversal. ordered=True: stack-based near-child-first
    with best-t pruning (upper bound estimate: prune by box tmin >= best leaf-box tmax
    as a proxy; we don't intersect triangles, we use leaf box hit as 't candidate').
    Returns per-ray visit counts and visited-node sets (as bool matrix)."""
    n = len(o)
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    visits = np.zeros(n, np.int64)
    visited = np.zeros((n, m), bool)

    def box_t(i_nodes, oi, invi):
        t0 = (nmin[i_nodes] - oi) * invi
        t1 = (nmax[i_nodes] - oi) * invi
        tmin = np.minimum(t0, t1).max(-1)
        tmax = np.maximum(t0, t1).min(-1)
        return tmin, tmax

    for r in range(n):
        oi, invi = o[r], inv[r]
        best = np.inf
        if not ordered:
            ptr = 0
            while ptr < m:
                visits[r] += 1
                visited[r, ptr] = True
                tmin, tmax = box_t(np.array([ptr]), oi, invi)
                hit = (tmin[0] <= tmax[0]) and (tmax[0] > 1e-4) and (tmin[0] < best)
                if hit and count[ptr] > 0:
                    best = min(best, max(tmin[0], 0.0) + 1e-3)  # proxy hit
                    ptr = skip[ptr]
                elif hit:
                    ptr += 1
                else:
                    ptr = skip[ptr]
        else:
            stack = [0]
            while stack:
                ptr = stack.pop()
                visits[r] += 1
                visited[r, ptr] = True
                tmin, tmax = box_t(np.array([ptr]), oi, invi)
                if not ((tmin[0] <= tmax[0]) and (tmax[0] > 1e-4) and (tmin[0] < best)):
                    continue
                if count[ptr] > 0:
                    best = min(best, max(tmin[0], 0.0) + 1e-3)
                    continue
                l, rr = left[ptr], right[ptr]
                tl, _ = box_t(np.array([l]), oi, invi)
                tr, _ = box_t(np.array([rr]), oi, invi)
                if tl[0] <= tr[0]:
                    stack.append(rr); stack.append(l)
                else:
                    stack.append(l); stack.append(rr)
    return visits, visited

TILE = 512
for kind in ("camera", "random"):
    o, d = gen_rays(kind, TILE)
    for ordered in (False, True):
        visits, visited = simulate(o, d, ordered)
        union = visited.any(0).sum()
        print(f"{kind:7s} ordered={ordered}: per-ray visits mean={visits.mean():7.1f} "
              f"p50={np.percentile(visits,50):6.0f} max={visits.max():5d}  "
              f"tile-union={union:5d} / {m}")
