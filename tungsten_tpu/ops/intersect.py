"""Device-side ray-scene intersection.

Replaces embree's rtcIntersect/rtcOccluded (SURVEY.md §2.3, L4). Two paths:

 - `intersect_brute`: tiled all-pairs Möller-Trumbore, scanned over triangle
   chunks. O(N*T) but fully dense VPU work — for small scenes (< a few K tris)
   this *beats* any divergent traversal on TPU.
 - `intersect_bvh`: lockstep skip-pointer traversal of the flat BVH from
   accel/bvh.py. Per-lane state is one int32 node cursor; each step gathers
   one node's AABB + up to LEAF_SIZE triangle bundles (cf. the reference's
   SIMD Triangle4 SoA pattern, src/core/primitives/Triangle4.hpp:13-54).

Both return a Hit pytree. The geometry arrays come pre-permuted in BVH leaf
order; hit.prim is the *global* triangle index after permutation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree

from ..math import vecops as vo

INF = jnp.float32(3.0e38)


@pytree
class TriangleSoA:
    v0: jnp.ndarray  # (T, 3)
    e1: jnp.ndarray  # (T, 3)  p1 - p0
    e2: jnp.ndarray  # (T, 3)  p2 - p0


@pytree
class BvhSoA:
    node_min: jnp.ndarray  # (M, 3)
    node_max: jnp.ndarray  # (M, 3)
    first: jnp.ndarray  # (M,)
    count: jnp.ndarray  # (M,)  0 = inner node
    skip: jnp.ndarray  # (M,)
    # packed mirrors for single-gather traversal: ints stored as exact f32
    # (all indices < 2^24). nodes: [min3 | max3 | first | count | skip]
    nodes_packed: jnp.ndarray = None  # (M, 9) f32
    tris_packed: jnp.ndarray = None  # (T, 9) f32 [v0 | e1 | e2]


def pack_bvh(bvh: "BvhSoA", tris: TriangleSoA) -> "BvhSoA":
    nodes = jnp.concatenate(
        [
            bvh.node_min,
            bvh.node_max,
            bvh.first.astype(jnp.float32)[:, None],
            bvh.count.astype(jnp.float32)[:, None],
            bvh.skip.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    tp = jnp.concatenate([tris.v0, tris.e1, tris.e2], axis=1)
    return BvhSoA(
        node_min=bvh.node_min,
        node_max=bvh.node_max,
        first=bvh.first,
        count=bvh.count,
        skip=bvh.skip,
        nodes_packed=nodes,
        tris_packed=tp,
    )


@pytree
class Hit:
    t: jnp.ndarray  # (N,) hit distance (INF if miss)
    prim: jnp.ndarray  # (N,) int32 triangle index, -1 if miss
    u: jnp.ndarray  # (N,) barycentric of e1 vertex
    v: jnp.ndarray  # (N,) barycentric of e2 vertex

    @property
    def hit_mask(self):
        return self.prim >= 0


def ray_tri(o, d, v0, e1, e2, tnear, tfar):
    """Möller-Trumbore. All args broadcastable to (..., 3) / (...,).
    Returns (t, u, v, hit)."""
    pvec = jnp.cross(d, e2)
    det = vo.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = vo.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = vo.dot(d, qvec) * inv_det
    t = vo.dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tnear)
        & (t < tfar)
    )
    return t, u, v, hit


def intersect_brute(tris: TriangleSoA, o, d, tnear, tfar, chunk: int = 512) -> Hit:
    """Chunked all-pairs intersection: scan over triangle chunks keeping the
    nearest hit. Memory is O(N * chunk)."""
    n = o.shape[0]
    t_count = tris.v0.shape[0]
    chunk = min(chunk, -(-t_count // 8) * 8)  # don't pad tiny scenes to 512
    pad = (-t_count) % chunk
    v0 = jnp.pad(tris.v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(tris.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(tris.e2, ((0, pad), (0, 0)), constant_values=0.0)
    n_chunks = (t_count + pad) // chunk

    def body(carry, ci):
        bt, bp, bu, bv = carry
        s = ci * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, s, chunk, 0)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, s, chunk, 0)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, s, chunk, 0)
        t, u, v, hit = ray_tri(
            o[:, None, :], d[:, None, :], cv0[None], ce1[None], ce2[None],
            tnear[:, None], tfar[:, None],
        )
        t = jnp.where(hit, t, INF)
        j = jnp.argmin(t, axis=1)
        tbest = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
        better = tbest < bt
        idx = s + j
        bt = jnp.where(better, tbest, bt)
        bp = jnp.where(better, idx, bp)
        bu = jnp.where(better, jnp.take_along_axis(u, j[:, None], 1)[:, 0], bu)
        bv = jnp.where(better, jnp.take_along_axis(v, j[:, None], 1)[:, 0], bv)
        return (bt, bp, bu, bv), None

    init = (
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    (bt, bp, bu, bv), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    bp = jnp.where(bt < INF, bp, -1)
    return Hit(t=bt, prim=bp, u=bu, v=bv)


def _slab_test(o, inv_d, bmin, bmax, tnear, tfar):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tmin <= tmax) & (tmax > tnear) & (tmin < tfar)


def intersect_bvh(
    bvh: BvhSoA, tris: TriangleSoA, o, d, tnear, tfar, leaf_size: int = 4,
    any_hit: bool = False, inner_steps: int = 8,
) -> Hit:
    """Lockstep skip-pointer traversal, two-phase form.

    Per outer while iteration: `inner_steps` cheap node-advance steps (one
    packed (N, 9) gather + slab test each; lanes arriving at a hit leaf
    *stall*), then one bundled leaf phase (a single (N, L, 9) triangle gather
    + L masked Möller-Trumbore tests for stalled lanes). This pays triangle
    work per leaf *visit* instead of per traversal step, and collapses the
    ~15 scattered per-step gathers of the naive loop into 2 — the dominant
    cost on TPU where each gather is a real kernel.

    any_hit=True: shadow-ray mode — lanes stop at the first accepted hit
    (farT clamps still apply), returning some hit, not the nearest.
    """
    if bvh.nodes_packed is not None:
        return _intersect_bvh_packed(bvh, o, d, tnear, tfar, leaf_size, any_hit, inner_steps)
    n = o.shape[0]
    n_nodes = bvh.node_min.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-30, d)

    def cond(state):
        node = state[0]
        return jnp.any(node < n_nodes)

    def body(state):
        node, bt, bp, bu, bv = state
        active = node < n_nodes
        ni = jnp.clip(node, 0, n_nodes - 1)
        bmin = bvh.node_min[ni]
        bmax = bvh.node_max[ni]
        cnt = bvh.count[ni]
        first = bvh.first[ni]
        box_hit = _slab_test(o, inv_d, bmin, bmax, tnear, jnp.minimum(tfar, bt)) & active
        is_leaf = cnt > 0

        # leaf intersection: fixed-width bundle with count masking
        do_leaf = box_hit & is_leaf
        for j in range(leaf_size):
            ti = jnp.clip(first + j, 0, tris.v0.shape[0] - 1)
            t, u, v, hit = ray_tri(o, d, tris.v0[ti], tris.e1[ti], tris.e2[ti], tnear, jnp.minimum(tfar, bt))
            hit = hit & do_leaf & (j < cnt)
            better = hit & (t < bt)
            bt = jnp.where(better, t, bt)
            bp = jnp.where(better, ti, bp)
            bu = jnp.where(better, u, bu)
            bv = jnp.where(better, v, bv)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, bvh.skip[ni])
        if any_hit:
            nxt = jnp.where(bp >= 0, n_nodes, nxt)
        node = jnp.where(active, nxt, node)
        return node, bt, bp, bu, bv

    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.minimum(tfar, INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    node, bt, bp, bu, bv = jax.lax.while_loop(cond, body, init)
    bt = jnp.where(bp >= 0, bt, INF)
    return Hit(t=bt, prim=bp, u=bu, v=bv)


def _intersect_bvh_packed(
    bvh: BvhSoA, o, d, tnear, tfar, leaf_size: int, any_hit: bool, inner_steps: int
) -> Hit:
    n = o.shape[0]
    nodes = bvh.nodes_packed
    tris = bvh.tris_packed
    n_nodes = nodes.shape[0]
    n_tris = tris.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    end = jnp.int32(n_nodes)

    def node_step(node, bt):
        """One masked advance; returns (new_node, stalled_at_leaf)."""
        active = node < end
        row = nodes[jnp.clip(node, 0, n_nodes - 1)]
        box_hit = _slab_test(o, inv_d, row[:, 0:3], row[:, 3:6], tnear, jnp.minimum(tfar, bt)) & active
        is_leaf = row[:, 7] > 0.5
        stall = box_hit & is_leaf
        skip = row[:, 8].astype(jnp.int32)
        nxt = jnp.where(box_hit & ~is_leaf, node + 1, skip)
        return jnp.where(active & ~stall, nxt, node), stall

    def cond(state):
        return jnp.any(state[0] < end)

    def body(state):
        node, bt, bp, bu, bv = state

        def inner(_, carry):
            node, stalled = carry
            nn, stall = node_step(node, bt)
            # once stalled, hold position until the leaf phase
            return jnp.where(stalled, node, nn), stalled | stall

        node, stalled = jax.lax.fori_loop(
            0, inner_steps, inner, (node, jnp.zeros((n,), bool))
        )

        # leaf phase: bundled gather + masked MT over the leaf's triangles
        row = nodes[jnp.clip(node, 0, n_nodes - 1)]
        first = row[:, 6].astype(jnp.int32)
        cnt = row[:, 7].astype(jnp.int32)
        at_leaf = stalled
        idx = jnp.clip(first[:, None] + jnp.arange(leaf_size)[None, :], 0, n_tris - 1)
        trows = tris[idx]  # (N, L, 9)
        t, u, v, hit = ray_tri(
            o[:, None, :],
            d[:, None, :],
            trows[..., 0:3],
            trows[..., 3:6],
            trows[..., 6:9],
            tnear[:, None],
            jnp.minimum(tfar, bt)[:, None],
        )
        lane_mask = at_leaf[:, None] & (jnp.arange(leaf_size)[None, :] < cnt[:, None])
        t = jnp.where(hit & lane_mask, t, INF)
        j = jnp.argmin(t, axis=1)
        tbest = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
        better = tbest < bt
        bt = jnp.where(better, tbest, bt)
        bp = jnp.where(better, jnp.take_along_axis(idx, j[:, None], 1)[:, 0], bp)
        bu = jnp.where(better, jnp.take_along_axis(u, j[:, None], 1)[:, 0], bu)
        bv = jnp.where(better, jnp.take_along_axis(v, j[:, None], 1)[:, 0], bv)

        skip = row[:, 8].astype(jnp.int32)
        node = jnp.where(at_leaf, skip, node)
        if any_hit:
            node = jnp.where(bp >= 0, end, node)
        return node, bt, bp, bu, bv

    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.minimum(tfar, INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    node, bt, bp, bu, bv = jax.lax.while_loop(cond, body, init)
    bt = jnp.where(bp >= 0, bt, INF)
    return Hit(t=bt, prim=bp, u=bu, v=bv)
