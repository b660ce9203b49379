"""Pallas TPU kernel: 8-wide BVH traversal with children on sublanes.

Fourth-generation intersector (after ops.pallas_bvh / ops.pallas_bvh2),
built from on-chip profiling of the binary ordered walk: per traversal
iteration the vector cost was ~0.76 us because every box test ran on a
(1, RT) register row — one sublane of an (8, 128) vreg, wasting 7/8 of
the VPU. This kernel fills the sublane dimension with *BVH children*:

  * The binary SAH tree (accel/bvh.py) is collapsed host-side into
    8-ary nodes (3 binary levels, greedy largest-area expansion — the
    embree BVH8 recipe, thirdparty/embree kernels).
  * One node visit = ONE (8, RT) slab test covering all 8 children:
    child boxes live in VMEM as an aligned (8, 8) block per node,
    broadcast against the (1, RT) ray rows. Per-child cost drops 8x.
  * The 8 hit flags reach the scalar core as a single packed bitmask:
    per-row any via a lane max -> (8, 1), dot with 2^row weights ->
    one f32 reduce, one scalar read.
  * Traversal order is precomputed per node for each of the 8 ray
    octants (children sorted by center along the octant direction) and
    packed 3 bits/slot into an SMEM table; hits are pushed far-to-near
    onto a per-walk SMEM stack so the nearest child pops first.
    Combined with per-lane best-t pruning (box test against
    min(tfar, best)), far subtrees die wholesale — the
    embree/BinaryBvh.hpp:198 ordered-traversal semantics.
  * Leaves are Woop plane-form triangle blocks evaluated by two MXU
    dot_generals exactly as in ops.pallas_bvh2 (shared _leaf_tuv).
  * `walks` independent ray tiles interleave in one program so the
    vector->scalar latency of one walk hides behind another's work.

Scene arrays must be jit arguments (closure-captured constants re-stage
their pallas windows every grid step, ~200 us/step on this runtime).

MEASUREMENT WARNING for this tunneled runtime: before the first
device-to-host transfer of a process, jax.block_until_ready returns
without actually waiting (an 8192^3 matmul "completes" in 0.05 ms), so
microbenchmarks in fresh processes measure async enqueue, not execution.
After the first D2H every host dispatch pays a ~25 ms round trip. Valid
timings therefore require (a) one D2H up front and (b) chaining K
executions inside one jit via fori_loop, reporting (total - 25 ms)/K.
Measured this way on materialtest (80k tris, 141k rays): closest-hit
~33 ms coherent / ~340 ms incoherent; the any-hit walk (pallas_bvh2)
~1.3 ms. Leaf evals (6-pass f32 MXU latency) are ~60% of closest-hit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flax.struct import dataclass as pytree, field

from .intersect import Hit, INF
from .pallas_bvh2 import (
    _DOT_T,
    _INF,
    _leaf_tuv,
    _pack_rays,
    _recompute_uv,
    _woop_planes,
)


def _leaf_tuv_bf16x3(ph_ref, plo_ref, leaf_blk, ro8, rd8, leaf):
    """Plane-form leaf eval with a MANUAL 3-pass bf16 product (the bf16x3
    trick XLA uses for Precision.HIGH, which Mosaic does not expose):
    both the plane table and the ray matrices are split into bf16 hi+lo
    halves and a @ b ~ ah@bh + ah@bl + al@bh accumulates in f32 on the MXU.
    One naive bf16 pass is useless here — N.o + nc cancels catastrophically
    (the residual is the point-plane distance, tiny next to the coordinate
    terms) and was measured to misroute ~6% of rays; the 3-pass form
    recovers ~2e-6 relative error at half the latency of HIGHEST's 6
    passes. Storage: two bf16 tables = the bytes of one f32 table."""
    pbh = ph_ref[pl.ds(leaf_blk * 8, 8), :]
    pbl = plo_ref[pl.ds(leaf_blk * 8, 8), :]

    def dot3(rv):
        rh = rv.astype(jnp.bfloat16)
        rl = (rv - rh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            pbh, rh, _DOT_T, preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            pbh, rl, _DOT_T, preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            pbl, rh, _DOT_T, preferred_element_type=jnp.float32
        )
        return acc

    ao = dot3(ro8)
    ad = dot3(rd8)
    t = -ao[0:leaf, :] / ad[0:leaf, :]
    u = ao[leaf : 2 * leaf, :] + t * ad[leaf : 2 * leaf, :]
    v = ao[2 * leaf :, :] + t * ad[2 * leaf :, :]
    return t, u, v

RAY_TILE = 1024
LEAF = 32
DEPTH = 160  # per-walk stack bound: ~ (binary depth / 3) * 8 pushes


@pytree
class PallasBvhPack8:
    """8-wide BVH for the sublane-parallel kernel (rides in FlatScene)."""

    boxes: jnp.ndarray  # (M8*8, 8) f32 VMEM: child boxes [minx..maxz,0,0]
    kid: jnp.ndarray  # (8, M8) i32 SMEM: child code (>=0 node, <=-2 leaf, -1 none)
    order: jnp.ndarray  # (8, M8) i32 SMEM: per-octant perm, 3 bits/slot
    planes: jnp.ndarray  # (n_leaves*8, 3*leaf) f32 Woop plane slabs
    prim_map: jnp.ndarray  # (n_leaves*leaf,) i32 slot -> scene tri id
    planes_hi: jnp.ndarray = None  # bf16 split of planes (fast mode)
    planes_lo: jnp.ndarray = None  # bf16 residual: planes - f32(planes_hi)
    n_nodes: int = field(pytree_node=False, default=0)
    n_tris: int = field(pytree_node=False, default=0)
    leaf: int = field(pytree_node=False, default=LEAF)

    @property
    def vmem_bytes(self):
        return (self.boxes.size + self.planes.size) * 4

    @property
    def smem_bytes(self):
        return (self.kid.size + self.order.size) * 4


def _walk_kernel8(
    rays_ref, boxes_ref, kid_ref, ord_ref, planes_ref, out_ref, stack_ref,
    *, m8, leaf, rt, walks, fast=False, any_hit=False,
):
    """Software-pipelined traversal loop. On-chip profiling showed the naive
    loop pays ~5 us of pure LATENCY per iteration (its control flow consumes
    the same iteration's box-test reduction, so the vector->scalar sync, the
    MXU leaf eval, and the next node pop all serialize) even though every
    primitive has <70 ns pipelined throughput. Here each iteration consumes
    the hit bits ISSUED ONE ITERATION EARLIER: decisions for node v_w use
    bits_w from the previous round while this round's box test for the newly
    popped node is merely issued. The reduce latency hides behind a full
    iteration of queued vector work, leaving only scalar control on the
    critical path. Pruning uses best-t as of issue time (one iteration
    stale) — strictly conservative, never wrong."""
    # NOTE: nothing ray-sized is hoisted out of the loop. An earlier
    # version pre-loaded each walk's (16, rt) ray block (and its 1/d rows)
    # as VALUES before the while loop — ~130 vregs of loop-invariant data
    # per walk, which guaranteed register spills around every leaf eval
    # (~2 us/iteration of spill/fill traffic, 30x the real work). All ray
    # data is re-sliced from the VMEM refs at each use instead; the
    # per-walk octant is the only hoisted (scalar) state.
    octants = []
    for w in range(walks):
        c0, c1 = w * rt, (w + 1) * rt
        octant = (
            jnp.where(jnp.sum(rays_ref[4:5, c0:c1]) >= 0.0, 4, 0)
            + jnp.where(jnp.sum(rays_ref[5:6, c0:c1]) >= 0.0, 2, 0)
            + jnp.where(jnp.sum(rays_ref[6:7, c0:c1]) >= 0.0, 1, 0)
        )
        out_ref[0:1, c0:c1] = jnp.full((1, rt), _INF)
        out_ref[1:2, c0:c1] = jnp.full((1, rt), -1.0)
        octants.append(octant)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (leaf, rt), 0).astype(jnp.float32)
    w8 = (2.0 ** jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32))

    def _inv(w):
        c0, c1 = w * rt, (w + 1) * rt
        dx = rays_ref[4:5, c0:c1]
        dy = rays_ref[5:6, c0:c1]
        dz = rays_ref[6:7, c0:c1]
        return (
            1.0 / jnp.where(dx == 0.0, 1e-30, dx),
            1.0 / jnp.where(dy == 0.0, 1e-30, dy),
            1.0 / jnp.where(dz == 0.0, 1e-30, dz),
        )

    def issue_box(w, v):
        """Box-test the 8 children of node |v| and return the packed hit
        bitmask as an (unconsumed) scalar."""
        c0, c1 = w * rt, (w + 1) * rt
        node = jnp.clip(v, 0, m8 - 1)
        b = boxes_ref[pl.ds(node * 8, 8), 0:8]  # (8, 8) child boxes
        ox = rays_ref[0:1, c0:c1]
        oy = rays_ref[1:2, c0:c1]
        oz = rays_ref[2:3, c0:c1]
        idx, idy, idz = _inv(w)
        tnear = rays_ref[12:13, c0:c1]
        tfar = rays_ref[13:14, c0:c1]
        t0x = (b[:, 0:1] - ox) * idx
        t1x = (b[:, 3:4] - ox) * idx
        t0y = (b[:, 1:2] - oy) * idy
        t1y = (b[:, 4:5] - oy) * idy
        t0z = (b[:, 2:3] - oz) * idz
        t1z = (b[:, 5:6] - oz) * idz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        # NOTE: a stale-best variant (box tests pruning against a copy of
        # best-t refreshed every 8 iterations, to break the leaf->box RAW
        # chain) was implemented and MEASURED SLOWER (8.6/31.2 ms vs
        # 6.6/24.3 ms coherent/incoherent on materialtest 131k rays): the
        # vector stream executes in order regardless, so the "dependency"
        # costs nothing, while lazier pruning adds real node visits.
        best = out_ref[0:1, c0:c1]
        if fast:
            # best may be a bf16-underestimated (or phantom) t: prune with
            # relative slack so marginally-nearer real hits stay reachable
            best = best * (1.0 + 1e-3)
        hit = (
            (tmin <= tmax)
            & (tmax > tnear)
            & (tmin < jnp.minimum(tfar, best))
            & (tnear < tfar)
        )  # (8, rt)
        rowany = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)  # (8,1)
        return jnp.sum(rowany * w8)  # scalar: packed per-child any

    # fast mode: 3-pass bf16x3 leaf matmuls with slack on the edge tests and
    # the best-t prune; the caller exact-validates the winner and re-traces
    # rays whose winner was a phantom. The slack must UPPER-BOUND the
    # absolute bf16x3 error: the dropped lo*lo term is ~2^-16 of the
    # intermediate |N.o| magnitudes, which scale with scene_extent /
    # triangle_extent (NOT with the O(1) barycentric outputs) — measured
    # ~3e-4 absolute in u/v on an 80k-tri scene. 5e-3 gives 10x headroom;
    # phantoms it admits cost only repair-pass work, false NEGATIVES from
    # too-tight slack return a silently wrong (farther) surface.
    e_edge = 2e-2 if fast else 0.0
    e_t = 1e-3 if fast else 0.0

    def leaf_eval(w, v):
        c0, c1 = w * rt, (w + 1) * rt
        blk = -(v + 2)
        tnear = rays_ref[12:13, c0:c1]
        tfar = rays_ref[13:14, c0:c1]
        if fast:
            t, u, vv = _leaf_tuv_bf16x3(
                planes_ref[0], planes_ref[1], blk,
                rays_ref[0:8, c0:c1], rays_ref[8:16, c0:c1], leaf,
            )
        else:
            t, u, vv = _leaf_tuv(
                planes_ref, blk, rays_ref[0:8, c0:c1], rays_ref[8:16, c0:c1],
                leaf,
            )
        cur = out_ref[0:1, c0:c1]
        h = (
            (u >= -e_edge) & (vv >= -e_edge) & (u + vv <= 1.0 + e_edge)
            & (t > tnear * (1.0 - e_t))
            & (t < jnp.minimum(tfar, cur) * (1.0 + e_t))
        )
        if any_hit:
            # latch: best-t = 0 kills every future box test for this ray
            # (tmin < min(tfar, 0) never holds), so its subtree pushes stop
            # and the walk drains early — the rtcOccluded split
            hit_now = jnp.max(h.astype(jnp.float32), axis=0, keepdims=True) > 0.0
            out_ref[0:1, c0:c1] = jnp.where(hit_now, 0.0, cur)
            out_ref[1:2, c0:c1] = jnp.where(hit_now, 1.0, out_ref[1:2, c0:c1])
            return
        tt = jnp.where(h, t, _INF)
        tbest = jnp.min(tt, axis=0, keepdims=True)
        slot = jnp.min(jnp.where(tt <= tbest, slot_iota, 1e9), axis=0, keepdims=True)
        better = tbest < cur
        prim = slot + jnp.float32(blk) * jnp.float32(leaf)
        out_ref[0:1, c0:c1] = jnp.where(better, tbest, cur)
        out_ref[1:2, c0:c1] = jnp.where(better, prim, out_ref[1:2, c0:c1])

    # Two-deep issue queue per walk: (vA, bitsA) = node whose hit bits are
    # consumed THIS round (issued two rounds ago — its reduce has a full
    # round of other vector work to complete behind, so the scalar read
    # never drains the pipe); (vB, bitsB) = issued last round. Pops proceed
    # while bits are in flight, so traversal order relaxes slightly from
    # strict near-first (still correct: best-t pruning is conservative).
    # Leaf evals stay under pl.when — their predicate depends only on
    # scalar stack state, so the branch resolves without a vector sync.
    init = []
    for w in range(walks):
        init += [jnp.int32(0), issue_box(w, jnp.int32(0)), jnp.int32(-1),
                 jnp.float32(0.0), jnp.int32(0)]

    def body(state):
        new_state = []
        for w in range(walks):
            octant = octants[w]
            vA = state[5 * w]
            bitsA_f = state[5 * w + 1]
            vB = state[5 * w + 2]
            bitsB_f = state[5 * w + 3]
            sp = state[5 * w + 4]
            node = jnp.clip(vA, 0, m8 - 1)
            aliveA = vA >= 0
            bits = bitsA_f.astype(jnp.int32)

            # consume the 2-rounds-old bits: push vA's hit children
            perm = ord_ref[octant, node]
            cnt = jnp.int32(0)
            for k in range(7, -1, -1):
                c = (perm >> (3 * k)) & 7
                kv = kid_ref[c, node]
                pr = aliveA & (((bits >> c) & 1) == 1) & (kv != -1)
                # stack-bound safety is enforced HOST-SIDE at build time
                # (build_bvh_pack8 asserts 8*ceil(depth) <= DEPTH): an
                # in-kernel jnp.minimum clamp here was measured to cost
                # ~25% end-to-end (8 extra scalar ops in the hottest loop)
                slot_pos = w * DEPTH + sp + cnt

                @pl.when(pr)
                def _(kv=kv, slot_pos=slot_pos):
                    stack_ref[slot_pos] = kv

                cnt = cnt + pr.astype(jnp.int32)
            sp1 = sp + cnt

            # pop ONE entry: leaf -> evaluate now; inner -> enqueue its test
            can = sp1 > 0
            tv = stack_ref[w * DEPTH + jnp.maximum(sp1 - 1, 0)]
            is_leaf = can & (tv <= -2)

            @pl.when(is_leaf)
            def _(tv=tv):
                leaf_eval(w, tv)

            v1 = jnp.where(can & (tv >= 0), tv, -1)
            sp1 = jnp.where(can, sp1 - 1, sp1)
            # No select around the reduce: a scalar jnp.where consuming the
            # reduction result would stall the scalar core on the whole
            # vector pipeline EVERY iteration (the select is evaluated
            # eagerly) — the very serialization the 2-deep issue queue
            # exists to avoid. Dead walks produce garbage bits that are
            # masked by `aliveA` at consumption time.
            bits1 = issue_box(w, v1)

            # rotate the queue: B moves to the consume slot
            new_state += [vB, bitsB_f, v1, bits1, sp1]
        return tuple(new_state)

    def cond(state):
        a = None
        for w in range(walks):
            aw = (
                (state[5 * w] >= 0)
                | (state[5 * w + 2] >= 0)
                | (state[5 * w + 4] > 0)
            )
            a = aw if a is None else (a | aw)
        return a

    jax.lax.while_loop(cond, body, tuple(init))


@functools.partial(
    jax.jit, static_argnames=("m8", "leaf", "rt", "walks", "fast", "any_hit")
)
def _launch8(
    rays_m, boxes, kid, order, planes, m8, leaf=LEAF, rt=RAY_TILE, walks=4,
    fast=False, any_hit=False,
):
    """`planes`: f32 table when fast=False, (hi, lo) bf16 pair when True."""
    blk = rt * walks
    g = rays_m.shape[1] // blk
    kern = functools.partial(
        _walk_kernel8, m8=m8, leaf=leaf, rt=rt, walks=walks, fast=fast,
        any_hit=any_hit,
    )
    if fast:
        plane_specs = [
            pl.BlockSpec(planes[0].shape, lambda i: (0, 0)),
            pl.BlockSpec(planes[1].shape, lambda i: (0, 0)),
        ]
        plane_args = (planes[0], planes[1])

        def kern2(rays_ref, boxes_ref, kid_ref, ord_ref, ph_ref, plo_ref,
                  out_ref, stack_ref):
            return kern(rays_ref, boxes_ref, kid_ref, ord_ref,
                        (ph_ref, plo_ref), out_ref, stack_ref)

        use_kern = kern2
    else:
        plane_specs = [pl.BlockSpec(planes.shape, lambda i: (0, 0))]
        plane_args = (planes,)
        use_kern = kern
    return pl.pallas_call(
        use_kern,
        out_shape=jax.ShapeDtypeStruct((2, g * blk), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((16, blk), lambda i: (0, i)),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0)),  # VMEM-resident
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + plane_specs,
        out_specs=pl.BlockSpec((2, blk), lambda i: (0, i)),
        scratch_shapes=[pltpu.SMEM((walks * DEPTH,), jnp.int32)],
    )(rays_m, boxes, kid, order, *plane_args)


def _collapse8(bvh, leaf_ids):
    """Collapse the binary skip-BVH into 8-ary nodes (greedy largest-area
    3-level expansion). Returns (boxes (M8,8,8), kid (8,M8), order (8,M8))."""
    count = bvh.count
    skip = bvh.skip
    nmin, nmax = bvh.node_min, bvh.node_max
    area = np.prod(np.maximum(nmax - nmin, 0.0), axis=1)  # volume ~ fine for ranking

    def children(b):
        left = b + 1
        return left, int(skip[left])

    nodes8 = []  # list of slot lists (binary ids)
    memo = {}

    def build8(b):
        if b in memo:
            return memo[b]
        id8 = len(nodes8)
        nodes8.append(None)
        memo[b] = id8
        if count[b] > 0:
            slots = [b]
        else:
            slots = list(children(b))
            while len(slots) < 8:
                inner = [s for s in slots if count[s] == 0]
                if not inner:
                    break
                s = max(inner, key=lambda x: area[x])
                slots.remove(s)
                slots.extend(children(s))
        nodes8[id8] = slots
        return id8

    stack = [0]
    build8(0)
    # resolve children breadth-first (iterative to bound recursion)
    i = 0
    while i < len(nodes8):
        for s in list(nodes8[i]):
            if count[s] == 0:
                build8(s)
        i += 1

    m8 = len(nodes8)
    # bound the worst-case stack: depth of the 8-ary tree * 8 pushes/visit
    # must fit the per-walk SMEM stack (ADVICE r2: silent corruption guard)
    depth8 = np.zeros(m8, np.int32)
    for id8 in range(m8 - 1, -1, -1):
        kids8 = [memo[sq] for sq in nodes8[id8] if count[sq] == 0]
        depth8[id8] = 1 + max((int(depth8[kq]) for kq in kids8), default=0)
    assert 8 * int(depth8[0]) <= DEPTH, (
        f"BVH8 depth {int(depth8[0])} needs {8 * int(depth8[0])} stack slots "
        f"> DEPTH={DEPTH}; raise DEPTH in ops/pallas_bvh8.py"
    )
    boxes = np.zeros((m8, 8, 8), np.float32)
    boxes[:, :, 0:3] = np.float32(3e38)  # absent: inverted box, never hits
    boxes[:, :, 3:6] = np.float32(-3e38)
    kid = np.full((8, m8), -1, np.int32)
    order = np.zeros((8, m8), np.int32)
    centers = 0.5 * (nmin + nmax)
    sgn = np.array(
        [[1 if o & 4 else -1, 1 if o & 2 else -1, 1 if o & 1 else -1] for o in range(8)],
        np.float32,
    )  # octant bit layout: x<<2 | y<<1 | z
    for id8, slots in enumerate(nodes8):
        cs = []
        for c, s in enumerate(slots):
            boxes[id8, c, 0:3] = nmin[s]
            boxes[id8, c, 3:6] = nmax[s]
            kid[c, id8] = -(int(leaf_ids[s]) + 2) if count[s] > 0 else memo[s]
            cs.append(centers[s])
        cs = np.asarray(cs, np.float32)  # (k, 3)
        for o in range(8):
            key = cs @ sgn[o]
            perm = list(np.argsort(key, kind="stable")) + list(range(len(slots), 8))
            packed = 0
            for k, c in enumerate(perm):
                packed |= int(c) << (3 * k)
            order[o, id8] = packed
    return boxes.reshape(m8 * 8, 8), kid, order


def build_bvh_pack8(v0, e1, e2, leaf_size: int = LEAF) -> "PallasBvhPack8 | None":
    from ..accel.bvh import build_bvh_cached

    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t = len(v0)
    if t == 0:
        return None
    p1, p2 = v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(v0, p1), p2)
    hi = np.maximum(np.maximum(v0, p1), p2)
    bvh = build_bvh_cached(lo, hi, leaf_size=leaf_size)

    leaf_mask = bvh.count > 0
    leaf_ids = np.cumsum(leaf_mask) - 1
    n_leaves = int(leaf_mask.sum())

    N4, U4, V4 = _woop_planes(v0, e1, e2)
    L = leaf_size
    planes = np.zeros((n_leaves * 8, 3 * L), np.float32)
    prim_map = np.full((n_leaves * L,), -1, np.int32)
    for n in np.where(leaf_mask)[0]:
        s = int(leaf_ids[n])
        f, c = int(bvh.first[n]), int(bvh.count[n])
        gid = bvh.prim_order[f : f + c]
        r = s * 8
        planes[r : r + 4, 0:c] = N4[gid].T
        planes[r : r + 4, L : L + c] = U4[gid].T
        planes[r : r + 4, 2 * L : 2 * L + c] = V4[gid].T
        prim_map[s * L : s * L + c] = gid

    boxes, kid, order = _collapse8(bvh, leaf_ids)
    ph = planes.astype(np.float32)
    p_hi = ph.astype(jnp.bfloat16)
    p_lo = (ph - np.asarray(p_hi, np.float32)).astype(jnp.bfloat16)
    return PallasBvhPack8(
        boxes=jnp.asarray(boxes),
        kid=jnp.asarray(kid),
        order=jnp.asarray(order),
        planes=jnp.asarray(planes),
        prim_map=jnp.asarray(prim_map),
        planes_hi=jnp.asarray(p_hi),
        planes_lo=jnp.asarray(p_lo),
        n_nodes=len(kid[0]),
        n_tris=t,
        leaf=leaf_size,
    )


import os as _os

_RT_DEFAULT = int(_os.environ.get("TUNGSTEN_ISECT_RT", "256"))
_WALKS_DEFAULT = int(_os.environ.get("TUNGSTEN_ISECT_WALKS", "8"))
_FAST_DEFAULT = _os.environ.get("TUNGSTEN_ISECT_EXACT", "") != "1"


def occluded_bvh_pallas8(
    pack: PallasBvhPack8, o, d, tnear, tfar,
    rt: int = _RT_DEFAULT, walks: int = _WALKS_DEFAULT,
) -> jnp.ndarray:
    """Any-hit query -> bool per ray, on the 8-wide ordered-traversal
    kernel: leaves LATCH (best-t forced to 0 on first hit, draining the
    walk early) — the rtcOccluded split on the gen-4 kernel. Runs the
    exact f32 leaf (a bf16 phantom would FALSE-occlude)."""
    n = o.shape[0]
    rays_m, g, _ = _pack_rays(o, d, tnear, tfar, rt * walks)
    out = _launch8(
        rays_m, pack.boxes, pack.kid, pack.order, pack.planes, pack.n_nodes,
        leaf=pack.leaf, rt=rt, walks=walks, fast=False, any_hit=True,
    )
    return out[1, :n] > 0.0


def intersect_bvh_pallas8(
    pack: PallasBvhPack8, tris, o, d, tnear, tfar,
    rt: int = _RT_DEFAULT, walks: int = _WALKS_DEFAULT,
    fast: bool = _FAST_DEFAULT,
) -> Hit:
    """Closest-hit query; indices in the returned Hit are scene tri ids.
    With fast=True (default) the walk runs 1-pass bf16 leaf matmuls and the
    winning primitive's t/u/v are recomputed here in exact f32."""
    n = o.shape[0]
    rays_m, g, _ = _pack_rays(o, d, tnear, tfar, rt * walks)
    planes = (pack.planes_hi, pack.planes_lo) if fast else pack.planes
    out = _launch8(
        rays_m, pack.boxes, pack.kid, pack.order, planes, pack.n_nodes,
        leaf=pack.leaf, rt=rt, walks=walks, fast=fast,
    )
    t = out[0, :n]
    local = out[1, :n].astype(jnp.int32)
    prim = jnp.where(
        local >= 0, pack.prim_map[jnp.clip(local, 0, pack.prim_map.shape[0] - 1)], -1
    )
    if fast:
        # the bf16x3 leaf eval runs its edge tests with e_edge slack so it
        # never FALSE-NEGATIVES a true hit; the price is ~1e-4 of rays whose
        # winner is a phantom just OUTSIDE a triangle (grazing a silhouette
        # edge). Re-validate the winner with the exact f32 Moller-Trumbore
        # (identical conditions to ops.intersect.ray_tri); for the rays
        # whose winner was a phantom (it may have PRUNED a real hit behind
        # it) re-trace through the exact-f32 kernel with every other ray's
        # interval collapsed to empty — those walks do no work, so the
        # repair pass costs one launch, not a second traversal.
        u, v, t_exact, ok = _exact_validate(
            tris.v0, tris.e1, tris.e2, o, d, prim, tnear, tfar
        )
        need = prim >= 0
        need = need & ~ok
        rays_r, _, _ = _pack_rays(
            o, d, tnear, jnp.where(need, tfar, 0.0), rt * walks
        )
        out_r = _launch8(
            rays_r, pack.boxes, pack.kid, pack.order, pack.planes,
            pack.n_nodes, leaf=pack.leaf, rt=rt, walks=walks, fast=False,
        )
        local_r = out_r[1, :n].astype(jnp.int32)
        prim_r = jnp.where(
            need & (local_r >= 0),
            pack.prim_map[jnp.clip(local_r, 0, pack.prim_map.shape[0] - 1)],
            -1,
        )
        u_r, v_r, t_r = _recompute_uv(tris.v0, tris.e1, tris.e2, o, d, prim_r)
        prim = jnp.where(ok, prim, prim_r)
        return Hit(
            t=jnp.where(ok, t_exact, jnp.where(prim_r >= 0, t_r, INF)),
            prim=prim,
            u=jnp.where(ok, u, u_r),
            v=jnp.where(ok, v, v_r),
        )
    u, v, t_exact = _recompute_uv(tris.v0, tris.e1, tris.e2, o, d, prim)
    return Hit(t=jnp.where(prim >= 0, t, INF), prim=prim, u=u, v=v)


def _exact_validate(v0, e1, e2, o, d, prim, tnear, tfar):
    """Exact f32 Moller-Trumbore on the winning prim with ray_tri's accept
    conditions. Returns (u_clipped, v_clipped, t, ok)."""
    tri = jnp.maximum(prim, 0)
    a, ee1, ee2 = v0[tri], e1[tri], e2[tri]
    p = jnp.cross(d, ee2)
    det = jnp.sum(ee1 * p, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tv = o - a
    u = jnp.sum(tv * p, axis=-1) * inv_det
    q = jnp.cross(tv, ee1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(ee2 * q, axis=-1) * inv_det
    ok = (
        (prim >= 0)
        & (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tnear)
        & (t < tfar)
    )
    return (
        jnp.where(ok, jnp.clip(u, 0.0, 1.0), 0.0),
        jnp.where(ok, jnp.clip(v, 0.0, 1.0), 0.0),
        t,
        ok,
    )
