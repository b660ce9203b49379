"""Pallas TPU kernel: packet BVH traversal, fully VMEM-resident.

The second intersection strategy next to ops.pallas_intersect (streaming
brute force). This is the TPU analogue of embree's *packet* traversal
(the reference's rtcIntersect path, SURVEY.md §2.3): one ray tile of
RAY_TILE rays walks a flat skip-pointer BVH **in lockstep with scalar
control flow** — the node pointer lives on the scalar unit, every box
test is one (1, RAY_TILE) VPU op against the whole tile, and leaves are
128-triangle blocks intersected as a single (RAY_TILE, 128) dense
Möller-Trumbore. Work per tile is proportional to the union of the
rays' traversal trees, so coherent tiles (camera rays, shadow rays to a
shared light, morton-compacted bounce rays) approach single-ray cost
instead of brute-force cost.

Memory design: the whole acceleration structure is VMEM-resident — no
per-step HBM streaming at all. Layouts obey the (8, 128) tile rules:

  nodes  (nblk*16, 128)  16 field-rows per block of 128 nodes:
                         [min3 | max3 | leaf_blk | count | skip | pad...]
                         node j = block j//128, lane j%128 (one-hot select)
  tris   (n_leaves*16, 128)  16 field-rows per 128-wide leaf block:
                         [v0(3) | e1(3) | e2(3) | pad]; lane = tri slot
  rays   (N, 8) + transposed (8, N) copies: box tests run lane-major
                         (1, RT) ops; leaf MT runs ray-major (RT, 128).

Integer node fields ride as exact f32 (< 2^24). The BVH is a dedicated
leaf-128 build (leaves are exactly one lane-width), so a leaf visit is
one aligned 16-row dynamic load and one full-width MT — no masking, no
gather. The per-leaf padding slots are degenerate triangles (det = 0).
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

_INF = 3.0e38

RAY_TILE = 512
LEAF = 128  # one lane width of triangles per BVH leaf


def _walk_kernel(rays_ref, raysT_ref, nodes_ref, tris_ref, out_ref, *, m_nodes):
    rt = rays_ref.shape[0]

    # lane-major ray components for box tests: (1, RT) ops
    oxT = raysT_ref[0:1, :]
    oyT = raysT_ref[1:2, :]
    ozT = raysT_ref[2:3, :]
    inv_dxT = 1.0 / jnp.where(raysT_ref[3:4, :] == 0.0, 1e-30, raysT_ref[3:4, :])
    inv_dyT = 1.0 / jnp.where(raysT_ref[4:5, :] == 0.0, 1e-30, raysT_ref[4:5, :])
    inv_dzT = 1.0 / jnp.where(raysT_ref[5:6, :] == 0.0, 1e-30, raysT_ref[5:6, :])
    tnearT = raysT_ref[6:7, :]
    tfarT = raysT_ref[7:8, :]
    ray_ok = tnearT < tfarT  # dead/pad lanes (tfar <= tnear) never traverse

    # ray-major components for leaf MT: (RT, 1) broadcast against (1, 128)
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    tnear = rays_ref[:, 6:7]
    tfar = rays_ref[:, 7:8]

    out_ref[:, 0] = jnp.full((rt,), _INF)
    out_ref[:, 1] = jnp.full((rt,), -1.0)
    out_ref[:, 2] = jnp.zeros((rt,))
    out_ref[:, 3] = jnp.zeros((rt,))

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(ptr):
        blk = ptr // 128
        lane = ptr % 128
        nb = nodes_ref[pl.ds(blk * 16, 16), :]  # (16, 128)
        onehot = (lane_iota == lane).astype(jnp.float32)
        node = jnp.sum(nb * onehot, axis=1, keepdims=True)  # (16, 1)

        t0x = (node[0, 0] - oxT) * inv_dxT
        t1x = (node[3, 0] - oxT) * inv_dxT
        t0y = (node[1, 0] - oyT) * inv_dyT
        t1y = (node[4, 0] - oyT) * inv_dyT
        t0z = (node[2, 0] - ozT) * inv_dzT
        t1z = (node[5, 0] - ozT) * inv_dzT
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        any_hit = jnp.any(
            (tmin <= tmax) & (tmax > tnearT) & (tmin < tfarT) & ray_ok
        )

        leaf_blk = node[6, 0].astype(jnp.int32)
        count = node[7, 0]
        skip = node[8, 0].astype(jnp.int32)
        is_leaf = count > 0.0

        @pl.when(any_hit & is_leaf)
        def _():
            tb = tris_ref[pl.ds(leaf_blk * 16, 16), :]
            v0x = tb[0:1, :]
            v0y = tb[1:2, :]
            v0z = tb[2:3, :]
            e1x = tb[3:4, :]
            e1y = tb[4:5, :]
            e1z = tb[5:6, :]
            e2x = tb[6:7, :]
            e2y = tb[7:8, :]
            e2z = tb[8:9, :]

            px = dy * e2z - dz * e2y  # (RT, 128)
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            cur = out_ref[:, 0:1]
            hit = (
                (jnp.abs(det) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (tt > tnear)
                & (tt < jnp.minimum(tfar, cur))
            )
            tt = jnp.where(hit, tt, _INF)
            jbest = jnp.argmin(tt, axis=1)
            one_hot = (
                jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1) == jbest[:, None]
            )
            tbest = jnp.min(tt, axis=1)
            better = tbest < out_ref[:, 0]
            prim = (jbest + leaf_blk * 128).astype(jnp.float32)
            out_ref[:, 0] = jnp.where(better, tbest, out_ref[:, 0])
            out_ref[:, 1] = jnp.where(better, prim, out_ref[:, 1])
            out_ref[:, 2] = jnp.where(
                better, jnp.sum(jnp.where(one_hot, u, 0.0), axis=1), out_ref[:, 2]
            )
            out_ref[:, 3] = jnp.where(
                better, jnp.sum(jnp.where(one_hot, v, 0.0), axis=1), out_ref[:, 3]
            )

        return jnp.where(any_hit & jnp.logical_not(is_leaf), ptr + 1, skip)

    jax.lax.while_loop(lambda p: p < m_nodes, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("m_nodes",))
def _launch(rays, rays_t, nodes, tris, m_nodes):
    n = rays.shape[0]
    kern = functools.partial(_walk_kernel, m_nodes=m_nodes)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        grid=(n // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i)),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0)),  # VMEM-resident
            pl.BlockSpec(tris.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0)),
    )(rays, rays_t, nodes, tris)


@pytree
class PallasBvhPack:
    """VMEM-resident packet-traversal BVH (pytree; rides in FlatScene)."""

    nodes: jnp.ndarray  # (nblk*16, 128)
    tris: jnp.ndarray  # (n_leaves*16, 128)
    prim_map: jnp.ndarray  # (n_leaves*128,) i32 leaf slot -> scene tri index
    n_nodes: int = field(pytree_node=False, default=0)
    n_tris: int = field(pytree_node=False, default=0)

    @property
    def vmem_bytes(self):
        return (self.nodes.size + self.tris.size) * 4


def build_bvh_pack(v0, e1, e2) -> "PallasBvhPack | None":
    """Host-side leaf-128 skip-BVH build + VMEM layout packing.

    Inputs are the scene-order triangles (the same arrays the brute/BVH
    paths use) so prim_map translates kernel-local hits back to scene
    indices. Returns None for empty scenes.
    """
    from ..accel.bvh import build_bvh_cached

    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t = len(v0)
    if t == 0:
        return None
    p1 = v0 + e1
    p2 = v0 + e2
    lo = np.minimum(np.minimum(v0, p1), p2)
    hi = np.maximum(np.maximum(v0, p1), p2)
    bvh = build_bvh_cached(lo, hi, leaf_size=LEAF)

    m = len(bvh.count)
    leaf_mask = bvh.count > 0
    leaf_ids = np.cumsum(leaf_mask) - 1  # serial number per leaf node
    n_leaves = int(leaf_mask.sum())

    tris_rows = np.zeros((n_leaves * 16, 128), np.float32)
    prim_map = np.zeros((n_leaves * 128,), np.int32)
    leaf_nodes = np.where(leaf_mask)[0]
    for n in leaf_nodes:
        s = int(leaf_ids[n])
        f, c = int(bvh.first[n]), int(bvh.count[n])
        gid = bvh.prim_order[f : f + c]  # scene tri indices in this leaf
        r = s * 16
        tris_rows[r + 0 : r + 3, :c] = v0[gid].T
        tris_rows[r + 3 : r + 6, :c] = e1[gid].T
        tris_rows[r + 6 : r + 9, :c] = e2[gid].T
        prim_map[s * 128 : s * 128 + c] = gid

    mpad = ((m + 127) // 128) * 128
    nodes16 = np.zeros((16, mpad), np.float32)
    nodes16[0:3, :m] = bvh.node_min.T
    nodes16[3:6, :m] = bvh.node_max.T
    nodes16[6, :m] = np.where(leaf_mask, leaf_ids, 0)
    nodes16[7, :m] = bvh.count
    nodes16[8, :m] = bvh.skip
    nblk = mpad // 128
    nodes_rows = (
        nodes16.reshape(16, nblk, 128).transpose(1, 0, 2).reshape(nblk * 16, 128)
    )
    return PallasBvhPack(
        nodes=jnp.asarray(nodes_rows),
        tris=jnp.asarray(tris_rows),
        prim_map=jnp.asarray(prim_map),
        n_nodes=m,
        n_tris=t,
    )


V2 = True  # lane-major walk with per-ray closest-hit pruning


def intersect_bvh_pallas(pack: PallasBvhPack, o, d, tnear, tfar) -> Hit:
    n = o.shape[0]
    pad = (-n) % RAY_TILE
    rays = jnp.concatenate([o, d, tnear[:, None], tfar[:, None]], axis=1)
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), jnp.float32)])
    if V2:
        out = _launch2(rays.T, pack.nodes, pack.tris, pack.n_nodes).T[:n]
    else:
        out = _launch(rays, rays.T, pack.nodes, pack.tris, pack.n_nodes)[:n]
    local = out[:, 1].astype(jnp.int32)
    prim = jnp.where(
        local >= 0, pack.prim_map[jnp.clip(local, 0, pack.prim_map.shape[0] - 1)], -1
    )
    return Hit(
        t=jnp.where(prim >= 0, out[:, 0], INF),
        prim=prim,
        u=out[:, 2],
        v=out[:, 3],
    )


# ---------------------------------------------------------------------------
# v2: all-lane-major walk with per-ray closest-hit pruning. Every vector is
# (1, RT) or (128, RT); the per-ray best-t lives in out_ref[0] and feeds the
# box tests directly, so subtrees behind the current hit are culled per tile
# as soon as any leaf tightens the bound. The leaf block is transposed
# (16,128)->(128,16) in-kernel once per visit (Mosaic sublane<->lane relayout).
# ---------------------------------------------------------------------------


def _walk_kernel2(raysT_ref, nodes_ref, tris_ref, out_ref, *, m_nodes):
    rt = raysT_ref.shape[1]

    oxT = raysT_ref[0:1, :]
    oyT = raysT_ref[1:2, :]
    ozT = raysT_ref[2:3, :]
    dxT = raysT_ref[3:4, :]
    dyT = raysT_ref[4:5, :]
    dzT = raysT_ref[5:6, :]
    inv_dxT = 1.0 / jnp.where(dxT == 0.0, 1e-30, dxT)
    inv_dyT = 1.0 / jnp.where(dyT == 0.0, 1e-30, dyT)
    inv_dzT = 1.0 / jnp.where(dzT == 0.0, 1e-30, dzT)
    tnearT = raysT_ref[6:7, :]
    tfarT = raysT_ref[7:8, :]
    ray_ok = tnearT < tfarT  # dead/pad lanes never traverse

    out_ref[0:1, :] = jnp.full((1, rt), _INF)
    out_ref[1:2, :] = jnp.full((1, rt), -1.0)
    out_ref[2:3, :] = jnp.zeros((1, rt))
    out_ref[3:4, :] = jnp.zeros((1, rt))

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(ptr):
        blk = ptr // 128
        lane = ptr % 128
        nb = nodes_ref[pl.ds(blk * 16, 16), :]  # (16, 128)
        onehot = (lane_iota == lane).astype(jnp.float32)
        node = jnp.sum(nb * onehot, axis=1, keepdims=True)  # (16, 1)

        cur = out_ref[0:1, :]  # per-ray best t so far -> prunes subtrees
        tfar_eff = jnp.minimum(tfarT, cur)
        t0x = (node[0, 0] - oxT) * inv_dxT
        t1x = (node[3, 0] - oxT) * inv_dxT
        t0y = (node[1, 0] - oyT) * inv_dyT
        t1y = (node[4, 0] - oyT) * inv_dyT
        t0z = (node[2, 0] - ozT) * inv_dzT
        t1z = (node[5, 0] - ozT) * inv_dzT
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        any_hit = jnp.any(
            (tmin <= tmax) & (tmax > tnearT) & (tmin < tfar_eff) & ray_ok
        )

        leaf_blk = node[6, 0].astype(jnp.int32)
        count = node[7, 0]
        skip = node[8, 0].astype(jnp.int32)
        is_leaf = count > 0.0

        @pl.when(any_hit & is_leaf)
        def _():
            tb = tris_ref[pl.ds(leaf_blk * 16, 16), :]  # (16, 128)
            tbT = tb.T  # (128, 16): tri slots on sublanes, fields on lanes
            v0x = tbT[:, 0:1]
            v0y = tbT[:, 1:2]
            v0z = tbT[:, 2:3]
            e1x = tbT[:, 3:4]
            e1y = tbT[:, 4:5]
            e1z = tbT[:, 5:6]
            e2x = tbT[:, 6:7]
            e2y = tbT[:, 7:8]
            e2z = tbT[:, 8:9]

            px = dyT * e2z - dzT * e2y  # (128, RT)
            py = dzT * e2x - dxT * e2z
            pz = dxT * e2y - dyT * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx = oxT - v0x
            tvy = oyT - v0y
            tvz = ozT - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dxT * qx + dyT * qy + dzT * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            cur2 = out_ref[0:1, :]
            hit = (
                (jnp.abs(det) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (tt > tnearT)
                & (tt < jnp.minimum(tfarT, cur2))
            )
            tt = jnp.where(hit, tt, _INF)
            ibest = jnp.argmin(tt, axis=0)  # (RT,) over tri slots
            one_hot = (
                jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0) == ibest[None, :]
            )
            tbest = jnp.min(tt, axis=0, keepdims=True)  # (1, RT)
            better = tbest < cur2
            prim = (ibest[None, :] + leaf_blk * 128).astype(jnp.float32)
            out_ref[0:1, :] = jnp.where(better, tbest, cur2)
            out_ref[1:2, :] = jnp.where(better, prim, out_ref[1:2, :])
            out_ref[2:3, :] = jnp.where(
                better,
                jnp.sum(jnp.where(one_hot, u, 0.0), axis=0, keepdims=True),
                out_ref[2:3, :],
            )
            out_ref[3:4, :] = jnp.where(
                better,
                jnp.sum(jnp.where(one_hot, v, 0.0), axis=0, keepdims=True),
                out_ref[3:4, :],
            )

        return jnp.where(any_hit & jnp.logical_not(is_leaf), ptr + 1, skip)

    jax.lax.while_loop(lambda p: p < m_nodes, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("m_nodes",))
def _launch2(rays_t, nodes, tris, m_nodes):
    n = rays_t.shape[1]
    kern = functools.partial(_walk_kernel2, m_nodes=m_nodes)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        grid=(n // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i)),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0)),  # VMEM-resident
            pl.BlockSpec(tris.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((4, RAY_TILE), lambda i: (0, i)),
    )(rays_t, nodes, tris)
