"""Pallas TPU kernel: tiled streaming ray-triangle intersection.

The hot op of the renderer (replaces embree's rtcIntersect, SURVEY.md §2.3).
XLA's gather-based BVH walk costs ~17ns/lane/step and its dense brute force
drowns in HBM traffic from materialized (N, chunk, 3) intermediates. This
kernel instead keeps a (RAY_TILE, CHUNK) working set in VMEM:

  grid = (ray_tiles, tri_chunks)
  rays block (RAY_TILE, 8)  [o3 | d3 | tnear | tfar]   revisited over chunks
  tris block (12, CHUNK)    [v0 | e1 | e2 | pad] transposed for broadcasting
  out  block (RAY_TILE, 4)  [t | prim | u | v]         accumulated in place

Pallas double-buffers the triangle stream HBM->VMEM between grid steps; all
Möller-Trumbore intermediates live in registers/VMEM, so the kernel runs at
VPU compute speed instead of HBM-gather speed. Exact same hit semantics as
ops.intersect.ray_tri.

Optional cluster culling: triangles are pre-grouped (BVH leaf order) into
CHUNK-sized clusters with AABBs; a chunk is skipped (@pl.when) when no ray in
the tile can hit its AABB — turning brute force into hierarchical culling at
tile granularity while keeping all memory access dense.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, INF

_INF = 3.0e38  # plain float: jnp constants can't be captured inside kernels

RAY_TILE = 256
CHUNK = 2048


def _mt_kernel(rays_ref, tris_ref, cluster_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, 0] = jnp.full((rays_ref.shape[0],), _INF)
        out_ref[:, 1] = jnp.full((rays_ref.shape[0],), -1.0)
        out_ref[:, 2] = jnp.zeros((rays_ref.shape[0],))
        out_ref[:, 3] = jnp.zeros((rays_ref.shape[0],))

    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    tnear = rays_ref[:, 6:7]
    tfar = jnp.minimum(rays_ref[:, 7:8], out_ref[:, 0:1])

    # tile-level cluster cull: skip the chunk if no ray can hit its AABB
    cb_min = cluster_ref[j, 0:3]
    cb_max = cluster_ref[j, 3:6]
    inv_dx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_dy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
    t0x = (cb_min[0] - ox) * inv_dx
    t1x = (cb_max[0] - ox) * inv_dx
    t0y = (cb_min[1] - oy) * inv_dy
    t1y = (cb_max[1] - oy) * inv_dy
    t0z = (cb_min[2] - oz) * inv_dz
    t1z = (cb_max[2] - oz) * inv_dz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    any_box_hit = jnp.any((tmin <= tmax) & (tmax > tnear) & (tmin < tfar))

    @pl.when(any_box_hit)
    def _():
        v0x = tris_ref[0:1, :]
        v0y = tris_ref[1:2, :]
        v0z = tris_ref[2:3, :]
        e1x = tris_ref[3:4, :]
        e1y = tris_ref[4:5, :]
        e1z = tris_ref[5:6, :]
        e2x = tris_ref[6:7, :]
        e2y = tris_ref[7:8, :]
        e2z = tris_ref[8:9, :]

        # pvec = d x e2   -> (RT, CHUNK)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        # qvec = tvec x e1
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tnear)
            & (t < tfar)
        )
        t = jnp.where(hit, t, _INF)
        jbest = jnp.argmin(t, axis=1)
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == jbest[:, None]
        )
        tbest = jnp.min(t, axis=1)
        better = tbest < out_ref[:, 0]
        j32 = pl.program_id(1)
        prim = (jbest + j32 * tris_ref.shape[1]).astype(jnp.float32)
        out_ref[:, 0] = jnp.where(better, tbest, out_ref[:, 0])
        out_ref[:, 1] = jnp.where(better, prim, out_ref[:, 1])
        out_ref[:, 2] = jnp.where(better, jnp.sum(jnp.where(one_hot, u, 0.0), axis=1), out_ref[:, 2])
        out_ref[:, 3] = jnp.where(better, jnp.sum(jnp.where(one_hot, v, 0.0), axis=1), out_ref[:, 3])


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def _launch(rays, tris_t, clusters, n_chunks):
    n = rays.shape[0]
    grid = (n // RAY_TILE, n_chunks)
    return pl.pallas_call(
        _mt_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((12, CHUNK), lambda i, j: (0, j)),
            # whole cluster table resident in VMEM (tiny); indexed by j inside
            pl.BlockSpec(clusters.shape, lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, 4), lambda i, j: (i, 0)),
    )(rays, tris_t, clusters)


from flax.struct import dataclass as pytree, field


@pytree
class PallasTriPack:
    """Device arrays for the streaming kernel (pytree; rides in FlatScene)."""

    tris_t: jnp.ndarray  # (12, Tpad) transposed [v0|e1|e2|pad]
    clusters: jnp.ndarray  # (n_chunks, 8) chunk AABBs
    n_tris: int = field(pytree_node=False, default=0)
    n_chunks: int = field(pytree_node=False, default=0)


def build_tri_pack(v0, e1, e2) -> PallasTriPack:
    b = PallasTriScene(v0, e1, e2)
    return PallasTriPack(
        tris_t=b.tris_t, clusters=b.clusters, n_tris=b.n_tris, n_chunks=b.n_chunks
    )


class PallasTriScene:
    """Pre-packed device arrays for the streaming kernel (host-built once)."""

    def __init__(self, v0, e1, e2):
        v0 = np.asarray(v0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        t = len(v0)
        pad = (-t) % CHUNK
        if pad:
            z = np.zeros((pad, 3), np.float32)
            v0 = np.concatenate([v0, z])
            e1 = np.concatenate([e1, z])
            e2 = np.concatenate([e2, z])
        tp = len(v0)
        data = np.zeros((12, tp), np.float32)
        data[0:3] = v0.T
        data[3:6] = e1.T
        data[6:9] = e2.T
        self.n_tris = t
        self.n_chunks = tp // CHUNK
        self.tris_t = jnp.asarray(data)
        # per-chunk AABBs for tile-level culling (degenerate pad tris are
        # points at the origin of their chunk's bbox -- harmless)
        p1 = v0 + e1
        p2 = v0 + e2
        lo = np.minimum(np.minimum(v0, p1), p2).reshape(self.n_chunks, CHUNK, 3)
        hi = np.maximum(np.maximum(v0, p1), p2).reshape(self.n_chunks, CHUNK, 3)
        cl = np.zeros((self.n_chunks, 8), np.float32)
        # exclude pad triangles from the AABB of the final chunk
        valid = (np.arange(tp).reshape(self.n_chunks, CHUNK) < t)[..., None]
        cl[:, 0:3] = np.where(valid, lo, np.inf).min(axis=1)
        cl[:, 3:6] = np.where(valid, hi, -np.inf).max(axis=1)
        self.clusters = jnp.asarray(cl)


def intersect_pallas(pscene, o, d, tnear, tfar) -> Hit:
    n = o.shape[0]
    pad = (-n) % RAY_TILE
    rays = jnp.concatenate(
        [o, d, tnear[:, None], tfar[:, None]], axis=1
    )
    if pad:
        dead = jnp.zeros((pad, 8), jnp.float32)
        rays = jnp.concatenate([rays, dead])
    out = _launch(rays, pscene.tris_t, pscene.clusters, pscene.n_chunks)[:n]
    prim = out[:, 1].astype(jnp.int32)
    prim = jnp.where((out[:, 0] < INF) & (prim < pscene.n_tris), prim, -1)
    return Hit(
        t=jnp.where(prim >= 0, out[:, 0], INF),
        prim=prim,
        u=out[:, 2],
        v=out[:, 3],
    )
