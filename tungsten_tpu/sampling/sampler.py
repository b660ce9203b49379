"""Wavefront sample generator.

The reference threads a stateful per-path PathSampleGenerator (PCG32 /
Sobol, src/core/sampling/UniformSampler.hpp:38, SobolPathSampler.hpp) through
the recursive tracer. The TPU-native equivalent is a *stateless, counter-based*
generator: every random number is a pure function of

    (seed, lane id, dimension index)

hashed with PCG4D [Jarzynski & Olano 2020, "Hash Functions for GPU Rendering"]
— a handful of VPU integer ops per draw across the whole wavefront, no state
to thread, no sequential dependence. Each call site consumes one dimension;
the dimension counter lives in the Sampler pytree as a traced int32, so replay
(needed by MLT bootstrap, checkpoint resume, debugging) is exact: the same
(seed, lane, dim) always yields the same float, independent of device count,
sharding, or execution order — a stronger determinism guarantee than the
reference's thread-scheduled PCG streams.

Lane ids are *global* (pixel-major across the full image), so a render sharded
over 8 chips produces bitwise the same image as a single-chip render.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree

_INV_2_24 = jnp.float32(1.0 / (1 << 24))


def pcg4d(v0, v1, v2, v3):
    """PCG4D hash: 4 uint32 in -> 4 decorrelated uint32 out."""
    m = jnp.uint32(1664525)
    a = jnp.uint32(1013904223)
    v0 = v0 * m + a
    v1 = v1 * m + a
    v2 = v2 * m + a
    v3 = v3 * m + a
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * _INV_2_24


@pytree
class Sampler:
    """Per-lane counter-based sample stream.

    seed:     (2,) uint32 — render seed (e.g. folded from 0xBA5EBA11 + pass).
    lane_id:  (N,) uint32 — globally unique lane ids (stable under sharding).
    dim:      ()   int32  — next dimension to consume (traced).
    table:    optional (N, D, 2) float32 primary-sample table — when present,
              draws read table[:, dim] instead of hashing (the MLT
              WritablePathSampleGenerator analog: mutations edit the table,
              replay is exact). Dims beyond D fall back to the hash.
    """

    seed: jnp.ndarray
    lane_id: jnp.ndarray
    dim: jnp.ndarray
    table: jnp.ndarray = None

    @staticmethod
    def create(seed, lane_ids: jnp.ndarray, table=None) -> "Sampler":
        if isinstance(seed, int):
            seed = jnp.array([seed & 0xFFFFFFFF, (seed >> 32) & 0xFFFFFFFF], jnp.uint32)
        seed = jnp.asarray(seed).astype(jnp.uint32).reshape(2)
        return Sampler(seed=seed, lane_id=lane_ids.astype(jnp.uint32), dim=jnp.int32(0), table=table)

    def _draw(self):
        d = self.dim.astype(jnp.uint32)
        r0, r1, _, _ = pcg4d(
            self.lane_id,
            jnp.broadcast_to(d, self.lane_id.shape),
            jnp.broadcast_to(self.seed[0], self.lane_id.shape),
            jnp.broadcast_to(self.seed[1], self.lane_id.shape),
        )
        u0, u1 = _to_unit_float(r0), _to_unit_float(r1)
        if self.table is not None:
            dmax = self.table.shape[1]
            idx = jnp.clip(self.dim, 0, dmax - 1)
            row = jax.lax.dynamic_slice_in_dim(self.table, idx, 1, axis=1)[:, 0]
            in_table = self.dim < dmax
            u0 = jnp.where(in_table, row[:, 0], u0)
            u1 = jnp.where(in_table, row[:, 1], u1)
        return u0, u1

    def next_1d(self) -> Tuple[jnp.ndarray, "Sampler"]:
        u0, _ = self._draw()
        return u0, Sampler(self.seed, self.lane_id, self.dim + 1, self.table)

    def next_2d(self) -> Tuple[jnp.ndarray, "Sampler"]:
        u0, u1 = self._draw()
        u = jnp.stack([u0, u1], axis=-1)
        return u, Sampler(self.seed, self.lane_id, self.dim + 1, self.table)

    def next_bool(self, p) -> Tuple[jnp.ndarray, "Sampler"]:
        """Bernoulli(p) per lane (PathSampleGenerator::nextBoolean)."""
        u, s = self.next_1d()
        return u < p, s

    def next_discrete(self, n) -> Tuple[jnp.ndarray, "Sampler"]:
        u, s = self.next_1d()
        return jnp.minimum((u * n).astype(jnp.int32), jnp.asarray(n, jnp.int32) - 1), s

    def skip(self, n) -> "Sampler":
        """Advance the dimension counter; keeps lax.while bounce iterations
        consuming a fixed dimension budget so streams stay aligned."""
        return Sampler(self.seed, self.lane_id, self.dim + n, self.table)
