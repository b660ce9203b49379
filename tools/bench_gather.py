#!/usr/bin/env python
"""Microbenchmark: per-lane gather throughput on this TPU.

Decides the round-4 traversal architecture (COVERAGE.md MFU analysis): a
per-lane gather traversal replaces the lockstep union walk with one
row-gather of node data per ray per round. Its viability is purely a
question of how fast `table[idx]` runs for (M, K) f32 tables at the node
counts of real scenes (2k-256k rows) and wavefront sizes (256k-1M lanes).

Also measures the building blocks of a per-lane ORDERED traversal:
  * one-hot stack push/pop over an (N, D) register array
  * one-hot matmul as an alternative gather for small M (MXU trick)
  * 1M-key sort (ray binning for coherence)

Timing protocol (ops/pallas_bvh8.py header): one D2H first, then chain
R executions inside one jit via fori_loop; report (total - rt)/R where
rt is the measured per-dispatch round trip.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def chain_time(fn, carry, reps=20):
    """Time fn chained `reps` times inside one jit. fn must map its carry to
    a same-shaped carry."""

    @jax.jit
    def loop(carry):
        return jax.lax.fori_loop(0, reps, lambda i, a: fn(i, a), carry)

    out = loop(carry)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(carry)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / reps


def measure_roundtrip():
    x = jnp.zeros((8, 128))

    @jax.jit
    def f(x):
        return x + 1.0

    jax.block_until_ready(f(x))
    np.asarray(f(x))  # force one D2H
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(f(x))
    return (time.perf_counter() - t0) / 10


def main():
    print(f"devices: {jax.devices()}")
    rt = measure_roundtrip()
    print(f"per-dispatch round trip: {rt * 1e3:.2f} ms")

    rng = np.random.default_rng(0)
    N = 1 << 20

    print("\n--- row gather: y = table[idx]  (N = 1M lanes) ---")
    for M in [2048, 16384, 65536, 262144]:
        for K in [4, 8, 16]:
            table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
            idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

            def step(i, a, table=table, M=M):
                idx, acc = a
                y = table[idx]
                acc = acc + y[:, 0]
                idx = (idx + 1) & (M - 1)
                return (idx, acc)

            dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)))
            gb = N * K * 4 / dt / 1e9
            print(
                f"M={M:7d} K={K:3d}: {dt * 1e3:7.2f} ms  "
                f"{N / dt / 1e6:8.1f} Mrows/s  {gb:7.1f} GB/s gathered"
            )

    print("\n--- scalar gather: y = vec[idx]  (K=1) ---")
    for M in [2048, 65536, 1 << 20]:
        vec = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
        idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

        def step(i, a, vec=vec, M=M):
            idx, acc = a
            acc = acc + vec[idx]
            idx = (idx + 1) & (M - 1)
            return (idx, acc)

        dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)))
        print(f"M={M:7d}      : {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Melem/s")

    print("\n--- one-hot MXU gather: onehot(idx, M) @ table, bf16 ---")
    for M in [2048, 8192]:
        K = 8
        table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

        def step(i, a, table=table, M=M):
            idx, acc = a
            oh = jax.nn.one_hot(idx, M, dtype=jnp.bfloat16)
            y = oh @ table.astype(jnp.bfloat16)
            acc = acc + y[:, 0].astype(jnp.float32)
            idx = (idx + 1) & (M - 1)
            return (idx, acc)

        dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=5)
        print(f"M={M:7d} K={K:3d}: {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Mrows/s")

    print("\n--- one-hot stack ops over (N, D) f32 (push+pop pair) ---")
    for D in [16, 32]:
        stack = jnp.zeros((N, D), jnp.float32)
        sp0 = jnp.asarray(rng.integers(0, D, N).astype(np.int32))

        def step(i, a, D=D):
            stack, sp = a
            oh = jax.nn.one_hot(sp, D, dtype=jnp.float32)
            # push value i at sp
            stack = stack * (1.0 - oh) + oh * jnp.float32(1.0)
            # pop: read back at sp
            v = jnp.sum(stack * oh, axis=1)
            sp = (sp + v.astype(jnp.int32) + 1) % D
            return (stack, sp)

        dt = chain_time(step, (stack, sp0))
        print(f"D={D:3d}: {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Mlane-pushpops/s")

    print("\n--- sort 1M uint32 keys (+1M payload) ---")
    keys0 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.uint32))
    pay = jnp.arange(N, dtype=jnp.int32)

    def step(i, a):
        keys, pay = a
        sk, sp = jax.lax.sort([keys, pay], num_keys=1)
        return (sk ^ jnp.uint32(i), sp)

    dt = chain_time(step, (keys0, pay), reps=5)
    print(f"sort: {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Mkeys/s")

    print("\n--- argsort-free binning: count-per-bin + cumsum + scatter (1M lanes, 256 bins) ---")
    bins0 = jnp.asarray(rng.integers(0, 256, N).astype(np.int32))

    def step(i, a):
        (bins,) = a
        counts = jnp.zeros((256,), jnp.int32).at[bins].add(1)
        offs = jnp.cumsum(counts) - counts
        # rank within bin via sort on (bin, lane) key is the honest way; this
        # measures just the scatter-add histogram
        return ((bins + counts[bins]) % 256,)

    dt = chain_time(step, (bins0,))
    print(f"hist+scatter: {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
