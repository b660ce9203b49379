#!/usr/bin/env python
"""Follow-up gather probes: row-width scaling (K up to 128), the exact
fast/slow table-size boundary, bf16 tables, index locality, and one-hot
stack ops laid out as tuples of (N,) arrays (no minor-dim padding)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_gather import chain_time


def main():
    rng = np.random.default_rng(0)
    N = 1 << 20
    jax.block_until_ready(jnp.zeros(8))
    np.asarray(jnp.zeros(8))  # first D2H

    print("--- row gather K-scaling (f32) ---")
    for M in [4096, 8192, 16384, 32768, 65536]:
        for K in [16, 32, 64, 128]:
            table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
            idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

            def step(i, a, table=table, M=M):
                idx, acc = a
                y = table[idx]
                acc = acc + y[:, 0]
                idx = (idx + 1) & (M - 1)
                return (idx, acc)

            dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=10)
            mb = M * K * 4 / 1e6
            print(
                f"M={M:6d} K={K:4d} ({mb:6.1f} MB): {dt * 1e3:7.2f} ms "
                f"{N / dt / 1e6:8.1f} Mrows/s"
            )

    print("\n--- bf16 table rows ---")
    for M in [16384, 32768, 65536]:
        K = 64
        table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
        idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

        def step(i, a, table=table, M=M):
            idx, acc = a
            y = table[idx].astype(jnp.float32)
            acc = acc + y[:, 0]
            idx = (idx + 1) & (M - 1)
            return (idx, acc)

        dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=10)
        mb = M * K * 2 / 1e6
        print(f"M={M:6d} K={K:4d} bf16 ({mb:6.1f} MB): {dt * 1e3:7.2f} ms {N / dt / 1e6:8.1f} Mrows/s")

    print("\n--- index locality at M=65536 K=16 f32 ---")
    M, K = 65536, 16
    table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for name, idx_np in [
        ("random  ", rng.integers(0, M, N).astype(np.int32)),
        ("sorted  ", np.sort(rng.integers(0, M, N).astype(np.int32))),
        ("block256", (rng.integers(0, M // 256, N)[np.argsort(rng.integers(0, M // 256, N), kind="stable")] * 256 + rng.integers(0, 256, N)).astype(np.int32)),
        ("narrow4k", rng.integers(0, 4096, N).astype(np.int32)),
    ]:
        idx0 = jnp.asarray(idx_np)

        def step(i, a, table=table):
            idx, acc = a
            y = table[idx]
            acc = acc + y[:, 0]
            return (idx, acc + 1.0)

        dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=10)
        print(f"{name}: {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Mrows/s")

    print("\n--- one-hot stack as tuple of (N,) arrays, D=24 (push+pop) ---")
    D = 24
    stacks = tuple(jnp.zeros((N,), jnp.int32) for _ in range(D))
    sp0 = jnp.asarray(rng.integers(0, D, N).astype(np.int32))

    def step(i, a):
        sp = a[0]
        st = list(a[1:])
        val = sp + 7
        for d in range(D):
            st[d] = jnp.where(sp == d, val, st[d])
        popped = st[0]
        for d in range(1, D):
            popped = jnp.where(sp == d, st[d], popped)
        sp = (sp + popped) % D
        return (sp, *st)

    dt = chain_time(step, (sp0, *stacks), reps=10)
    print(f"D={D}: {dt * 1e3:7.2f} ms per push+pop round ({N / dt / 1e6:8.1f} M/s)")

    print("\n--- gather+compute fusion: node row gather + box test, M=16k K=16 ---")
    M = 16384
    table = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    o = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    invd = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))

    def step(i, a, table=table, M=M):
        idx, acc = a
        y = table[idx]  # (N, 16)
        t0 = (y[:, 0] - o[0]) * invd[0]
        t1 = (y[:, 3] - o[0]) * invd[0]
        t0y = (y[:, 1] - o[1]) * invd[1]
        t1y = (y[:, 4] - o[1]) * invd[1]
        t0z = (y[:, 2] - o[2]) * invd[2]
        t1z = (y[:, 5] - o[2]) * invd[2]
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0, t1), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0, t1), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
        hit = tmin <= tmax
        acc = acc + hit.astype(jnp.float32)
        idx = (idx + 1) & (M - 1)
        return (idx, acc)

    dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=10)
    print(f"gather+boxtest: {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Mrows/s")

    print("\n--- compaction: gather (N,16) state by (N,) indices (M=N) ---")
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    state = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))

    def step(i, a, perm=perm):
        st, acc = a
        st2 = st[perm]
        return (st2, acc + st2[0, 0])

    dt = chain_time(step, (state, jnp.zeros((), jnp.float32)), reps=5)
    print(f"1M-row self-gather: {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
