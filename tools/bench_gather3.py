#!/usr/bin/env python
"""Probe 3: does the gather unit pipeline across independent gather ops?
If P independent gather streams run at ~1x the single-stream time, the
limit is dependency latency and a multi-walk design wins back P x."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_gather import chain_time


def main():
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.zeros(8))
    np.asarray(jnp.zeros(8))

    M, K = 16384, 16
    table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    print("--- P independent gather streams in one step (N=1M each) ---")
    N = 1 << 20
    for P in [1, 2, 4]:
        idxs = tuple(
            jnp.asarray(rng.integers(0, M, N).astype(np.int32)) for _ in range(P)
        )

        def step(i, a, table=table, M=M, P=P):
            idxs = a[:P]
            accs = a[P:]
            out = []
            for p in range(P):
                y = table[idxs[p]]
                out.append(((idxs[p] + 1) & (M - 1), accs[p] + y[:, 0]))
            return tuple(x[0] for x in out) + tuple(x[1] for x in out)

        accs = tuple(jnp.zeros((N,), jnp.float32) for _ in range(P))
        dt = chain_time(step, idxs + accs, reps=10)
        print(
            f"P={P}: {dt * 1e3:7.2f} ms total  "
            f"{P * N / dt / 1e6:8.1f} Mrows/s aggregate"
        )

    print("\n--- one gather op with P*N indices (2D index array) ---")
    for P in [1, 2, 4]:
        idx0 = jnp.asarray(rng.integers(0, M, (N, P)).astype(np.int32))

        def step(i, a, table=table, M=M):
            idx, acc = a
            y = table[idx]  # (N, P, K)
            acc = acc + y[:, :, 0].sum(axis=1)
            idx = (idx + 1) & (M - 1)
            return (idx, acc)

        dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=10)
        print(f"P={P}: {dt * 1e3:7.2f} ms  {P * N / dt / 1e6:8.1f} Mrows/s aggregate")

    print("\n--- N scaling (single stream, M=16k K=16) ---")
    for Nn in [1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21]:
        idx0 = jnp.asarray(rng.integers(0, M, Nn).astype(np.int32))

        def step(i, a, table=table, M=M):
            idx, acc = a
            y = table[idx]
            return ((idx + 1) & (M - 1), acc + y[:, 0])

        dt = chain_time(step, (idx0, jnp.zeros((Nn,), jnp.float32)), reps=10)
        print(f"N={Nn:8d}: {dt * 1e3:7.2f} ms  {Nn / dt / 1e6:8.1f} Mrows/s")

    print("\n--- dependent chain: idx = f(table[idx]) (true traversal shape) ---")
    N = 1 << 20
    idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    nxt = jnp.asarray(rng.integers(0, M, M).astype(np.int32))
    tablei = jnp.concatenate([table, nxt[:, None].astype(np.float32)], axis=1)

    def step(i, a, tablei=tablei, M=M):
        idx, acc = a
        y = tablei[idx]
        acc = acc + y[:, 0]
        idx = y[:, K].astype(jnp.int32)
        return (idx, acc)

    dt = chain_time(step, (idx0, jnp.zeros((N,), jnp.float32)), reps=10)
    print(f"dependent: {dt * 1e3:7.2f} ms  {N / dt / 1e6:8.1f} Mrows/s")


if __name__ == "__main__":
    main()
