#!/usr/bin/env python
"""Probe 4: clean per-round costs — subtract the per-dispatch round trip
(~25 ms on this tunneled runtime) and use enough reps that it vanishes."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time2(fn, carry, reps=100):
    @jax.jit
    def loop(carry):
        return jax.lax.fori_loop(0, reps, lambda i, a: fn(i, a), carry)

    jax.block_until_ready(loop(carry))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry))
        best = min(best, time.perf_counter() - t0)
    return best / reps  # roundtrip/reps <= 0.3 ms at reps=100


def main():
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.zeros(8))
    np.asarray(jnp.zeros(8))

    N = 1 << 20

    print("--- row gather, clean (N=1M) ---")
    for M, K in [(4096, 16), (16384, 16), (16384, 64), (32768, 64), (65536, 16), (262144, 16)]:
        table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

        def step(i, a, table=table, M=M):
            idx, acc = a
            y = table[idx]
            return ((idx + 1) & (M - 1), acc + y[:, 0])

        dt = chain_time2(step, (idx0, jnp.zeros((N,), jnp.float32)))
        print(f"M={M:7d} K={K:4d}: {dt * 1e3:7.3f} ms  {N / dt / 1e6:8.1f} Mrows/s  {N*K*4/dt/1e9:6.1f} GB/s")

    print("\n--- dependent chain (M=16k K=17) ---")
    M, K = 16384, 16
    table = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    nxt = jnp.asarray(rng.integers(0, M, M).astype(np.int32))
    tablei = jnp.concatenate([table, nxt[:, None].astype(np.float32)], axis=1)
    idx0 = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

    def stepd(i, a):
        idx, acc = a
        y = tablei[idx]
        return (y[:, K].astype(jnp.int32), acc + y[:, 0])

    dt = chain_time2(stepd, (idx0, jnp.zeros((N,), jnp.float32)))
    print(f"dependent: {dt * 1e3:7.3f} ms  {N / dt / 1e6:8.1f} Mrows/s")

    print("\n--- N scaling, clean ---")
    for Nn in [1 << 16, 1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21]:
        idx0 = jnp.asarray(rng.integers(0, M, Nn).astype(np.int32))

        def step(i, a):
            idx, acc = a
            y = table[idx]
            return ((idx + 1) & (M - 1), acc + y[:, 0])

        dt = chain_time2(step, (idx0, jnp.zeros((Nn,), jnp.float32)))
        print(f"N={Nn:8d}: {dt * 1e3:7.3f} ms  {Nn / dt / 1e6:8.1f} Mrows/s")

    print("\n--- stack ops clean: tuple-of-(N,) one-hot push+pop, D=24 ---")
    D = 24
    stacks = tuple(jnp.zeros((N,), jnp.int32) for _ in range(D))
    sp0 = jnp.asarray(rng.integers(0, D, N).astype(np.int32))

    def steps(i, a):
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

    dt = chain_time2(steps, (sp0, *stacks))
    print(f"D={D}: {dt * 1e3:7.3f} ms per push+pop round")

    print("\n--- vector math throughput ref: 100 fma ops on (N,) f32 ---")
    x0 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def stepv(i, a):
        (x,) = a
        for _ in range(100):
            x = x * 1.000001 + 1e-7
        return (x,)

    dt = chain_time2(stepv, (x0,))
    print(f"100 fma: {dt * 1e3:7.3f} ms -> {100 * N / dt / 1e12:6.2f} Tflop/s eff")


if __name__ == "__main__":
    main()
