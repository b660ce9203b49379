#!/usr/bin/env python
"""Diagnose the gather traversal: rounds to drain, per-round cost, N scaling."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.ops import gather_bvh as v5

    doc = load_scene("/root/reference/data/materialtest/materialtest.json")
    doc.camera["resolution"] = [250, 141]
    scene = flatten_scene(doc)
    v0 = np.asarray(scene.tris.v0)
    e1 = np.asarray(scene.tris.e1)
    e2 = np.asarray(scene.tris.e2)
    pack = v5.build_gather_pack(v0, e1, e2)
    print(f"rows={pack.n_rows} depth={pack.depth}")

    rng = np.random.default_rng(0)
    lo = np.min(v0, 0)
    hi = np.max(v0, 0)

    f5_ = jax.jit(
        lambda pk, o, d, nr, fr, mr: v5._traverse(
            pk.rows, o, d, nr, fr, root=pk.root, m=pk.n_rows, depth=pk.depth,
            max_rounds=mr,
        ),
        static_argnames=("mr",),
    )

    for n in [141_000, 524_288, 1_048_576]:
        o_r = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
        d_np = rng.normal(size=(n, 3)).astype(np.float32)
        d_r = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
        near = jnp.full((n,), 1e-4)
        far = jnp.full((n,), v5.INF)
        out = f5_(pack, o_r, d_r, near, far, 16384)
        rounds = int(out[4])
        dt = timed(lambda: f5_(pack, o_r, d_r, near, far, 16384))
        # capped-round runs to get per-round marginal cost
        dt32 = timed(lambda: f5_(pack, o_r, d_r, near, far, 32))
        dt64 = timed(lambda: f5_(pack, o_r, d_r, near, far, 64))
        per_round = (dt64 - dt32) / 32
        print(
            f"N={n:8d}: rounds={rounds:4d} total={dt * 1e3:8.2f} ms "
            f"({dt / n * 1e9:6.0f} ns/ray)  per-round={per_round * 1e3:6.3f} ms "
            f"({per_round / n * 1e9:7.2f} ns/lane)"
        )


if __name__ == "__main__":
    main()
