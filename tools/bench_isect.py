#!/usr/bin/env python
"""Chained-dispatch microbenchmark for the closest-hit / any-hit kernels.

Protocol (see ops/pallas_bvh8.py docstring): one D2H transfer up front,
then K kernel executions chained inside ONE jit via lax.fori_loop with a
data dependence between iterations, reporting (total - dispatch)/K.
Coherent rays = camera rays; incoherent = random origins in the scene
bbox with uniform sphere directions.
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chained_time(fn, args, K=30, trials=3):
    """fn(*args) -> array. Returns per-call seconds via a K-chained jit."""

    def chained(*a):
        def body(i, acc):
            r = fn(*a)
            return acc + jnp.sum(r) * 1e-30  # data dep so iterations serialize

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    cj = jax.jit(chained)
    r = cj(*args)
    float(r)  # D2H: force real completion + warm
    best = 1e30
    for _ in range(trials):
        t0 = time.perf_counter()
        float(cj(*args))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best / K


def make_rays(scene, n, kind, seed=0):
    from tungsten_tpu.models.cameras import camera_rays
    from tungsten_tpu.sampling import Sampler

    meta = scene.meta
    if kind == "coherent":
        reps = int(np.ceil(n / (meta.res_x * meta.res_y)))
        px = np.tile(np.tile(np.arange(meta.res_x, dtype=np.int32), meta.res_y), reps)[:n]
        py = np.tile(np.repeat(np.arange(meta.res_y, dtype=np.int32), meta.res_x), reps)[:n]
        smp = Sampler.create(jnp.array([1, 0], jnp.uint32), jnp.arange(n, dtype=jnp.uint32))
        u_cam, smp = smp.next_2d()
        u_lens, smp = smp.next_2d()
        o, d = camera_rays(scene.camera, meta, jnp.asarray(px), jnp.asarray(py), u_cam, u_lens)
    else:
        v0 = np.asarray(scene.tris.v0)
        lo, hi = v0.min(0), v0.max(0)
        rng = np.random.default_rng(seed)
        o = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
        dn = rng.normal(size=(n, 3)).astype(np.float32)
        d = jnp.asarray(dn / np.linalg.norm(dn, axis=1, keepdims=True))
    near = jnp.full((n,), 1e-4, jnp.float32)
    far = jnp.full((n,), 3e38, jnp.float32)
    return o, d, near, far


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/data/materialtest/materialtest.json")
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--kernels", default="bvh8")
    args = ap.parse_args()

    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene

    doc = load_scene(args.scene)
    doc.camera["resolution"] = [250, 141]
    scene = flatten_scene(doc)
    tris = scene.tris
    n = args.n
    print(f"scene tris={tris.v0.shape[0]} rays={n}")

    results = {}
    for kind in ("coherent", "incoherent"):
        o, d, near, far = make_rays(scene, n, kind)
        for kname in args.kernels.split(","):
            if kname == "bvh8":
                from tungsten_tpu.ops.pallas_bvh8 import intersect_bvh_pallas8

                fn = lambda pk, tr, o, d, nr, fr: intersect_bvh_pallas8(pk, tr, o, d, nr, fr).t
                dt = chained_time(fn, (scene.pbvh8, tris, o, d, near, far), K=args.K)
            elif kname == "bvh3any":
                from tungsten_tpu.ops.pallas_bvh2 import occluded_bvh_pallas3

                fn = lambda pk, o, d, nr, fr: occluded_bvh_pallas3(pk, o, d, nr, fr).astype(jnp.float32)
                dt = chained_time(fn, (scene.pbvh3, o, d, near, far), K=args.K)
            elif kname == "bvhx":
                from tungsten_tpu.ops.pallas_bvhx import build_pack_x, intersect_bvh_pallasx

                if "packx" not in results:
                    results["packx"] = build_pack_x(
                        np.asarray(tris.v0), np.asarray(tris.e1), np.asarray(tris.e2)
                    )
                packx = results["packx"]
                fn = lambda pk, tr, o, d, nr, fr: intersect_bvh_pallasx(pk, tr, o, d, nr, fr).t
                dt = chained_time(fn, (packx, tris, o, d, near, far), K=args.K)
            elif kname == "gather":
                from tungsten_tpu.ops.gather_bvh import (
                    build_gather_pack, intersect_bvh_gather,
                )

                if "gpack" not in results:
                    results["gpack"] = build_gather_pack(
                        np.asarray(tris.v0), np.asarray(tris.e1), np.asarray(tris.e2)
                    )
                gp = results["gpack"]
                fn = lambda rows, o, d, nr, fr: intersect_bvh_gather(
                    gp.replace(rows=rows), o, d, nr, fr
                ).t
                dt = chained_time(fn, (gp.rows, o, d, near, far), K=args.K)
            elif kname == "gatherany":
                from tungsten_tpu.ops.gather_bvh import (
                    build_gather_pack, occluded_bvh_gather,
                )

                if "gpack" not in results:
                    results["gpack"] = build_gather_pack(
                        np.asarray(tris.v0), np.asarray(tris.e1), np.asarray(tris.e2)
                    )
                gp = results["gpack"]
                fn = lambda rows, o, d, nr, fr: occluded_bvh_gather(
                    gp.replace(rows=rows), o, d, nr, fr
                ).astype(jnp.float32)
                dt = chained_time(fn, (gp.rows, o, d, near, far), K=args.K)
            else:
                continue
            mrps = n / dt / 1e6
            results[(kind, kname)] = mrps
            print(f"{kind:10s} {kname:8s}: {dt * 1e3:8.2f} ms  {mrps:8.2f} Mrays/s")

    # agreement check vs brute force on a subset
    from tungsten_tpu.ops import intersect as isect

    o, d, near, far = make_rays(scene, 4096, "incoherent", seed=1)
    hb = isect.intersect_brute(tris, o, d, near, far)
    for kname in args.kernels.split(","):
        if kname == "bvh8":
            from tungsten_tpu.ops.pallas_bvh8 import intersect_bvh_pallas8

            h = intersect_bvh_pallas8(scene.pbvh8, tris, o, d, near, far)
        elif kname == "bvhx":
            from tungsten_tpu.ops.pallas_bvhx import intersect_bvh_pallasx

            h = intersect_bvh_pallasx(results["packx"], tris, o, d, near, far)
        elif kname == "gather":
            from tungsten_tpu.ops.gather_bvh import intersect_bvh_gather

            h = intersect_bvh_gather(results["gpack"], o, d, near, far)
        else:
            continue
        pb, pk = np.asarray(hb.prim), np.asarray(h.prim)
        agree = ((pb >= 0) == (pk >= 0)).mean()
        both = (pb >= 0) & (pk >= 0)
        tb, tk = np.asarray(hb.t), np.asarray(h.t)
        tclose = np.isclose(tb[both], tk[both], rtol=1e-3).mean() if both.any() else 1.0
        print(f"agreement {kname}: hitmask {agree:.4f}  t {tclose:.4f}")


if __name__ == "__main__":
    main()
