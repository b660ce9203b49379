#!/usr/bin/env python
"""Microbenchmark: old packet kernel (pallas_bvh) vs new SMEM-node kernel
(pallas_bvh2) on the bench scene's real geometry. Also checks agreement."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.ops import pallas_bvh as v1
    from tungsten_tpu.ops import pallas_bvh2 as v3

    doc = load_scene("/root/reference/data/materialtest/materialtest.json")
    doc.camera["resolution"] = [250, 141]
    scene = flatten_scene(doc)
    tris = scene.tris
    v0 = np.asarray(tris.v0); e1 = np.asarray(tris.e1); e2 = np.asarray(tris.e2)

    pack1 = scene.pbvh or v1.build_bvh_pack(v0, e1, e2)
    pack3 = v3.build_bvh_pack3(v0, e1, e2)
    print(f"tris={len(v0)} nodes={pack3.n_nodes} "
          f"smem={pack3.smem_bytes/1024:.0f}KB vmem={pack3.vmem_bytes/1e6:.1f}MB")

    n = 141000
    meta = scene.meta
    from tungsten_tpu.models.cameras import camera_rays
    from tungsten_tpu.sampling import Sampler
    px = jnp.asarray(np.tile(np.tile(np.arange(meta.res_x, dtype=np.int32), meta.res_y), 4))
    py = jnp.asarray(np.tile(np.repeat(np.arange(meta.res_y, dtype=np.int32), meta.res_x), 4))
    smp = Sampler.create(jnp.array([1, 0], jnp.uint32), jnp.arange(n, dtype=jnp.uint32))
    u_cam, smp = smp.next_2d()
    u_lens, smp = smp.next_2d()
    o, d = camera_rays(scene.camera, meta, px, py, u_cam, u_lens)
    near = jnp.full((n,), 1e-4)
    far = jnp.full((n,), v3.INF)

    rng = np.random.default_rng(0)
    lo = np.min(v0, 0); hi = np.max(v0, 0)
    o_r = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_r = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))

    # packs/tris must be jit ARGUMENTS: closure-captured arrays become XLA
    # constants, and constant pallas inputs cost ~200us per grid step (!)
    f1_ = jax.jit(lambda pk, o, d, nr, fr: v1.intersect_bvh_pallas(pk, o, d, nr, fr))
    f3_ = jax.jit(lambda pk, tr, o, d, nr, fr: v3.intersect_bvh_pallas3(pk, tr, o, d, nr, fr))
    f3a_ = jax.jit(lambda pk, o, d, nr, fr: v3.occluded_bvh_pallas3(pk, o, d, nr, fr))
    f1 = lambda o, d, nr, fr: f1_(pack1, o, d, nr, fr)
    f3 = lambda o, d, nr, fr: f3_(pack3, tris, o, d, nr, fr)
    f3a = lambda o, d, nr, fr: f3a_(pack3, o, d, nr, fr)

    # correctness: agree on camera rays
    h1 = f1(o, d, near, far)
    h3 = f3(o, d, near, far)
    p1 = np.asarray(h1.prim); p3 = np.asarray(h3.prim)
    hit_agree = ((p1 >= 0) == (p3 >= 0)).mean()
    t1 = np.asarray(h1.t); t3 = np.asarray(h3.t)
    both = (p1 >= 0) & (p3 >= 0)
    t_close = np.isclose(t1[both], t3[both], rtol=1e-4).mean()
    occ3 = np.asarray(f3a(o, d, near, far))
    occ_agree = ((p3 >= 0) == occ3).mean()
    print(f"agreement: hit-mask {hit_agree:.6f}, t {t_close:.6f}, anyhit {occ_agree:.6f}")

    for name, oo, dd, fr in [
        ("coherent ", o, d, far),
        ("incoherent", o_r, d_r, far),
        ("all-dead  ", o_r, d_r, jnp.zeros((n,))),
    ]:
        ta = timed(f1, oo, dd, near, fr)
        tb = timed(f3, oo, dd, near, fr)
        tc = timed(f3a, oo, dd, near, fr)
        print(f"{name}: v1 {ta*1e3:8.2f} ms | v3 {tb*1e3:8.2f} ms "
              f"({ta/tb:5.2f}x, {n/tb/1e6:7.2f} Mrays/s) | v3-any {tc*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
