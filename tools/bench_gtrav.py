#!/usr/bin/env python
"""Per-lane gather traversal (ops.gather_bvh) vs the lockstep 8-wide Pallas
kernel (ops.pallas_bvh8) on the bench scene's real geometry, coherent and
incoherent, closest-hit and any-hit. Chained-timing protocol."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=10):
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 141000
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.ops import pallas_bvh8 as v4
    from tungsten_tpu.ops import gather_bvh as v5

    doc = load_scene("/root/reference/data/materialtest/materialtest.json")
    doc.camera["resolution"] = [250, 141]
    scene = flatten_scene(doc)
    tris = scene.tris
    v0 = np.asarray(tris.v0)
    e1 = np.asarray(tris.e1)
    e2 = np.asarray(tris.e2)

    pack4 = scene.pbvh8
    pack5 = v5.build_gather_pack(v0, e1, e2)
    print(
        f"tris={len(v0)} gather-rows={pack5.n_rows} depth={pack5.depth} "
        f"table={pack5.rows.size * 4 / 1e6:.1f} MB"
    )

    meta = scene.meta
    from tungsten_tpu.models.cameras import camera_rays
    from tungsten_tpu.sampling import Sampler

    reps_pix = n // (meta.res_x * meta.res_y) + 1
    px = jnp.asarray(
        np.tile(np.arange(meta.res_x, dtype=np.int32), meta.res_y * reps_pix)[:n]
    )
    py = jnp.asarray(
        np.tile(np.repeat(np.arange(meta.res_y, dtype=np.int32), meta.res_x), reps_pix)[:n]
    )
    smp = Sampler.create(jnp.array([1, 0], jnp.uint32), jnp.arange(n, dtype=jnp.uint32))
    u_cam, smp = smp.next_2d()
    u_lens, smp = smp.next_2d()
    o, d = camera_rays(scene.camera, meta, px, py, u_cam, u_lens)
    near = jnp.full((n,), 1e-4)
    far = jnp.full((n,), v5.INF)

    rng = np.random.default_rng(0)
    lo = np.min(v0, 0)
    hi = np.max(v0, 0)
    o_r = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_r = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))

    f4_ = jax.jit(lambda pk, tr, o, d, nr, fr: v4.intersect_bvh_pallas8(pk, tr, o, d, nr, fr))
    f4a_ = jax.jit(lambda pk, o, d, nr, fr: v4.occluded_bvh_pallas8(pk, o, d, nr, fr))
    f5_ = jax.jit(lambda pk, o, d, nr, fr: v5.intersect_bvh_gather(pk, o, d, nr, fr))
    f5a_ = jax.jit(lambda pk, o, d, nr, fr: v5.occluded_bvh_gather(pk, o, d, nr, fr))
    f4 = lambda o, d, nr, fr: f4_(pack4, tris, o, d, nr, fr)
    f4a = lambda o, d, nr, fr: f4a_(pack4, o, d, nr, fr)
    f5 = lambda o, d, nr, fr: f5_(pack5, o, d, nr, fr)
    f5a = lambda o, d, nr, fr: f5a_(pack5, o, d, nr, fr)

    h4 = f4(o, d, near, far)
    h5 = f5(o, d, near, far)
    p4 = np.asarray(h4.prim)
    p5 = np.asarray(h5.prim)
    t4 = np.asarray(h4.t)
    t5 = np.asarray(h5.t)
    both = (p4 >= 0) & (p5 >= 0)
    print(
        f"agreement: hit-mask {((p4 >= 0) == (p5 >= 0)).mean():.6f}, "
        f"t {np.isclose(t4[both], t5[both], rtol=1e-4).mean():.6f}"
    )
    occ5 = np.asarray(f5a(o, d, near, far))
    print(f"anyhit agreement: {((p5 >= 0) == occ5).mean():.6f}")

    for name, oo, dd, fr in [
        ("coherent  ", o, d, far),
        ("incoherent", o_r, d_r, far),
    ]:
        ta = timed(f4, oo, dd, near, fr)
        tb = timed(f5, oo, dd, near, fr)
        tc = timed(f4a, oo, dd, near, fr)
        td = timed(f5a, oo, dd, near, fr)
        print(
            f"{name} closest: v4 {ta * 1e3:8.2f} ms ({ta / n * 1e9:6.0f} ns/ray) | "
            f"v5 {tb * 1e3:8.2f} ms ({tb / n * 1e9:6.0f} ns/ray, {ta / tb:5.2f}x)"
        )
        print(
            f"{name} any-hit: v4 {tc * 1e3:8.2f} ms ({tc / n * 1e9:6.0f} ns/ray) | "
            f"v5 {td * 1e3:8.2f} ms ({td / n * 1e9:6.0f} ns/ray, {tc / td:5.2f}x)"
        )


if __name__ == "__main__":
    main()
