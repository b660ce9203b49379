#!/usr/bin/env python
"""Per-stage wavefront profiler (VERDICT round-1 item 2).

Measures, on the real device, the cost of each wavefront stage for the
bench scene: intersect (coherent / incoherent / sparse-alive), shading-only,
NEE, compaction, and the per-bounce breakdown of a full pass (delta timing
across max_bounces). Prints a table; no JSON contract.

Usage: python tools/profile_pt.py [scene] [--spp N]
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

SCENES = {
    "materialtest": ("/root/reference/data/materialtest/materialtest.json", [250, 141]),
    "cornell": ("/root/reference/data/example-scenes/cornell-box/scene.json", [256, 144]),
}


def timed(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="materialtest")
    ap.add_argument("--samples-per-pass", type=int, default=4)
    args = ap.parse_args()

    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.integrators import path_tracer as pt

    path, res = SCENES.get(args.scene, (args.scene, None))
    doc = load_scene(path)
    if res:
        doc.camera["resolution"] = res
    scene = flatten_scene(doc)
    meta = scene.meta
    n_pix = meta.res_x * meta.res_y
    n = n_pix * args.samples_per_pass
    n_tris = scene.tris.v0.shape[0]
    print(f"scene={args.scene} res={meta.res_x}x{meta.res_y} lanes={n}")
    print(f"tris={n_tris} max_bounces={meta.max_bounces} n_lights={meta.n_lights} "
          f"has_media={meta.has_media} has_env={meta.has_env} has_forward={meta.has_forward}")
    if scene.pbvh is not None:
        pb = scene.pbvh
        print(f"pbvh: nodes={pb.n_nodes} node_rows={pb.nodes.shape} "
              f"tri_rows={pb.tris.shape} vmem={pb.vmem_bytes/1e6:.2f} MB")
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    # ---- camera rays ----
    px = jnp.asarray(np.tile(np.tile(np.arange(meta.res_x, dtype=np.int32), meta.res_y), args.samples_per_pass))
    py = jnp.asarray(np.tile(np.repeat(np.arange(meta.res_y, dtype=np.int32), meta.res_x), args.samples_per_pass))
    lane_ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.array([0xBA5EBA11, 0], jnp.uint32)

    from tungsten_tpu.models.cameras import camera_rays
    from tungsten_tpu.sampling import Sampler

    smp = Sampler.create(seed, lane_ids)
    u_cam, smp = smp.next_2d()
    u_lens, smp = smp.next_2d()
    o, d = camera_rays(scene.camera, meta, px, py, u_cam, u_lens)
    o, d = jax.block_until_ready((o, d))
    near = jnp.full((n,), 1e-4)
    far = jnp.full((n,), pt.INF)

    isect_jit = jax.jit(lambda o, d, nr, fr: pt._intersect(scene, o, d, nr, fr))

    t_coh = timed(isect_jit, o, d, near, far)
    print(f"\nintersect coherent (camera) {n} rays: {t_coh*1e3:8.2f} ms  "
          f"{n/t_coh/1e6:7.2f} Mrays/s")

    # incoherent: random origins in scene bbox, random dirs
    rng = np.random.default_rng(0)
    lo = np.asarray(scene.bvh.node_min[0]) if scene.bvh is not None else np.zeros(3)
    hi = np.asarray(scene.bvh.node_max[0]) if scene.bvh is not None else np.ones(3)
    o_r = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    d_r = rng.normal(size=(n, 3)).astype(np.float32)
    d_r = jnp.asarray(d_r / np.linalg.norm(d_r, axis=1, keepdims=True))
    t_inc = timed(isect_jit, o_r, d_r, near, far)
    print(f"intersect incoherent random    rays: {t_inc*1e3:8.2f} ms  "
          f"{n/t_inc/1e6:7.2f} Mrays/s")

    # incoherent but octant+morton sorted (what compaction would feed)
    on = np.asarray(o_r); dn = np.asarray(d_r)
    q = np.clip(((on - lo) / np.maximum(hi - lo, 1e-6) * 16).astype(np.int64), 0, 15)
    okey = (dn[:, 0] > 0) * 1 + (dn[:, 1] > 0) * 2 + (dn[:, 2] > 0) * 4
    def _interleave(x, y, z):
        out = np.zeros_like(x)
        for b in range(4):
            out |= ((x >> b) & 1) << (3 * b) | ((y >> b) & 1) << (3 * b + 1) | ((z >> b) & 1) << (3 * b + 2)
        return out
    mkey = _interleave(q[:, 0], q[:, 1], q[:, 2])
    perm = np.argsort((mkey << 3) | okey, kind="stable")
    t_srt = timed(isect_jit, o_r[perm], d_r[perm], near, far)
    print(f"intersect incoherent sorted    rays: {t_srt*1e3:8.2f} ms  "
          f"{n/t_srt/1e6:7.2f} Mrays/s")

    # sparse alive: 10% alive scattered vs compacted
    alive = rng.uniform(size=n) < 0.10
    far_sc = jnp.asarray(np.where(alive, np.inf, 0.0).astype(np.float32))
    t_sp = timed(isect_jit, o_r, d_r, near, far_sc)
    print(f"intersect 10% alive scattered  rays: {t_sp*1e3:8.2f} ms")
    perm2 = np.argsort(~alive, kind="stable")
    t_spc = timed(isect_jit, o_r[perm2], d_r[perm2], near, jnp.asarray(
        np.where(alive[perm2], np.inf, 0.0).astype(np.float32)))
    print(f"intersect 10% alive compacted  rays: {t_spc*1e3:8.2f} ms")

    # ---- shading-ish: bsdf sample+eval+pdf on all lanes ----
    from tungsten_tpu.models.bsdfs import bsdf_eval, bsdf_pdf, bsdf_sample
    hit = isect_jit(o, d, near, far)
    hit = jax.block_until_ready(hit)
    tri = jnp.maximum(hit.prim, 0)
    mat_id = scene.tri_mat[tri]
    uv = jnp.zeros((n, 2))
    wi = jnp.tile(jnp.asarray([[0.3, 0.2, 0.933]], jnp.float32), (n, 1))
    ctx = (scene.materials, scene.textures)

    def shade(mat_id, uv, wi, u2, u1):
        bs = bsdf_sample(ctx, mat_id, uv, wi, u2, u1)
        f = bsdf_eval(ctx, mat_id, uv, wi, bs.wo)
        pdf = bsdf_pdf(ctx, mat_id, uv, wi, bs.wo)
        return bs.weight + f + pdf[..., None]

    u2 = jnp.full((n, 2), 0.4)
    u1 = jnp.full((n,), 0.6)
    t_sh = timed(jax.jit(shade), mat_id, uv, wi, u2, u1)
    print(f"\nbsdf sample+eval+pdf all lanes:      {t_sh*1e3:8.2f} ms  "
          f"{t_sh/n*1e9:6.1f} ns/lane")

    # ---- compaction cost ----
    state = dict(
        o=o, d=d, throughput=jnp.ones((n, 3)), emission=jnp.zeros((n, 3)),
        pix=jnp.arange(n, dtype=jnp.int32), hit_t=hit.t, hit_u=hit.u,
        hit_v=hit.v, alive=jnp.ones((n,), bool),
        was_specular=jnp.ones((n,), bool), medium=jnp.zeros((n,), jnp.int32),
        first_scatter=jnp.ones((n,), bool), med_bounce=jnp.zeros((n,), jnp.int32),
        lane_id=lane_ids, hit_prim=hit.prim,
    )
    key = jnp.asarray(rng.integers(0, 4096, n, dtype=np.int32))
    names_3 = ("o", "d", "throughput", "emission")
    names_1 = ("pix", "hit_t", "hit_u", "hit_v", "alive", "was_specular",
               "medium", "first_scatter", "med_bounce", "lane_id", "hit_prim")
    t_cp = timed(jax.jit(lambda k, s: pt._compact_sort(k, s, names_3, names_1)), key, state)
    print(f"compact_sort (argsort+permute):      {t_cp*1e3:8.2f} ms")

    # ---- full pass delta timing across max_bounces ----
    print("\nfull trace_pass vs max_bounces (compile per point; deltas = bounce cost):")
    from flax import struct
    base_mb = meta.max_bounces
    prev = None
    for mb in [1, 2, 4, 8, 16, min(base_mb, 64)]:
        if mb > base_mb:
            break
        meta2 = meta.replace(max_bounces=mb) if hasattr(meta, "replace") else None
        if meta2 is None:
            import dataclasses
            meta2 = dataclasses.replace(meta, max_bounces=mb)
        scene2 = scene.replace(meta=meta2) if hasattr(scene, "replace") else None
        if scene2 is None:
            import dataclasses
            scene2 = dataclasses.replace(scene, meta=meta2)
        f = jax.jit(lambda s, l, x, y, sc=scene2: pt.trace_pass(sc, s, l, x, y))
        t = timed(f, seed, lane_ids, px, py, reps=2)
        d_s = "" if prev is None else f"  (+{(t-prev)*1e3:7.2f} ms)"
        print(f"  max_bounces={mb:3d}: {t*1e3:8.2f} ms{d_s}")
        prev = t
        paths = n / t / 1e6
        print(f"      -> {paths:6.3f} Mpaths/s")


if __name__ == "__main__":
    main()
