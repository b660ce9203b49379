#!/usr/bin/env python
"""Wavefront-width / batching sweep on the bench scene (round-5 item 1:
measure first). For each (samples_per_pass m, passes_per_batch ppb) config
prints steady-state Mpaths/s on the current backend.

Usage: python tools/bench_sweep.py [--spp 64] [--configs "1:64,4:16,16:4"]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", default="/root/reference/data/materialtest/materialtest.json")
    ap.add_argument("--res", default="250x141")
    ap.add_argument("--configs", default="1:64,2:32,4:16,8:8,16:4")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from tungsten_tpu.renderer.render import render_flat
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene

    rx, ry = (int(v) for v in args.res.split("x"))
    doc = load_scene(args.scene)
    doc.camera["resolution"] = [rx, ry]
    scene = flatten_scene(doc)
    n_pix = rx * ry
    print(f"backend={jax.default_backend()} n_pix={n_pix} spp={args.spp} "
          f"merged={os.environ.get('TUNGSTEN_REGEN_MERGED', '1')}", flush=True)

    for cfg in args.configs.split(","):
        m, ppb = (int(v) for v in cfg.split(":"))
        t0 = time.time()
        render_flat(scene, spp=args.spp, samples_per_pass=m, passes_per_batch=ppb)
        t_compile = time.time() - t0
        rates = []
        for _ in range(args.trials):
            t0 = time.time()
            render_flat(scene, spp=args.spp, samples_per_pass=m, passes_per_batch=ppb)
            rates.append(n_pix * args.spp / (time.time() - t0) / 1e6)
        rates.sort()
        med = rates[len(rates) // 2]
        print(f"m={m:3d} ppb={ppb:3d} W={n_pix*m:8d}: {med:7.3f} Mpaths/s "
              f"(min {rates[0]:.3f} max {rates[-1]:.3f}; 1st incl compile {t_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
