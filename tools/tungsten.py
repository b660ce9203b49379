#!/usr/bin/env python
"""tungsten-tpu CLI renderer — the analog of src/tungsten/tungsten.cpp.

Usage: python tools/tungsten.py scene.json [scene2.json ...] [options]

Renders a queue of Tungsten scene files (schema unmodified) and writes the
tonemapped PNG (and optional HDR) outputs. Options mirror the reference CLI
(src/tungsten/Shared.hpp:134-145): spp, seed, output, restart/checkpoint to
come with the resume system.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description="tungsten-tpu renderer")
    ap.add_argument("scenes", nargs="+", help="scene JSON files")
    ap.add_argument("-o", "--output", help="override output file")
    ap.add_argument("--hdr-output", help="override HDR output file")
    ap.add_argument("-s", "--spp", type=int, help="override sample count")
    ap.add_argument("--seed", type=int, default=0xBA5EBA11)
    ap.add_argument("--scale", type=float, default=1.0, help="resolution scale factor")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tungsten_tpu.io.imageio import save_image
    from tungsten_tpu.models.cameras import tonemap
    from tungsten_tpu.renderer.render import render_flat
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene

    import jax.numpy as jnp
    import numpy as np

    for scene_path in args.scenes:
        try:
            t0 = time.time()
            doc = load_scene(scene_path)
            if args.scale != 1.0:
                rx, ry = doc.camera.get("resolution", [1000, 563])
                doc.camera["resolution"] = [
                    max(1, int(rx * args.scale)),
                    max(1, int(ry * args.scale)),
                ]
            scene = flatten_scene(doc)
            if not args.quiet:
                print(
                    f"[{scene_path}] {scene.tris.v0.shape[0]} tris, "
                    f"{scene.meta.n_lights} lights, {scene.meta.res_x}x{scene.meta.res_y}, "
                    f"{args.spp or scene.meta.spp} spp on {jax.devices()[0].platform}"
                )
            hdr = render_flat(scene, spp=args.spp, seed=args.seed, verbose=not args.quiet)

            out = args.output or doc.renderer.get("output_file", "TungstenRender.png")
            if not os.path.isabs(out) and not args.output:
                out = os.path.join(os.path.dirname(scene_path) or ".", out)
            ldr = np.clip(np.asarray(tonemap(scene.meta.tonemap, jnp.asarray(hdr))), 0, 1)
            save_image(out, ldr)
            hdr_out = args.hdr_output or doc.renderer.get("hdr_output_file", "")
            if hdr_out:
                save_image(hdr_out, hdr)
            if not args.quiet:
                print(f"  wrote {out} in {time.time() - t0:.1f}s")
        except Exception as e:
            print(f"[{scene_path}] FAILED: {e}", file=sys.stderr)
            if len(args.scenes) == 1:
                raise


if __name__ == "__main__":
    main()
