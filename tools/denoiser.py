#!/usr/bin/env python
"""Post-process denoiser CLI — the analog of src/denoiser (NFOR).

Consumes the renderer's HDR color output plus the albedo/normal/depth AOVs
(renderer "output_buffers") and writes the denoised image.

  python tools/denoiser.py color.pfm -o out.pfm \
      --albedo albedo.pfm --normal normal.pfm --depth depth.pfm
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("color")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--albedo")
    ap.add_argument("--normal")
    ap.add_argument("--depth")
    ap.add_argument("--variance")
    ap.add_argument("--radius", type=int, default=5)
    args = ap.parse_args()

    from tungsten_tpu.io.imageio import load_image, save_image
    from tungsten_tpu.utils.denoise import denoise

    load = lambda p: load_image(p, gamma_correct=False) if p else None
    out = denoise(
        load(args.color),
        albedo=load(args.albedo),
        normal=load(args.normal),
        depth=load(args.depth),
        variance=load(args.variance),
        radius=args.radius,
    )
    save_image(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
