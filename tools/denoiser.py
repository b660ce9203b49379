#!/usr/bin/env python
"""Post-process denoiser CLI — the analog of src/denoiser (NFOR).

Two modes:

1. Full NFOR (denoiser.cpp:38-133) from a renderer resume/state file, which
   carries the color half buffers, Welford variance, and two-buffer AOVs:

     python tools/denoiser.py --state render_state.npz -o out.pfm

2. Regression-core fallback from loose images (no half buffers available):

     python tools/denoiser.py color.pfm -o out.pfm \
         --albedo albedo.pfm --normal normal.pfm --depth depth.pfm
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _nfor_from_state(path):
    """Rebuild OutputBuffers-equivalent inputs straight from the .npz."""
    from tungsten_tpu.utils.nfor import nfor

    z = np.load(path)
    header = json.loads(bytes(z["__header__"]).decode())
    n = z["sum"].shape[0]
    # infer resolution from the header extra, else assume square-ish is
    # impossible — require res in extra
    extra = header.get("extra") or {}
    res = extra.get("res")
    if res is None:
        raise SystemExit(
            "state file lacks 'res' in its header extra; re-render with a "
            "current build or pass loose images instead"
        )
    h, w = int(res[1]), int(res[0])
    ca = np.maximum(z["count_a"], 1)[:, None]
    cb = np.maximum(z["count_b"], 1)[:, None]
    a = (z["sum_a"] / ca).reshape(h, w, 3)
    b = (z["sum_b"] / cb).reshape(h, w, 3)
    passes = header["passes"]
    var = (z["m2"] / max(passes - 1, 1)).reshape(h, w, 3)
    var = var / np.maximum(z["count"], 1).reshape(h, w, 1)
    feats = []
    for k in ("albedo", "normal", "depth"):
        if f"aova_{k}" in z:
            fa = (z[f"aova_{k}"] / ca[:, : z[f"aova_{k}"].shape[1]]).reshape(h, w, -1)
            fb = (z[f"aovb_{k}"] / cb[:, : z[f"aovb_{k}"].shape[1]]).reshape(h, w, -1)
            feats.append(
                {"buffer_a": fa, "buffer_b": fb, "variance": (fa - fb) ** 2 * 0.25}
            )
    return nfor(a, b, var, feats).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("color", nargs="?")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--state", help="renderer state .npz: run the full NFOR pipeline")
    ap.add_argument("--albedo")
    ap.add_argument("--normal")
    ap.add_argument("--depth")
    ap.add_argument("--variance")
    ap.add_argument("--radius", type=int, default=5)
    args = ap.parse_args()

    from tungsten_tpu.io.imageio import load_image, save_image

    if args.state:
        out = _nfor_from_state(args.state)
    else:
        if not args.color:
            raise SystemExit("need a color image (or --state)")
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
