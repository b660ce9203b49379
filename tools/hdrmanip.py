#!/usr/bin/env python
"""HDR manipulation tool — the analog of src/hdrmanip/hdrmanip.cpp.

Subcommand-style flags mirroring the reference: tonemap/exposure conversion,
--merge (average renders from multiple machines), --mse/--rmse/--ssim image
error metrics (hdrmanip.cpp:204-223 — the de-facto comparison harness).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="tungsten-tpu hdrmanip")
    ap.add_argument("files", nargs="+")
    ap.add_argument("-o", "--output", help="output file")
    ap.add_argument("--merge", action="store_true", help="average the input images")
    ap.add_argument("--mse", nargs=1, metavar="REF", help="print MSE vs reference image")
    ap.add_argument("--rmse", nargs=1, metavar="REF", help="print RMSE vs reference image")
    ap.add_argument("--ssim", nargs=1, metavar="REF", help="print SSIM vs reference image")
    ap.add_argument("--mse-map", nargs=1, metavar="REF",
                    help="write squared-error heat map (hdrmanip.cpp:114-138)")
    ap.add_argument("--rmse-map", nargs=1, metavar="REF",
                    help="write relative-squared-error heat map (hdrmanip.cpp:140-152)")
    ap.add_argument("-t", "--tonemap", default=None,
                    choices=["linear", "gamma", "reinhard", "filmic", "pbrt"])
    ap.add_argument("-e", "--exposure", type=float, default=0.0, help="EV adjustment")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tungsten_tpu.io.imageio import load_image, save_image
    from tungsten_tpu.models.cameras import tonemap
    from tungsten_tpu.utils.compare import mse, rmse, ssim

    imgs = [load_image(f, gamma_correct=False) for f in args.files]

    for flag, fn in (("mse", mse), ("rmse", rmse), ("ssim", ssim)):
        refarg = getattr(args, flag)
        if refarg:
            ref = load_image(refarg[0], gamma_correct=False)
            for f, img in zip(args.files, imgs):
                print(f"{flag.upper()}({f}) = {fn(img, ref):.6f}")
            return

    if args.mse_map or args.rmse_map:
        # per-pixel (relative) squared error -> x50 -> colorRamp heat map with
        # the 80%-energy-tail max normalization (hdrmanip.cpp:114-199,330-357)
        refpath = (args.mse_map or args.rmse_map)[0]
        ref = load_image(refpath, gamma_correct=False)[..., :3]
        a = imgs[0][..., :3]
        d2 = (a - ref) ** 2
        if args.rmse_map:
            err = (d2 / (a * a + 1e-3)).mean(-1)
        else:
            err = d2.mean(-1)
        err = err * 50.0
        flat = np.sort(err.ravel())
        total = max(flat.sum(), 1e-30)
        csum = np.cumsum(flat[::-1])
        tail = len(flat) - 1 - int(np.searchsorted(csum / total, 0.8))
        vmax = max(flat[max(tail, 0)], 1e-30)
        t = np.clip(err / vmax, 0.0, 1.0)
        ramp = np.array([[0, 0, 1], [0, 1, 1], [0, 1, 0], [1, 1, 0], [1, 0, 0]], np.float32)
        l = np.clip((t * 4.0).astype(np.int32), 0, 3)
        frac = (t * 4.0 - l)[..., None]
        heat = ramp[l] * (1.0 - frac) + ramp[l + 1] * frac
        save_image(args.output or "mse_map.png", np.clip(heat, 0, 1))
        return

    img = np.mean(imgs, axis=0) if args.merge else imgs[0]
    if args.exposure:
        img = img * (2.0**args.exposure)
    if args.tonemap:
        img = np.clip(np.asarray(tonemap(args.tonemap, jnp.asarray(img))), 0, 1)
    save_image(args.output or "out.png", img)


if __name__ == "__main__":
    main()
