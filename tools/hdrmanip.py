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
    ap.add_argument("--mse-map", nargs=1, metavar="REF", help="write squared-error map")
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

    if args.mse_map:
        ref = load_image(args.mse_map[0], gamma_correct=False)
        err = ((imgs[0] - ref) ** 2).mean(-1, keepdims=True).repeat(3, -1)
        save_image(args.output or "mse_map.pfm", err)
        return

    img = np.mean(imgs, axis=0) if args.merge else imgs[0]
    if args.exposure:
        img = img * (2.0**args.exposure)
    if args.tonemap:
        img = np.clip(np.asarray(tonemap(args.tonemap, jnp.asarray(img))), 0, 1)
    save_image(args.output or "out.png", img)


if __name__ == "__main__":
    main()
