#!/usr/bin/env python
"""Diagnose the volumetric BDPT bias (VERDICT r2 item 2).

Each debug family with MIS weight pinned to 1 is individually an unbiased
estimator of (a subset of) the transport on the diffuse fog-cornell scene:
  s0   = camera path hits the light (plain PT without NEE)
  s1   = NEE at every camera vertex (PT's NEE-only half)
  t1   = light-subpath splats (the light tracer)
  s2t* = one extra light bounce connections
Comparing each family's image against PT isolates whether the bias lives in
the subpath tracing / technique contributions or in the MIS weights.

Usage: python tools/debug_bdpt_media.py [family]
  family in {pt, lt, full, s0, s1, t1, conn}; no arg = run pt + full.
Run families in separate processes (the debug flag is read at import time):
  for f in pt s0 s1 t1 full; do python tools/debug_bdpt_media.py $f; done
"""
import json
import os
import sys

fam = sys.argv[1] if len(sys.argv) > 1 else "full"
if fam not in ("pt", "lt"):
    os.environ["TUNGSTEN_BDPT_DEBUG"] = "" if fam == "full" else fam
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tungsten_tpu.scene.load import parse_scene
from tungsten_tpu.scene.flatten import flatten_scene

RES = [16, 12]
MAX_BOUNCES = int(os.environ.get("DBG_BOUNCES", "4"))
SPP = int(os.environ.get("DBG_SPP", "512"))


FOG = os.environ.get("DBG_FOG", "1") != "0"


def build_scene():
    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = RES
    raw["integrator"]["max_bounces"] = MAX_BOUNCES
    if FOG:
        raw["media"] = [
            {
                "name": "fog",
                "type": "homogeneous",
                "sigma_a": 0.02,
                "sigma_s": 0.25,
                "phase_function": {"type": "isotropic"},
            }
        ]
        raw["camera"]["medium"] = "fog"
        for prim in raw["primitives"]:
            prim["ext_medium"] = "fog"
    doc = parse_scene(
        raw, path="/root/reference/data/example-scenes/cornell-box/scene.json"
    )
    return flatten_scene(doc)


def main():
    scene = build_scene()
    tag = f"{fam}_b{MAX_BOUNCES}_f{int(FOG)}"
    out = f"/tmp/bdpt_dbg_{tag}.npy"
    if fam == "pt":
        from tungsten_tpu.renderer.render import render_flat

        img = render_flat(scene, spp=SPP, seed=11)
    elif fam == "lt":
        from tungsten_tpu.renderer.render import render_light_traced

        img = render_light_traced(scene, spp=SPP, seed=12)
    else:
        from tungsten_tpu.renderer.render import render_bdpt

        img = render_bdpt(scene, spp=SPP, seed=13)
    np.save(out, np.asarray(img))
    ref_p = f"/tmp/bdpt_dbg_pt_b{MAX_BOUNCES}_f{int(FOG)}.npy"
    line = f"{tag}: mean={np.asarray(img).mean():.5f}"
    if fam != "pt" and os.path.exists(ref_p):
        ref = np.load(ref_p)
        img = np.asarray(img)
        mask = ref.max(-1) > 1e-3
        r = img[mask] / np.maximum(ref[mask], 1e-9)
        line += (
            f"  vs PT: median={np.median(r):.4f} mean_ratio="
            f"{img[mask].mean() / ref[mask].mean():.4f}"
        )
    print(line)


if __name__ == "__main__":
    main()
