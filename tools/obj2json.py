#!/usr/bin/env python
"""OBJ -> scene.json + .wo3 converter — the analog of src/obj2json."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("obj")
    ap.add_argument("json_out")
    args = ap.parse_args()

    from tungsten_tpu.io.meshio import load_obj, save_wo3

    mesh = load_obj(args.obj)
    stem = os.path.splitext(os.path.basename(args.obj))[0]
    wo3 = os.path.join(os.path.dirname(args.json_out) or ".", stem + ".wo3")
    save_wo3(wo3, mesh)

    scene = {
        "bsdfs": [{"name": stem, "type": "lambert", "albedo": 0.8}],
        "primitives": [
            {"type": "mesh", "file": os.path.basename(wo3), "bsdf": stem, "smooth": True}
        ],
        "camera": {
            "type": "pinhole",
            "tonemap": "gamma",
            "resolution": [1000, 563],
            "fov": 60,
            "transform": {"position": [0, 0, 4], "look_at": [0, 0, 0], "up": [0, 1, 0]},
        },
        "integrator": {"type": "path_tracer", "min_bounces": 0, "max_bounces": 16},
        "renderer": {"spp": 32, "output_file": stem + ".png"},
    }
    with open(args.json_out, "w") as f:
        json.dump(scene, f, indent=4)
    print(f"wrote {args.json_out} + {wo3} ({len(mesh.indices)} tris)")


if __name__ == "__main__":
    main()
