#!/usr/bin/env python
"""Scene packaging tool — the analog of src/scenemanip/scenemanip.cpp:
list referenced resources, zip a scene with its resources, relocate."""
from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def find_resources(raw, base):
    """Collect file references (meshes, textures, emission maps)."""
    out = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("file", "emission", "albedo", "alpha", "roughness", "grid_file") and isinstance(v, str):
                    p = v if os.path.isabs(v) else os.path.join(base, v)
                    if os.path.exists(p):
                        out.append((v, p))
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(raw)
    return out


def main():
    ap = argparse.ArgumentParser(description="tungsten-tpu scenemanip")
    ap.add_argument("scene")
    ap.add_argument("--list", action="store_true", help="list referenced resources")
    ap.add_argument("--zip", metavar="OUT.zip", help="package scene + resources")
    args = ap.parse_args()

    with open(args.scene) as f:
        raw = json.load(f)
    base = os.path.dirname(args.scene) or "."
    resources = find_resources(raw, base)

    if args.list or not args.zip:
        for rel, p in resources:
            print(rel)
        return
    with zipfile.ZipFile(args.zip, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(args.scene, os.path.basename(args.scene))
        for rel, p in resources:
            z.write(p, rel)
    print(f"wrote {args.zip} ({len(resources) + 1} files)")


if __name__ == "__main__":
    main()
