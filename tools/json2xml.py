#!/usr/bin/env python
"""Scene JSON -> Mitsuba XML exporter — the analog of src/json2xml.

Covers the primitive/bsdf subset the reference exporter handles: lambert ->
diffuse, dielectric, conductor families, quads/meshes, pinhole camera."""
from __future__ import annotations

import argparse
import json
import os
import sys
from xml.etree import ElementTree as ET
from xml.dom import minidom

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_BSDF_MAP = {
    "lambert": "diffuse",
    "oren_nayar": "roughdiffuse",
    "dielectric": "dielectric",
    "rough_dielectric": "roughdielectric",
    "conductor": "conductor",
    "rough_conductor": "roughconductor",
    "plastic": "plastic",
    "rough_plastic": "roughplastic",
    "mirror": "conductor",
    "null": "null",
    "smooth_coat": "coating",
    "rough_coat": "roughcoating",
}


def vec_str(v):
    if isinstance(v, (int, float)):
        v = [v, v, v]
    return ", ".join(str(x) for x in v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("xml_out")
    args = ap.parse_args()

    with open(args.scene) as f:
        raw = json.load(f)

    root = ET.Element("scene", version="0.5.0")
    cam = raw.get("camera", {})
    sensor = ET.SubElement(root, "sensor", type="perspective")
    ET.SubElement(sensor, "float", name="fov", value=str(cam.get("fov", 60)))
    tf = cam.get("transform", {})
    lookat = ET.SubElement(sensor, "transform", name="toWorld")
    ET.SubElement(
        lookat, "lookat",
        origin=vec_str(tf.get("position", [0, 0, 0])),
        target=vec_str(tf.get("look_at", [0, 0, -1])),
        up=vec_str(tf.get("up", [0, 1, 0])),
    )
    film = ET.SubElement(sensor, "film", type="hdrfilm")
    res = cam.get("resolution", [1000, 563])
    ET.SubElement(film, "integer", name="width", value=str(res[0]))
    ET.SubElement(film, "integer", name="height", value=str(res[1]))

    for b in raw.get("bsdfs", []):
        mtype = _BSDF_MAP.get(b.get("type", "lambert"), "diffuse")
        el = ET.SubElement(root, "bsdf", type=mtype, id=b.get("name", "bsdf"))
        albedo = b.get("albedo", 0.8)
        if isinstance(albedo, (int, float, list)):
            ET.SubElement(el, "rgb", name="reflectance", value=vec_str(albedo))

    for p in raw.get("primitives", []):
        ptype = p.get("type")
        if ptype == "mesh":
            shape = ET.SubElement(root, "shape", type="obj")
            ET.SubElement(shape, "string", name="filename", value=p.get("file", ""))
        elif ptype in ("quad", "cube", "sphere"):
            mts = {"quad": "rectangle", "cube": "cube", "sphere": "sphere"}[ptype]
            shape = ET.SubElement(root, "shape", type=mts)
        else:
            continue
        if isinstance(p.get("bsdf"), str):
            ET.SubElement(shape, "ref", id=p["bsdf"])
        if "emission" in p:
            em = ET.SubElement(shape, "emitter", type="area")
            ET.SubElement(em, "rgb", name="radiance", value=vec_str(p["emission"]))

    pretty = minidom.parseString(ET.tostring(root)).toprettyxml(indent="    ")
    with open(args.xml_out, "w") as f:
        f.write(pretty)
    print(f"wrote {args.xml_out}")


if __name__ == "__main__":
    main()
