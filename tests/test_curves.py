"""Curves primitive + strand file IO (Curves.cpp, CurveIO.cpp)."""
import struct

import numpy as np

from tungsten_tpu.io.curveio import load_hair
from tungsten_tpu.models.primitives.tessellate import curve_tubes
from tungsten_tpu.scene.load import parse_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.renderer.render import render_buffers


def _write_hair(path, n_curves=3, pts_per=5, thickness=0.02):
    n_nodes = n_curves * pts_per
    segs = np.full(n_curves, pts_per - 1, "<u2")
    pts = np.zeros((n_nodes, 3), "<f4")
    for c in range(n_curves):
        sl = slice(c * pts_per, (c + 1) * pts_per)
        pts[sl, 0] = c * 0.2
        pts[sl, 1] = np.linspace(0, 1, pts_per)
        pts[sl, 2] = np.sin(np.linspace(0, 2, pts_per)) * 0.1
    hdr = (
        b"HAIR"
        + struct.pack("<IIII", n_curves, n_nodes, 0x1 | 0x2, pts_per - 1)
        + struct.pack("<ff", thickness, 1.0)
        + struct.pack("<fff", 1, 1, 1)
        + b"\0" * 88
    )
    with open(path, "wb") as f:
        f.write(hdr + segs.tobytes() + pts.tobytes())


def test_hair_io(tmp_path):
    p = str(tmp_path / "t.hair")
    _write_hair(p)
    ends, nodes = load_hair(p)
    assert list(ends) == [5, 10, 15]
    assert nodes.shape == (15, 4)
    assert np.allclose(nodes[:, 3], 0.01)  # radius = thickness/2


def test_curve_tube_tessellation():
    ends = np.array([5], np.uint32)
    nodes = np.zeros((5, 4), np.float32)
    nodes[:, 1] = np.linspace(0, 1, 5)
    nodes[:, 3] = 0.05
    s = curve_tubes(ends, nodes, sides=3, taper=True)
    assert s.indices.shape[0] == 4 * 3 * 2
    r = np.linalg.norm(s.pos[:3, [0, 2]], axis=1)
    assert np.allclose(r, 0.05, atol=1e-5)  # root ring at full radius
    r_tip = np.linalg.norm(s.pos[-3:][:, [0, 2]], axis=1)
    assert (r_tip < 0.002).all()  # tapered tip


def test_curves_scene_end_to_end(tmp_path):
    p = str(tmp_path / "t.hair")
    _write_hair(p)
    doc = parse_scene({
        "bsdfs": [{"name": "h", "albedo": 1, "type": "hair",
                    "melanin_concentration": 1.3, "melanin_ratio": 1,
                    "roughness": 0.3}],
        "primitives": [
            {"type": "curves", "file": p, "mode": "bcsdf_cylinder",
             "curve_thickness": 0.02, "bsdf": "h"},
            {"type": "quad", "transform": {"scale": 8},
             "bsdf": {"type": "lambert", "albedo": 0.4}},
            {"type": "point", "transform": {"position": [1, 2, 1]}, "power": 60},
        ],
        "camera": {"resolution": [48, 36], "tonemap": "linear",
                   "transform": {"position": [0.2, 0.6, 2.0],
                                  "look_at": [0.2, 0.5, 0], "up": [0, 1, 0]},
                   "fov": 30, "type": "pinhole"},
        "integrator": {"type": "path_tracer", "max_bounces": 3},
        "renderer": {"spp": 8},
    }, path=str(tmp_path))
    scene = flatten_scene(doc)
    assert scene.tris.v0.shape[0] > 70
    img = render_buffers(scene, spp=8, samples_per_pass=1).color()
    assert img.max() > 0.01 and np.isfinite(img).all()
