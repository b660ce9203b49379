"""disk / cylinder / point primitives (Disk.cpp, Cylinder.cpp, Point.cpp)."""
import json
import tempfile

import numpy as np

from tungsten_tpu.scene.load import load_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.renderer.render import render_buffers


def _flatten(prims, bsdfs=None, spp=16, mb=1, res=(32, 24), cam=None):
    doc = {
        "media": [],
        "bsdfs": bsdfs or [{"name": "white", "albedo": 0.5, "type": "lambert"}],
        "primitives": prims,
        "camera": cam or {
            "tonemap": "linear", "resolution": list(res),
            "reconstruction_filter": "box",
            "transform": {"position": [0, 1.2, 2.5], "look_at": [0, 0.0, 0],
                          "up": [0, 1, 0]},
            "type": "pinhole", "fov": 45,
        },
        "integrator": {"type": "path_tracer", "min_bounces": 0, "max_bounces": mb,
                       "enable_light_sampling": True,
                       "enable_two_sided_shading": True},
        "renderer": {"spp": spp, "scene_bvh": True},
    }
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(doc, f)
    f.close()
    return flatten_scene(load_scene(f.name))


def test_point_light_analytic():
    """Direct lighting from a dirac point light matches albedo/pi * I cos/r^2
    (Point.cpp:98-106 sampleDirect + powerToRadianceFactor = 1/4pi)."""
    power = 40.0
    scene = _flatten([
        {"name": "floor", "transform": {"scale": 20.0}, "type": "quad",
         "bsdf": "white"},
        {"name": "lamp", "transform": {"position": [0.0, 1.0, 0.0]},
         "power": power, "type": "point"},
    ], spp=8, mb=2, res=(48, 36))
    bufs = render_buffers(scene, spp=8, samples_per_pass=1)
    img = bufs.color()
    # trace the center pixel's floor point analytically: camera at (0,1.2,2.5)
    # looking at origin; center ray hits the floor near z ~ 0; instead of
    # solving the exact hit, check a robust integral identity: total outgoing
    # radiosity over the lit floor region equals albedo * received flux /
    # (pi) spread -- simpler: the brightest pixel must be under the lamp and
    # equal albedo/pi * I / d^2 within noise where d is the lamp height.
    i = np.unravel_index(np.argmax(img.mean(-1)), img.shape[:2])
    intensity = power / (4.0 * np.pi)
    # brightest visible point is close to directly under the lamp: r=1, cos=1
    expect = 0.5 / np.pi * intensity * 1.0
    got = img[i].mean()
    assert abs(got / expect - 1.0) < 0.25, (got, expect)


def test_disk_light_cone():
    """A disk light with a narrow cone only illuminates points inside the
    cone (Disk.cpp:186-189 sampleDirect apex rejection + backSide)."""
    def scene_with(ca):
        return _flatten([
            {"name": "floor", "transform": {"scale": 20.0}, "type": "quad",
             "bsdf": "white"},
            {"name": "lamp",
             "transform": {"position": [0.0, 1.0, 0.0],
                            "rotation": [180.0, 0.0, 0.0], "scale": 0.3},
             "emission": 30, "type": "disk", "cone_angle": ca,
             "bsdf": {"type": "null", "albedo": 1}},
        ], spp=32, mb=2, res=(48, 36))

    wide = render_buffers(scene_with(90.0), spp=32, samples_per_pass=1).color()
    narrow = render_buffers(scene_with(15.0), spp=32, samples_per_pass=1).color()
    # narrow cone: a small spot under the lamp keeps light, the rest goes dark
    assert narrow.max() > 0.01
    assert narrow.mean() < 0.35 * wide.mean()
    # inside the spot the two agree (same radiance, just gated)
    iy, ix = np.unravel_index(np.argmax(narrow.mean(-1)), narrow.shape[:2])
    ratio = narrow[iy, ix].mean() / max(wide[iy, ix].mean(), 1e-9)
    assert abs(ratio - 1.0) < 0.3, ratio


def test_cylinder_renders():
    scene = _flatten([
        {"name": "floor", "transform": {"scale": 20.0}, "type": "quad",
         "bsdf": "white"},
        {"name": "cyl", "transform": {"position": [0, 0.4, 0],
                                       "scale": [0.5, 0.8, 0.5]},
         "type": "cylinder", "bsdf": "white"},
        {"name": "lamp", "transform": {"position": [1.5, 2.0, 1.0]},
         "power": 100, "type": "point"},
    ], spp=8, mb=2, res=(48, 36))
    # cylinders are analytic since round 4 (Cylinder.cpp:55-116 semantics);
    # only the floor quad is triangulated
    assert scene.ana is not None and scene.ana.n == 1
    assert int(np.asarray(scene.ana.ptype)[0]) == 2  # CYLINDER
    img = render_buffers(scene, spp=8, samples_per_pass=1).color()
    assert img.max() > 0.01 and np.isfinite(img).all()


def test_instances_expand():
    """"instances" primitives expand to master copies with composed
    transforms at load (Instance.cpp:60-93)."""
    from tungsten_tpu.scene.load import parse_scene

    doc = parse_scene({
        "bsdfs": [{"name": "w", "albedo": 0.5, "type": "lambert"}],
        "primitives": [
            {"type": "instances",
             "masters": [{"type": "cube", "bsdf": "w",
                          "transform": {"scale": 0.5}}],
             "instances": [{"id": 0, "transform": {"position": [i * 2.0, 0, 0]}}
                            for i in range(4)]},
        ],
        "camera": {"resolution": [8, 8],
                   "transform": {"position": [0, 3, 6], "look_at": [0, 0, 0],
                                  "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 2},
        "renderer": {"spp": 1},
    })
    scene = flatten_scene(doc)
    assert scene.tris.v0.shape[0] == 48  # 4 cubes x 12 tris
    v0 = np.asarray(scene.tris.v0)
    assert v0[:, 0].max() > 5.5 and v0[:, 0].min() < 0.0
