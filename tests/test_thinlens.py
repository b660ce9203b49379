"""Thinlens completeness (ThinlensCamera.cpp:55-124, 206-217): aperture
textures (disk/blade/bitmap), cat-eye diaphragm vignetting, focus_pivot."""
import json
import tempfile

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.load import load_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.models.cameras.pinhole import _sample_aperture, camera_rays_w


def _scene(cam_extra=None, prims=None):
    doc = {
        "media": [],
        "bsdfs": [{"name": "white", "albedo": 0.7, "type": "lambert"}],
        "primitives": (prims or []) + [
            {"name": "floor", "transform": {"scale": 8.0}, "type": "quad",
             "bsdf": "white"},
        ],
        "camera": {
            "tonemap": "linear", "resolution": [32, 24],
            "reconstruction_filter": "box",
            "transform": {"position": [0, 1.0, 4.0], "look_at": [0, 0.5, 0],
                          "up": [0, 1, 0]},
            "type": "thinlens", "fov": 40,
            "aperture_size": 0.2, "focus_distance": 2.0,
            **(cam_extra or {}),
        },
        "integrator": {"type": "path_tracer", "min_bounces": 0,
                       "max_bounces": 2},
        "renderer": {"spp": 4, "scene_bvh": True},
    }
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(doc, f)
    f.close()
    return flatten_scene(load_scene(f.name))


def _u2(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))


def test_disk_aperture_default():
    s = _scene()
    assert s.meta.aperture_kind == "disk"
    a = np.asarray(_sample_aperture(s.camera, s.meta, _u2()))
    r = np.linalg.norm(a - 0.5, axis=-1)
    assert np.all(r <= 0.5 + 1e-6)
    # uniform over the disk: mean radius of uniform disk = 2/3 * R
    assert abs(r.mean() - (2.0 / 3.0) * 0.5) < 0.01


def test_blade_aperture_polygon():
    """Blade samples lie inside the regular N-gon inscribed in the unit
    circle and fill it uniformly (BladeTexture.cpp:103-124: N fan triangles
    with barycentric warp)."""
    s = _scene({"aperture": {"type": "blade", "blades": 5, "angle": 0.3}})
    assert s.meta.aperture_kind == "blade" and s.meta.ap_blades == 5
    a = np.asarray(_sample_aperture(s.camera, s.meta, _u2())) * 2.0 - 1.0
    r = np.linalg.norm(a, axis=-1)
    assert np.all(r <= 1.0 + 1e-5)
    # polygon half-plane test for every edge of the pentagon (vertices at
    # angle + k*2pi/5 on the unit circle)
    ang = 0.3 + np.arange(6) * (2 * np.pi / 5)
    vx, vy = np.cos(ang), np.sin(ang)
    for k in range(5):
        ex, ey = vx[k + 1] - vx[k], vy[k + 1] - vy[k]
        # inside = left of each edge (ccw polygon)
        cross = ex * (a[:, 1] - vy[k]) - ey * (a[:, 0] - vx[k])
        assert np.all(cross >= -1e-4), (k, cross.min())
    # uniform coverage: centroid ~ 0
    assert np.abs(a.mean(0)).max() < 0.02


def test_bitmap_aperture_importance():
    """A bitmap aperture with a bright quadrant concentrates lens samples
    there (BitmapTexture sampling via Distribution2D)."""
    import tungsten_tpu.io.imageio as iio

    img = np.zeros((16, 16, 3), np.float32)
    img[:8, 8:] = 1.0  # top-right quadrant (rows = top-down)
    f = tempfile.NamedTemporaryFile(suffix=".pfm", delete=False)
    f.close()
    iio.save_image(f.name, img)
    s = _scene({"aperture": f.name})
    assert s.meta.aperture_kind == "bitmap"
    a = np.asarray(_sample_aperture(s.camera, s.meta, _u2()))
    # u right, v: v=1 - row/h -> bright rows [0,8) map to v in (0.5, 1]
    assert np.all(a[:, 0] >= 0.5 - 1e-5)
    assert np.all(a[:, 1] >= 0.5 - 1e-5)


def test_cateye_vignettes_corners():
    """cateye > 0 kills rays whose projected diaphragm point leaves the
    aperture: corner pixels lose throughput, the image center keeps it
    (ThinlensCamera.cpp:119-124)."""
    s = _scene({"cateye": 1.0})
    assert s.meta.cateye == 1.0
    n = 1024
    rng = np.random.default_rng(1)
    uf = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    ul = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    px_c = jnp.full((n,), 16, jnp.int32)
    py_c = jnp.full((n,), 12, jnp.int32)
    px_e = jnp.zeros((n,), jnp.int32)
    py_e = jnp.zeros((n,), jnp.int32)
    _, _, w_c = camera_rays_w(s.camera, s.meta, px_c, py_c, uf, ul)
    _, _, w_e = camera_rays_w(s.camera, s.meta, px_e, py_e, uf, ul)
    assert float(jnp.mean(w_c)) > float(jnp.mean(w_e))
    assert float(jnp.mean(w_e)) < 0.9  # corners measurably vignetted
    s0 = _scene()  # no cateye: nothing vignetted anywhere
    _, _, w0 = camera_rays_w(s0.camera, s0.meta, px_e, py_e, uf, ul)
    assert float(jnp.min(w0)) == 1.0


def test_focus_pivot_sets_focus_distance():
    """focus_pivot: focus distance = |pivot transform origin - camera pos|
    (ThinlensCamera.cpp:206-217)."""
    ball = {"name": "ball", "type": "cube", "bsdf": "white",
            "transform": {"position": [0.0, 0.5, -1.0], "scale": 0.3}}
    s = _scene({"focus_pivot": "ball"}, prims=[ball])
    expect = np.linalg.norm(np.asarray([0, 0.5, -1.0]) - np.asarray([0, 1.0, 4.0]))
    assert abs(float(s.camera.focus_dist) - expect) < 1e-5
    # without the pivot the JSON focus_distance stands
    s2 = _scene()
    assert abs(float(s2.camera.focus_dist) - 2.0) < 1e-6
