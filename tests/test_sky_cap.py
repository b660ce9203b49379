"""Skydome + infinite_sphere_cap lights (Skydome.cpp, InfiniteSphereCap.cpp)."""
import json
import tempfile

import numpy as np
import pytest

from tungsten_tpu.scene.load import load_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.renderer.render import render_flat


def _scene(prims, sample):
    infs = []
    if "cap" in prims:
        infs.append({
            "name": "sun", "transform": {"rotation": [40.0, 10.0, 0.0]},
            "emission": 50, "type": "infinite_sphere_cap",
            "sample": sample, "cap_angle": 12,
        })
    if "sky" in prims:
        infs.append({
            "name": "sky", "transform": {"rotation": [40.0, 10.0, 0.0]},
            "type": "skydome", "temperature": 5777, "gamma_scale": 1,
            "turbidity": 3, "intensity": 4, "sample": sample,
        })
    doc = {
        "media": [], "bsdfs": [{"name": "white", "albedo": 0.7, "type": "lambert"}],
        "primitives": infs + [
            {"name": "floor", "transform": {"scale": 4.0}, "type": "quad", "bsdf": "white"},
            {"name": "box", "transform": {"position": [0, 0.3, 0], "scale": 0.6},
             "type": "cube", "bsdf": "white"},
        ],
        "camera": {
            "tonemap": "linear", "resolution": [32, 24],
            "reconstruction_filter": "box",
            "transform": {"position": [2.2, 1.6, 2.2], "look_at": [0, 0.2, 0],
                          "up": [0, 1, 0]},
            "type": "pinhole", "fov": 40,
        },
        "integrator": {"type": "path_tracer", "min_bounces": 0, "max_bounces": 8,
                       "enable_light_sampling": True,
                       "enable_two_sided_shading": True},
        "renderer": {"spp": 16, "scene_bvh": True},
    }
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(doc, f)
    f.close()
    return flatten_scene(load_scene(f.name))


@pytest.mark.parametrize("prims", [("cap",), ("sky",)])
def test_nee_matches_escape(prims):
    """Each infinite light alone: NEE estimator agrees with the pure
    bsdf-sampling/escape estimator (cross-validation of sampling + pdfs)."""
    a = render_flat(_scene(prims, True), spp=196, samples_per_pass=4)
    b = render_flat(_scene(prims, False), spp=196, samples_per_pass=4)
    ratio = float(a.mean()) / max(float(b.mean()), 1e-9)
    assert abs(ratio - 1.0) < 0.08, ratio


def test_sky_bake_orientation():
    """Zenith texel row is bright sky; bottom hemisphere is black except the
    2-row horizon extension (Skydome.cpp:310-311)."""
    from tungsten_tpu.models.primitives.sky import bake_skydome

    img = bake_skydome([0.3, 0.8, 0.1], turbidity=3.0, intensity=4.0)
    assert img.shape == (256, 512, 3)
    assert img[0].mean() > 0.0  # zenith row lit
    assert img[130:].max() == 0.0  # below horizon+extension black
    assert np.allclose(img[128], img[127]) and np.allclose(img[129], img[127])


def test_cap_cone_gating():
    """Cap radiance is emitted only inside the cone and the pdf integrates
    to 1 over the cap solid angle."""
    import jax.numpy as jnp
    from tungsten_tpu.models.primitives import lights as L

    scene = _scene(("cap",), True)
    n = 4096
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rad = np.asarray(L.infinite_radiance(scene, jnp.asarray(d, jnp.float32)))
    in_cone = d @ np.asarray(scene.cap.dir[0]) >= float(scene.cap.cos_angle[0])
    assert np.all((rad.max(-1) > 0) == in_cone)
    # MC integral of pdf over the sphere ~= 1
    pdf = np.asarray(L.cap_direct_pdf_k(scene, jnp.asarray(d, jnp.float32), 0))
    integral = pdf.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.15, integral
