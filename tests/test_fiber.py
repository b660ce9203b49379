"""Fiber BCSDFs (models/bsdfs/{lambertian_fiber,rough_wire}.py vs
LambertianFiberBcsdf.cpp / RoughWireBcsdf.cpp semantics): white furnace,
pdf normalization, sample/pdf/eval consistency, rotation invariance."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.models.bsdfs import lambertian_fiber as lf
from tungsten_tpu.models.bsdfs import rough_wire as rw
from tungsten_tpu.models.bsdfs.dispatch import N_PARAMS


def _dirs(n, rng):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))


def _wi(n, vec):
    v = np.asarray(vec, np.float32)
    return jnp.broadcast_to(jnp.asarray(v / np.linalg.norm(v)), (n, 3))


def test_lambertian_fiber_white_furnace():
    """The closed-form Lambertian cylinder conserves energy exactly:
    the sphere integral of eval equals the albedo."""
    rng = np.random.default_rng(10)
    n = 400_000
    params = jnp.zeros((n, N_PARAMS), jnp.float32)
    albedo = jnp.ones((n, 3), jnp.float32)
    wi = _wi(n, [0.2, 0.5, 0.6])
    wo = _dirs(n, rng)
    f = np.asarray(lf.eval(None, params, albedo, None, wi, wo))
    integral = f.mean(0) * 4.0 * np.pi
    np.testing.assert_allclose(integral, 1.0, atol=0.02)


def test_lambertian_fiber_sample_consistency():
    rng = np.random.default_rng(11)
    n = 8192
    params = jnp.zeros((n, N_PARAMS), jnp.float32)
    albedo = jnp.full((n, 3), 0.7, jnp.float32)
    wi = _dirs(n, rng)
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    bs = lf.sample(None, params, albedo, None, wi, u2, u1)
    ok = np.asarray(bs.valid)
    assert ok.mean() > 0.95
    p_check = np.asarray(lf.pdf(None, params, albedo, None, wi, bs.wo))
    np.testing.assert_allclose(np.asarray(bs.pdf)[ok], p_check[ok], rtol=1e-4)
    # weight must equal eval/pdf (here exactly the albedo)
    f = np.asarray(lf.eval(None, params, albedo, None, wi, bs.wo))
    np.testing.assert_allclose(
        np.asarray(bs.weight)[ok],
        (f / np.maximum(p_check[:, None], 1e-20))[ok],
        rtol=1e-3,
        atol=1e-5,
    )
    assert np.allclose(np.linalg.norm(np.asarray(bs.wo), axis=1)[ok], 1.0, atol=1e-4)


def test_lambertian_fiber_rotation_invariant():
    """eval must depend only on the wo-wi azimuth difference (tube frames
    have arbitrary azimuth, unlike the reference's ribbon frames)."""
    n = 256
    rng = np.random.default_rng(12)
    params = jnp.zeros((n, N_PARAMS), jnp.float32)
    albedo = jnp.ones((n, 3), jnp.float32)
    wi = _dirs(n, rng)
    wo = _dirs(n, rng)
    a = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    def r(v):
        return jnp.asarray(np.asarray(v) @ rot.T)

    f0 = np.asarray(lf.eval(None, params, albedo, None, wi, wo))
    f1 = np.asarray(lf.eval(None, params, albedo, None, r(wi), r(wo)))
    np.testing.assert_allclose(f0, f1, rtol=1e-4, atol=1e-6)


def _wire_params(n, roughness=0.3):
    p = np.zeros((n, N_PARAMS), np.float32)
    p[:, 0:3] = [0.200438, 0.924033, 1.10221]  # Cu
    p[:, 3:6] = [3.91295, 2.45285, 2.14219]
    p[:, 6] = (roughness * np.pi / 2) ** 2
    return jnp.asarray(p)


def test_rough_wire_pdf_normalizes():
    """MC integral of pdf over the sphere ~ 1 (N and M are each normalized
    densities in phi and sin(theta))."""
    rng = np.random.default_rng(13)
    n = 400_000
    params = _wire_params(n)
    wi = _wi(n, [0.1, 0.3, 0.9])
    wo = _dirs(n, rng)
    p = np.asarray(rw.pdf(None, params, None, None, wi, wo))
    assert np.all(np.isfinite(p)) and np.all(p >= 0)
    integral = p.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_rough_wire_sample_consistency():
    """sample pdf == pdf(), weight == eval/pdf — including the corrected
    phi = 2*gamma mirror azimuth (the reference's own sample disagrees
    with its N pdf by the half-angle jacobian; ours must not)."""
    rng = np.random.default_rng(14)
    n = 8192
    params = _wire_params(n, roughness=0.4)
    albedo = jnp.ones((n, 3), jnp.float32)
    wi = _dirs(n, rng)
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    bs = rw.sample(None, params, albedo, None, wi, u2, u1)
    ok = np.asarray(bs.valid)
    assert ok.mean() > 0.9
    p_check = np.asarray(rw.pdf(None, params, albedo, None, wi, bs.wo))
    np.testing.assert_allclose(np.asarray(bs.pdf)[ok], p_check[ok], rtol=2e-3)
    f = np.asarray(rw.eval(None, params, albedo, None, wi, bs.wo))
    np.testing.assert_allclose(
        np.asarray(bs.weight)[ok],
        (f / np.maximum(p_check[:, None], 1e-20))[ok],
        rtol=2e-3,
        atol=1e-5,
    )
    assert np.allclose(np.linalg.norm(np.asarray(bs.wo), axis=1)[ok], 1.0, atol=1e-4)


def test_rough_wire_azimuth_histogram_matches_N():
    """The sampled azimuthal deflection's histogram must follow
    N(cos phi) = 0.25 cos(phi/2) — pins the phi = 2*gamma fix."""
    rng = np.random.default_rng(15)
    n = 400_000
    params = _wire_params(n, roughness=0.2)
    albedo = jnp.ones((n, 3), jnp.float32)
    wi = _wi(n, [0.0, 0.2, np.sqrt(0.96)])
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    bs = rw.sample(None, params, albedo, None, wi, u2, u1)
    wo = np.asarray(bs.wo)
    wiv = np.asarray(wi)
    phi = np.arctan2(wo[:, 0], wo[:, 2]) - np.arctan2(wiv[:, 0], wiv[:, 2])
    phi = (phi + np.pi) % (2 * np.pi) - np.pi  # wrap to (-pi, pi]
    hist, edges = np.histogram(phi, bins=32, range=(-np.pi, np.pi), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    expect = 0.25 * np.cos(centers / 2)
    np.testing.assert_allclose(hist, expect, rtol=0.06, atol=0.004)


def test_fiber_scene_end_to_end(tmp_path):
    """Both fiber BCSDFs shade tessellated curve tubes through the full
    path tracer (the fiber-tangent frame path in _shading_frame)."""
    from test_curves import _write_hair
    from tungsten_tpu.scene.load import parse_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.renderer.render import render_buffers

    p = str(tmp_path / "t.hair")
    _write_hair(p)
    doc = parse_scene({
        "bsdfs": [
            {"name": "f", "albedo": 0.8, "type": "lambertian_fiber"},
            {"name": "w", "albedo": 1, "type": "rough_wire",
             "material": "Au", "roughness": 0.2},
        ],
        "primitives": [
            {"type": "curves", "file": p, "mode": "bcsdf_cylinder",
             "curve_thickness": 0.02, "bsdf": "f"},
            {"type": "curves", "file": p, "mode": "bcsdf_cylinder",
             "curve_thickness": 0.02, "bsdf": "w",
             "transform": {"position": [0.5, 0, 0]}},
            {"type": "quad", "transform": {"scale": 8},
             "bsdf": {"type": "lambert", "albedo": 0.4}},
            {"type": "point", "transform": {"position": [1, 2, 1]},
             "power": 60},
        ],
        "camera": {"resolution": [48, 36], "tonemap": "linear",
                   "transform": {"position": [0.3, 0.6, 2.0],
                                  "look_at": [0.3, 0.5, 0], "up": [0, 1, 0]},
                   "fov": 30, "type": "pinhole"},
        "integrator": {"type": "path_tracer", "max_bounces": 3},
        "renderer": {"spp": 8},
    }, path=str(tmp_path))
    scene = flatten_scene(doc)
    img = render_buffers(scene, spp=8, samples_per_pass=1).color()
    assert img.max() > 0.01 and np.isfinite(img).all()


def test_rough_wire_energy_bounded():
    """Sphere integral of eval <= 1 (Fresnel < 1) and well above zero."""
    rng = np.random.default_rng(16)
    n = 200_000
    params = _wire_params(n)
    albedo = jnp.ones((n, 3), jnp.float32)
    wi = _wi(n, [0.3, -0.1, 0.8])
    wo = _dirs(n, rng)
    f = np.asarray(rw.eval(None, params, albedo, None, wi, wo))
    integral = f.mean(0) * 4.0 * np.pi
    assert np.all(integral < 1.02), integral
    assert np.all(integral > 0.2), integral
