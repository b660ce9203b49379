"""Analytic sphere/disk/cylinder primitives: exact intersection vs closed
form, spherical-cap direct sampling (Sphere.cpp:173-227), samplePosition
measure checks, and render parity against the tessellated fallback."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models.primitives import analytic as A


def _table(entries):
    return A.build_table([A.extract_params(t, m, prm) for t, m, prm in entries])


def _mat(pos=(0, 0, 0), scale=1.0, rot_deg=None):
    m = np.eye(4)
    if np.ndim(scale) == 0:
        scale = [scale] * 3
    m[:3, :3] = np.diag(scale)
    if rot_deg is not None:
        a = np.deg2rad(rot_deg)
        rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
        m[:3, :3] = rx @ m[:3, :3]
    m[:3, 3] = pos
    return m


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_sphere_intersect_closed_form(rng):
    c = np.array([0.3, -0.2, 1.5])
    r = 0.8
    ana = _table([("sphere", _mat(c, r), {})])
    n = 4096
    o = rng.normal(size=(n, 3)) * 3.0
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h = A.intersect_analytic(
        ana, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.full((n,), 1e-4, jnp.float32), jnp.full((n,), 1e30, jnp.float32))
    # float64 closed form
    oc = o - c
    B = np.sum(oc * d, -1)
    C = np.sum(oc * oc, -1) - r * r
    det2 = B * B - C
    t0 = -B - np.sqrt(np.maximum(det2, 0))
    t1 = -B + np.sqrt(np.maximum(det2, 0))
    t_ref = np.where((det2 >= 0) & (t0 > 1e-4), t0,
                     np.where((det2 >= 0) & (t1 > 1e-4), t1, np.inf))
    hit_ref = np.isfinite(t_ref)
    got = np.asarray(h.k) >= 0
    # tolerate boundary-grazing disagreements only
    disagree = got != hit_ref
    graze = np.abs(det2) < 1e-3
    assert np.all(~disagree | graze)
    both = got & hit_ref
    assert np.allclose(np.asarray(h.t)[both], t_ref[both], rtol=2e-3, atol=2e-4)
    # normals unit + on-surface
    p = o[both] + np.asarray(h.t)[both, None] * d[both]
    assert np.allclose(np.linalg.norm(p - c, axis=-1), r, atol=2e-3)
    ng = np.asarray(A.normal_at(
        ana, jnp.asarray(np.asarray(h.k)[both]), jnp.asarray(p, jnp.float32)))
    assert np.allclose(ng, (p - c) / r, atol=2e-3)


def test_disk_cylinder_intersect(rng):
    ana = _table([
        ("disk", _mat((0, 1, 0), 1.0, rot_deg=20.0), {}),
        ("cylinder", _mat((3, 0, 0), [0.5, 2.0, 0.5]), {"capped": True}),
    ])
    n = 4096
    o = rng.normal(size=(n, 3)) * 4.0
    # aim at one of the two prims (with jitter) so hits are plentiful
    target = np.where(rng.random((n, 1)) < 0.5,
                      np.array([[0.0, 1.0, 0.0]]), np.array([[3.0, 0.0, 0.0]]))
    d = target + rng.normal(size=(n, 3)) * 0.4 - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h = A.intersect_analytic(
        ana, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.full((n,), 1e-4, jnp.float32), jnp.full((n,), 1e30, jnp.float32))
    k = np.asarray(h.k)
    t = np.asarray(h.t)
    hit = k >= 0
    assert hit.sum() > 500
    p = o + t[:, None] * d
    # disk hits lie on the plane within radius
    nrm = np.asarray(ana.axis)[0]
    dsel = hit & (k == 0)
    assert np.allclose(np.sum((p[dsel] - [0, 1, 0]) * nrm, -1), 0.0, atol=1e-3)
    assert np.all(np.linalg.norm(p[dsel] - [0, 1, 0], axis=-1) <= 1.0 + 1e-3)
    # cylinder hits: radial distance r or on a cap
    csel = hit & (k == 1)
    q = p[csel] - [3, 0, 0]
    rad = np.hypot(q[:, 0], q[:, 2])
    on_cap = np.abs(np.abs(q[:, 1]) - 1.0) < 1e-3
    assert np.all(on_cap | (np.abs(rad - 0.25) < 1e-3))
    assert np.all(np.abs(q[:, 1]) <= 1.0 + 1e-3)
    # normals face the incoming ray for first hits from outside
    ng = np.asarray(A.normal_at(ana, jnp.asarray(k), jnp.asarray(p, jnp.float32)))
    far_out = hit & (np.linalg.norm(o, axis=-1) > 3.0)


def test_sphere_cap_direct_sampling(rng):
    """sampleDirect: every direction hits the sphere, dist matches the near
    intersection, and E[1/pdf] = the subtended cap solid angle."""
    c = np.array([0.0, 2.0, 0.0])
    r = 0.7
    ana = _table([("sphere", _mat(c, r), {})])
    n = 8192
    p = np.tile(np.array([[0.0, 0.0, 0.0]]), (n, 1)).astype(np.float32)
    u2 = rng.random((n, 2)).astype(np.float32)
    u1 = rng.random(n).astype(np.float32)
    k = jnp.zeros((n,), jnp.int32)
    d, dist, pdf, uv, valid = A.sample_direct(ana, k, jnp.asarray(p), jnp.asarray(u2), jnp.asarray(u1))
    d, dist, pdf, valid = map(np.asarray, (d, dist, pdf, valid))
    assert valid.all()
    # all rays hit the sphere at dist
    hp = p + d * dist[:, None]
    assert np.allclose(np.linalg.norm(hp - c, axis=-1), r, atol=2e-3)
    # pdf: uniform cap => E[1/pdf] = cap solid angle = 2 pi (1 - cos_max)
    dc = np.linalg.norm(c)
    cos_max = np.sqrt(dc * dc - r * r) / dc
    omega = 2 * np.pi * (1 - cos_max)
    assert np.allclose(np.mean(1.0 / pdf), omega, rtol=1e-6)
    # inside the sphere -> invalid
    pin = np.tile(c, (8, 1)).astype(np.float32)
    _, _, _, _, v2 = A.sample_direct(
        ana, jnp.zeros((8,), jnp.int32), jnp.asarray(pin),
        jnp.asarray(rng.random((8, 2)), jnp.float32),
        jnp.asarray(rng.random(8), jnp.float32))
    assert not np.asarray(v2).any()
    # direct_pdf at a bsdf-strategy hit equals the cap pdf
    pdf2 = np.asarray(A.direct_pdf(
        ana, k, jnp.asarray(p), jnp.asarray(hp, jnp.float32), jnp.asarray(d)))
    assert np.allclose(pdf2, pdf, rtol=1e-5)


@pytest.mark.parametrize("ptype,m,prm,area", [
    ("sphere", _mat((1, 2, 3), 0.6), {}, 4 * np.pi * 0.36),
    ("disk", _mat((0, 1, 0), 1.5, rot_deg=40.0), {}, np.pi * 1.5 ** 2),
    ("cylinder", _mat((0, 0, 0), [0.8, 2.0, 0.8]), {"capped": True},
     2 * np.pi * 0.4 * 2.0 + 2 * np.pi * 0.16),
])
def test_sample_position_measure(rng, ptype, m, prm, area):
    """samplePosition: pdf = 1/area, points on the surface, normals unit."""
    ana = _table([(ptype, m, prm)])
    assert np.isclose(float(ana.area[0]), area, rtol=1e-5)
    n = 4096
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    k = jnp.zeros((n,), jnp.int32)
    p, ng, uv, pdf = A.sample_position(ana, k, u2, u1)
    p, ng, pdf = map(np.asarray, (p, ng, pdf))
    assert np.allclose(pdf, 1.0 / area, rtol=1e-5)
    assert np.allclose(np.linalg.norm(ng, axis=-1), 1.0, atol=1e-4)
    # points on surface: re-evaluate the implicit
    if ptype == "sphere":
        assert np.allclose(np.linalg.norm(p - m[:3, 3], axis=-1), 0.6, atol=1e-3)
    elif ptype == "disk":
        nrm = np.asarray(ana.axis)[0]
        assert np.allclose(np.sum((p - m[:3, 3]) * nrm, -1), 0.0, atol=1e-3)
    else:
        q = p - m[:3, 3]
        rad = np.hypot(q[:, 0], q[:, 2])
        on_cap = np.abs(np.abs(q[:, 1]) - 1.0) < 1e-3
        assert np.all(on_cap | (np.abs(rad - 0.4) < 2e-3))


def _scene_json(tmp, emitter="sphere"):
    doc = {
        "media": [],
        "bsdfs": [
            {"name": "white", "type": "lambert", "albedo": 0.7},
            {"name": "emit", "type": "null", "albedo": 0.0},
        ],
        "primitives": [
            {"type": "quad", "bsdf": "white",
             "transform": {"position": [0, 0, 0], "scale": [10, 1, 10]}},
            {"type": "sphere", "bsdf": "white",
             "transform": {"position": [0, 1, 0], "scale": 1.0}},
            {"type": "cylinder", "bsdf": "white",
             "transform": {"position": [-2.2, 1, 0], "scale": [0.6, 1.2, 0.6]}},
            {"type": "disk", "bsdf": "white",
             "transform": {"position": [2.2, 1.0, 0], "rotation": [60, 0, 0]}},
            {"type": emitter, "bsdf": "emit", "emission": 14.0,
             "transform": {"position": [0, 4.2, 1.0], "scale": 0.5}},
        ],
        "camera": {"type": "pinhole", "tonemap": "linear", "fov": 60,
                   "resolution": [80, 60],
                   "transform": {"position": [0, 2.2, 6], "look_at": [0, 1, 0],
                                 "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 5,
                       "enable_light_sampling": True},
        "renderer": {"spp": 32, "spp_step": 32},
    }
    path = os.path.join(tmp, "scene.json")
    json.dump(doc, open(path, "w"))
    return path


def _render(path, seed=3):
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.renderer.render import render_scene

    out = render_scene(load_scene(path), seed=seed)
    img = out[0] if isinstance(out, tuple) else out
    return np.asarray(img)


def test_render_parity_vs_tessellated(tmp_path, monkeypatch):
    """Same scene through analytic prims and the round-1..3 tessellation:
    images agree to tessellation error (the meshes are 32-subdiv approximations,
    so compare means, not pixels)."""
    path = _scene_json(str(tmp_path))
    img_a = _render(path)
    monkeypatch.setenv("TUNGSTEN_TESSELLATE", "1")
    img_t = _render(path)
    monkeypatch.delenv("TUNGSTEN_TESSELLATE")
    assert np.isfinite(img_a).all()
    ma, mt = float(img_a.mean()), float(img_t.mean())
    assert abs(ma - mt) / mt < 0.05, (ma, mt)


def test_sphere_light_nee_unbiased(tmp_path):
    """NEE via the spherical-cap sampler agrees with brute-force path hits
    on the analytic sphere emitter (light sampling on vs off)."""
    path = _scene_json(str(tmp_path))
    doc = json.load(open(path))
    doc["renderer"]["spp"] = 64
    img_on_p = os.path.join(str(tmp_path), "on.json")
    json.dump(doc, open(img_on_p, "w"))
    doc["integrator"]["enable_light_sampling"] = False
    doc["renderer"]["spp"] = 256
    img_off_p = os.path.join(str(tmp_path), "off.json")
    json.dump(doc, open(img_off_p, "w"))
    m_on = float(_render(img_on_p, seed=5).mean())
    m_off = float(_render(img_off_p, seed=9).mean())
    assert abs(m_on - m_off) / m_off < 0.06, (m_on, m_off)
