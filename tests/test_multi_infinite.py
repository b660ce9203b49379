"""Multiple environment / sphere-cap lights (the reference's light list is
unbounded, TraceableScene.hpp:79-102; an escaping ray sees the LAST listed
infinite primitive that intersects it, TraceableScene.hpp:194-209 —
intersectInfinites overwrites `data` in list order)."""
import json
import tempfile

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.load import load_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.renderer.render import render_flat
from tungsten_tpu.models.primitives import lights as L


def _scene(infs, nee=True, spp=16):
    doc = {
        "media": [],
        "bsdfs": [{"name": "white", "albedo": 0.7, "type": "lambert"}],
        "primitives": list(infs) + [
            {"name": "floor", "transform": {"scale": 4.0}, "type": "quad",
             "bsdf": "white"},
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
        "integrator": {"type": "path_tracer", "min_bounces": 0,
                       "max_bounces": 6, "enable_light_sampling": nee,
                       "enable_two_sided_shading": True},
        "renderer": {"spp": spp, "scene_bvh": True},
    }
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(doc, f)
    f.close()
    return flatten_scene(load_scene(f.name))


def _env(name, emission, sample=True):
    return {"name": name, "type": "infinite_sphere", "emission": emission,
            "sample": sample}


def _cap(name, rot_x, emission, angle=15.0, sample=True):
    return {"name": name, "type": "infinite_sphere_cap", "emission": emission,
            "transform": {"rotation": [rot_x, 0.0, 0.0]},
            "cap_angle": angle, "sample": sample}


def _sphere_dirs(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                       jnp.float32)


def test_two_envs_flatten_and_escape():
    s = _scene([_env("a", 0.25), _env("b", 0.75)])
    assert s.meta.n_envs == 2 and len(s.envs) == 2
    assert sum(1 for i in s.meta.env_light_idx if i >= 0) == 2
    d = _sphere_dirs()
    # the LAST env masks the first for every escape direction
    rad = np.asarray(L.infinite_radiance(s, d))
    assert np.allclose(rad, 0.75, atol=1e-5)
    wl, e_inf, pdf_inf = L.escape_winner(s, d)
    assert np.all(np.asarray(wl) == s.meta.env_light_idx[1])
    assert np.allclose(np.asarray(e_inf), 0.75, atol=1e-5)
    assert np.allclose(np.asarray(pdf_inf), 1.0 / (4.0 * np.pi), atol=1e-6)


def test_env_nee_samples_each_slot():
    s = _scene([_env("a", 0.25), _env("b", 0.75)])
    li_a, li_b = s.meta.env_light_idx
    n = 64
    u2 = jnp.tile(jnp.asarray([[0.3, 0.6]], jnp.float32), (n, 1))
    ls_a = L.sample_env_direct(s, jnp.full((n,), li_a, jnp.int32), u2)
    ls_b = L.sample_env_direct(s, jnp.full((n,), li_b, jnp.int32), u2)
    assert np.allclose(np.asarray(ls_a.radiance), 0.25, atol=1e-5)
    assert np.allclose(np.asarray(ls_b.radiance), 0.75, atol=1e-5)


def test_last_env_masks_earlier_without_nee():
    """With light sampling off, transport only sees escape radiance — adding
    an earlier env changes nothing (the last env masks it everywhere)."""
    a = np.asarray(render_flat(_scene([_env("a", 0.4), _env("b", 0.6)],
                                      nee=False), spp=8))
    b = np.asarray(render_flat(_scene([_env("b", 0.6)], nee=False), spp=8))
    assert np.allclose(a, b, atol=1e-4), float(np.abs(a - b).max())


def test_earlier_env_adds_energy_via_nee():
    """With NEE on, the earlier env is individually light-sampled and ADDS
    energy on top of the winner. estimateDirect's bsdf strategy intersects
    the CHOSEN light primitive itself (attenuatedEmission ->
    light.intersect, TraceBase.cpp:286-319), so a masked env keeps BOTH MIS
    halves and the full single-light estimate: the gain over the b-only
    render recovers (almost) the whole transport of env a — everything
    except the direct camera-escape view, which still shows only the
    masking winner b."""
    ab = float(np.asarray(render_flat(
        _scene([_env("a", 0.4), _env("b", 0.6)]), spp=256)).mean())
    b = float(np.asarray(render_flat(_scene([_env("b", 0.6)]),
                                     spp=256)).mean())
    a = float(np.asarray(render_flat(_scene([_env("a", 0.4)]),
                                     spp=256)).mean())
    gain = ab - b
    assert gain > 0.5 * a, (ab, b, a)
    assert gain < 1.05 * a, (ab, b, a)


def test_two_caps_superpose():
    """Two samplable caps with disjoint cones: transport is linear in the
    emitters, so render(A+B) = render(A) + render(B) in expectation."""
    ca = _cap("sunA", 30.0, 40.0)
    cb = _cap("sunB", 70.0, 25.0)
    spp = 256
    ab = np.asarray(render_flat(_scene([ca, cb], spp=spp), spp=spp))
    a = np.asarray(render_flat(_scene([ca], spp=spp), spp=spp))
    b = np.asarray(render_flat(_scene([cb], spp=spp), spp=spp))
    lhs, rhs = float(ab.mean()), float(a.mean() + b.mean())
    assert abs(lhs - rhs) / max(rhs, 1e-9) < 0.05, (lhs, rhs)


def test_cap_order_and_env_interleave():
    """env A, env B, cap C listed last: escape = C inside its cone, else B;
    a cap listed BEFORE the last env can never win the escape."""
    s = _scene([_env("a", 0.2), _cap("early", 40.0, 9.0),
                _env("b", 0.8), _cap("late", 0.0, 5.0, angle=20.0)])
    assert s.meta.n_caps == 2
    # only the cap after the last env can win the escape
    assert s.meta.esc_caps == (1,)
    d = _sphere_dirs()
    rad = np.asarray(L.infinite_radiance(s, d))
    in_late = np.asarray(L.cap_in_cone_k(s, d, 1))
    assert np.allclose(rad[in_late], 5.0, atol=1e-4)
    assert np.allclose(rad[~in_late], 0.8, atol=1e-4)
    wl, e_inf, _ = L.escape_winner(s, d)
    wl = np.asarray(wl)
    assert np.all(wl[in_late] == s.meta.cap_light_idx[1])
    assert np.all(wl[~in_late] == s.meta.env_light_idx[1])


def test_unsamplable_winner_escape_gate():
    """Unsamplable last env: escape_winner reports -2 (never matches a
    chosen light) but its radiance still reaches escaping rays."""
    s = _scene([_env("a", 0.3), _env("b", 0.7, sample=False)])
    assert s.meta.env_light_idx[1] == -1
    d = _sphere_dirs(256)
    wl, _, pdf = L.escape_winner(s, d)
    assert np.all(np.asarray(wl) == -2)
    assert np.allclose(np.asarray(pdf), 0.0)
    rad = np.asarray(L.infinite_radiance(s, d))
    assert np.allclose(rad, 0.7, atol=1e-5)
