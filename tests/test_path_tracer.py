"""Integrator correctness: analytic furnace-style tests + estimator
cross-agreement (the test strategy SURVEY.md §4 prescribes — the reference
has no tests; we validate against closed-form expectations instead)."""
import numpy as np
import pytest

from tungsten_tpu.scene.load import parse_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.renderer.render import render_flat


def furnace_scene(albedo=0.5, nee=True):
    return parse_scene(
        {
            "bsdfs": [{"name": "mat", "albedo": albedo, "type": "lambert"}],
            "primitives": [
                {
                    "type": "quad",
                    "transform": {"scale": 20.0},
                    "bsdf": "mat",
                },
                {
                    "type": "infinite_sphere",
                    "emission": [1.0, 1.0, 1.0],
                    "sample": True,
                },
            ],
            "camera": {
                "type": "pinhole",
                "tonemap": "linear",
                "resolution": [48, 48],
                "reconstruction_filter": "tent",
                "fov": 40,
                "transform": {
                    "position": [0, 4, 0],
                    "look_at": [0, 0, 0],
                    "up": [0, 0, 1],
                },
            },
            "integrator": {
                "type": "path_tracer",
                "min_bounces": 0,
                "max_bounces": 16,
                "enable_light_sampling": nee,
            },
            "renderer": {"spp": 16, "scene_bvh": False},
        },
        path="/tmp/furnace.json",
    )


@pytest.mark.parametrize("nee", [True, False])
def test_furnace_lambert_quad(nee):
    """A lambert plane under a constant unit environment reflects exactly its
    albedo (single bounce; the plane only sees the env). Validates camera,
    intersection, cosine sampling, NEE/MIS weights, env eval in one shot."""
    scene = flatten_scene(furnace_scene(albedo=0.5, nee=nee))
    img = render_flat(scene, spp=32, seed=123)
    # center crop is fully on the quad
    crop = img[12:36, 12:36]
    assert abs(crop.mean() - 0.5) < 0.01, f"furnace mean {crop.mean()} != 0.5 (nee={nee})"
    # unbiased per-channel too
    np.testing.assert_allclose(crop.mean(axis=(0, 1)), 0.5, atol=0.015)


def test_nee_equals_brute_force_cornell():
    """NEE+MIS and pure BSDF sampling must converge to the same image
    (unbiasedness of the MIS estimator)."""
    import json

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 4

    doc_nee = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    img_nee = render_flat(flatten_scene(doc_nee), spp=96, seed=11)

    raw2 = dict(raw)
    raw2["integrator"] = dict(raw["integrator"], enable_light_sampling=False)
    doc_bf = parse_scene(raw2, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    img_bf = render_flat(flatten_scene(doc_bf), spp=768, seed=12)

    # compare per-channel means (fast-converging statistic); the BF estimator
    # has high variance (bright small light), so tolerance covers ~2 sigma
    m_nee = img_nee.mean(axis=(0, 1))
    m_bf = img_bf.mean(axis=(0, 1))
    np.testing.assert_allclose(m_nee, m_bf, rtol=0.035)


def test_emissive_quad_direct_view():
    """Pixels looking straight at an area light read its radiance exactly."""
    doc = parse_scene(
        {
            "bsdfs": [{"name": "black", "albedo": 0, "type": "lambert"}],
            "primitives": [
                {
                    "type": "quad",
                    "transform": {"position": [0, 0, 0], "scale": 4.0},
                    "emission": [2.0, 3.0, 4.0],
                    "bsdf": "black",
                }
            ],
            "camera": {
                "type": "pinhole",
                "tonemap": "linear",
                "resolution": [32, 32],
                "reconstruction_filter": "tent",
                "fov": 30,
                "transform": {
                    "position": [0, 3, 0],
                    "look_at": [0, 0, 0],
                    "up": [0, 0, 1],
                },
            },
            "integrator": {"type": "path_tracer", "max_bounces": 4},
            "renderer": {"spp": 4, "scene_bvh": False},
        },
        path="/tmp/emissive.json",
    )
    img = render_flat(flatten_scene(doc), spp=4, seed=7)
    crop = img[12:20, 12:20]
    np.testing.assert_allclose(crop.mean(axis=(0, 1)), [2.0, 3.0, 4.0], rtol=1e-3)


def test_light_tracer_matches_path_tracer():
    """Light tracing and path tracing are dual estimators of the same image;
    their means must agree (cornell box, lambert only)."""
    import json

    from tungsten_tpu.renderer.render import render_light_traced

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 5

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    img_pt = render_flat(scene, spp=64, seed=21)
    img_lt = render_light_traced(scene, spp=64, seed=22)
    # light tracer never renders directly-seen emitters
    # (Primitive::evalDirectionalEmission is zero for area lights); exclude
    # the emitter and its reconstruction-filter edge pixels
    mask = (img_pt.max(-1) < 0.5) & (img_pt.max(-1) > 0.01)
    m_pt = img_pt[mask].mean(0)
    m_lt = img_lt[mask].mean(0)
    np.testing.assert_allclose(m_lt, m_pt, rtol=0.06)


def test_bdpt_matches_path_tracer():
    """BDPT (all (s,t) techniques, MIS-combined) and PT must agree."""
    import json

    from tungsten_tpu.renderer.render import render_bdpt

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 5

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    img_pt = render_flat(scene, spp=256, seed=31)
    img_bd = render_bdpt(scene, spp=128, seed=32)
    mask = (img_pt.max(-1) < 0.5) & (img_pt.max(-1) > 0.01)
    # robust per-pixel ratio (the mean is dominated by a few high-variance
    # pixels adjacent to the emitter)
    r = img_bd[mask] / np.maximum(img_pt[mask], 1e-9)
    np.testing.assert_allclose(np.median(r, axis=0), 1.0, atol=0.03)
    np.testing.assert_allclose(img_bd[mask].mean(0), img_pt[mask].mean(0), rtol=0.05)


def test_sppm_matches_path_tracer():
    """SPPM converges to the PT image (small radius, enough photons).
    The density estimate has O(r) bias so tolerance is looser."""
    import json

    from tungsten_tpu.renderer.render import render_sppm

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 4

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    img_pt = render_flat(scene, spp=128, seed=41)
    img_pm = render_sppm(scene, spp=6, seed=42, photons_per_iter=1 << 16,
                         initial_radius=0.06)
    mask = (img_pt.max(-1) < 0.5) & (img_pt.max(-1) > 0.02)
    r = img_pm[mask] / np.maximum(img_pt[mask], 1e-9)
    med = np.median(r, axis=0)
    np.testing.assert_allclose(med, 1.0, atol=0.12)


def test_sppm_photon_beams_match_points():
    """Volume photon BEAMS vs POINTS (VERDICT r2 item 6 second half): the
    short-beam 1D estimator and the point 3D estimator target the same
    volumetric transport, so at matched radius/photon budget their images
    must agree (both carry O(r) bias, which cancels in the ratio)."""
    import json

    from tungsten_tpu.renderer.render import render_sppm

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [16, 12]
    raw["integrator"]["max_bounces"] = 4
    raw["media"] = [{"name": "fog", "type": "homogeneous", "sigma_a": 0.02,
                     "sigma_s": 0.25, "phase_function": {"type": "isotropic"}}]
    raw["camera"]["medium"] = "fog"
    for prim in raw["primitives"]:
        prim["ext_medium"] = "fog"
        prim["int_medium"] = "fog"

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    kw = dict(spp=10, seed=13, photons_per_iter=1 << 14)
    img_p = render_sppm(scene, volume_photon_type="points", **kw)
    img_b = render_sppm(scene, volume_photon_type="beams", **kw)
    mask = img_p.max(-1) > 0.01
    r = img_b[mask] / np.maximum(img_p[mask], 1e-9)
    np.testing.assert_allclose(np.median(r, axis=0), 1.0, atol=0.2)


def test_sppm_photon_planes_match_points():
    """Volume photon PLANES (exact 0D parallelogram estimator + reservoir
    visibility, PhotonTracer.cpp:138-159) vs POINTS: same volumetric
    transport, so at matched photon budget the images agree. The plane
    estimator's single-sample visibility makes its per-pixel distribution
    heavier-tailed, hence the looser tolerance (mean ratio converges to
    0.98 at 30 iters — measured 2026-08-18)."""
    import json

    from tungsten_tpu.renderer.render import render_sppm

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [16, 12]
    raw["integrator"]["max_bounces"] = 4
    raw["media"] = [{"name": "fog", "type": "homogeneous", "sigma_a": 0.02,
                     "sigma_s": 0.25, "phase_function": {"type": "isotropic"}}]
    raw["camera"]["medium"] = "fog"
    for prim in raw["primitives"]:
        prim["ext_medium"] = "fog"
        prim["int_medium"] = "fog"

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    kw = dict(spp=10, seed=13, photons_per_iter=1 << 14)
    img_p = render_sppm(scene, volume_photon_type="points", **kw)
    img_pl = render_sppm(scene, volume_photon_type="planes", **kw)
    mask = img_p.max(-1) > 0.01
    r = img_pl[mask] / np.maximum(img_p[mask], 1e-9)
    np.testing.assert_allclose(np.median(r, axis=0), 1.0, atol=0.2)


def test_sppm_photon_planes_1d_match_points():
    """Volume photon PLANES_1D (extruded 1D planes with control-variate
    visibility, evalPlane1D PhotonTracer.cpp:160-198) vs POINTS: the 4th
    reference volumePhotonType (PhotonMapSettings.hpp:16-23). Same
    volumetric transport at matched budget; the CV form can go negative
    per-sample, so compare the masked median ratio like the 0D test."""
    import json

    from tungsten_tpu.renderer.render import render_sppm

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [16, 12]
    raw["integrator"]["max_bounces"] = 4
    raw["media"] = [{"name": "fog", "type": "homogeneous", "sigma_a": 0.02,
                     "sigma_s": 0.25, "phase_function": {"type": "isotropic"}}]
    raw["camera"]["medium"] = "fog"
    for prim in raw["primitives"]:
        prim["ext_medium"] = "fog"
        prim["int_medium"] = "fog"

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    kw = dict(spp=10, seed=13, photons_per_iter=1 << 14)
    img_p = render_sppm(scene, volume_photon_type="points", **kw)
    img_1d = render_sppm(scene, volume_photon_type="planes_1d", **kw)
    mask = img_p.max(-1) > 0.01
    r = img_1d[mask] / np.maximum(img_p[mask], 1e-9)
    np.testing.assert_allclose(np.median(r, axis=0), 1.0, atol=0.2)


def test_kelemen_mlt_matches_path_tracer():
    """PSSMLT (parallel Kelemen chains, expected-value splatting) converges
    to the PT image. The luminance-scale estimate makes the global scale
    noisy at test sample counts, so the tolerance is loose."""
    import json

    from tungsten_tpu.integrators.kelemen import render_kelemen

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 4

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    img_pt = render_flat(scene, spp=96, seed=51)
    img_mlt = render_kelemen(scene, spp=96, seed=52, n_chains=4096, bootstrap_factor=8)
    mask = img_pt.max(-1) > 0.01
    ratio = img_mlt[mask].mean(0) / img_pt[mask].mean(0)
    np.testing.assert_allclose(ratio, 1.0, atol=0.15)


def test_rjmlt_matches_path_tracer():
    """RJ-MLT vs PT flux agreement (VERDICT r2 missing #2): the strategy
    perturbations (technique jumps via path inversion) must leave the
    estimator unbiased relative to the MMLT baseline — same tolerance as
    the Kelemen/MMLT tests at this mutation budget."""
    import json

    from tungsten_tpu.integrators.rjmlt import render_rjmlt

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 4

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    img_pt = render_flat(scene, spp=96, seed=51)
    img_rj = render_rjmlt(scene, spp=96, seed=52, n_chains=4096, bootstrap_factor=8)
    mask = img_pt.max(-1) > 0.01
    ratio = img_rj[mask].mean(0) / img_pt[mask].mean(0)
    np.testing.assert_allclose(ratio, 1.0, atol=0.15)


def test_bdpt_matches_path_tracer_in_media():
    """Volumetric BDPT vs PT (VERDICT r2 item 2, resolved round 3): with a
    scattering medium filling the box, all estimators must agree.

    The round-2 xfail version of this test set ext_medium only. That scene
    is ILL-POSED: shadow/connection rays select the medium by their own
    direction's side of the geometric normal (Primitive.hpp:177-183), and
    the cornell walls' normals face OUT of the box, so NEE rays walk in the
    int-side vacuum while transport rays cross fog — the C++ reference's own
    integrators disagree on it by the same ratios we measured (C++ LT/PT
    median ~2.3, BDPT/PT ~1.4 at 24x18/8192spp). With int_medium AND
    ext_medium set (well-posed), the C++ integrators agree to ~1.00 and so
    must ours."""
    import json

    from tungsten_tpu.renderer.render import render_bdpt

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [24, 18]
    raw["integrator"]["max_bounces"] = 6
    raw["media"] = [
        {
            "name": "fog",
            "type": "homogeneous",
            "sigma_a": 0.02,
            "sigma_s": 0.25,
            "phase_function": {"type": "isotropic"},
        }
    ]
    raw["camera"]["medium"] = "fog"
    for prim in raw["primitives"]:
        prim["ext_medium"] = "fog"
        prim["int_medium"] = "fog"

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    assert scene.meta.has_media and scene.meta.camera_medium >= 0
    img_pt = render_flat(scene, spp=384, seed=51)
    img_bd = render_bdpt(scene, spp=192, seed=52)
    mask = (img_pt.max(-1) < 0.5) & (img_pt.max(-1) > 0.01)
    r = img_bd[mask] / np.maximum(img_pt[mask], 1e-9)
    np.testing.assert_allclose(np.median(r, axis=0), 1.0, atol=0.05)
    np.testing.assert_allclose(img_bd[mask].mean(0), img_pt[mask].mean(0), rtol=0.08)


def test_knn_gather_matches_fixed_radius():
    """kNN surface gather (KdTree::nearestNeighbours semantics, gather
    count-driven radius): with K larger than any in-radius population the
    per-lane radius saturates at the max search radius and the estimate is
    BITWISE the fixed-radius one; with a small K the count-driven estimate
    still converges to the same image (density estimates agree wherever the
    local photon density is locally uniform) — median ratio ~1."""
    import json

    from tungsten_tpu.renderer.render import render_sppm

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [32, 24]
    raw["integrator"]["max_bounces"] = 4

    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    kw = dict(spp=2, seed=42, photons_per_iter=1 << 15, initial_radius=0.08)
    img_fixed = render_sppm(scene, **kw)
    img_knn_big = render_sppm(scene, gather_count=10_000, **kw)
    np.testing.assert_array_equal(img_fixed, img_knn_big)

    img_knn = render_sppm(scene, gather_count=20, **kw)
    mask = img_fixed.max(-1) > 0.02
    r = img_knn[mask] / np.maximum(img_fixed[mask], 1e-9)
    med = np.median(r)
    assert abs(med - 1.0) < 0.15, med


def test_bdpt_image_pyramid_decomposition():
    """ImagePyramid (s, t) outputs (ImagePyramid.cpp:20-40): the
    per-technique stack exists for every BDPT family and its weighted sum
    reconstructs the render exactly."""
    import json

    from tungsten_tpu.renderer.render import render_bdpt, render_bdpt_pyramid

    with open("/root/reference/data/example-scenes/cornell-box/scene.json") as f:
        raw = json.load(f)
    raw["camera"]["resolution"] = [24, 16]
    raw["integrator"]["max_bounces"] = 4
    doc = parse_scene(raw, path="/root/reference/data/example-scenes/cornell-box/scene.json")
    scene = flatten_scene(doc)
    img, stack = render_bdpt_pyramid(scene, spp=2, seed=5)
    img_ref = render_bdpt(scene, spp=2, seed=5, passes_per_batch=1)
    assert (0, 2) in stack and (2, 1) in stack  # unidirectional + splat families
    tot = sum(stack.values())
    np.testing.assert_allclose(tot, img, atol=1e-5)
    np.testing.assert_allclose(img, img_ref, atol=1e-5)
