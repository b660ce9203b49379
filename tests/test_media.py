"""Participating-media tests: analytic transmittance (exponential + the
non-exponential family), scattering estimator cross-agreement."""
import numpy as np
import pytest

from tungsten_tpu.scene.load import parse_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.renderer.render import render_flat


def medium_scene(sigma_a, sigma_s=0.0, trans=None, nee=True, emission=4.0, dist=2.0):
    medium = {
        "name": "fog",
        "type": "homogeneous",
        "sigma_a": sigma_a,
        "sigma_s": sigma_s,
        "phase_function": {"type": "isotropic"},
    }
    if trans:
        medium["transmittance"] = trans
    return parse_scene(
        {
            "media": [medium],
            "bsdfs": [{"name": "black", "albedo": 0, "type": "lambert"}],
            "primitives": [
                {
                    "type": "quad",
                    "transform": {"position": [0, 0, 0], "scale": 8.0},
                    "emission": [emission] * 3,
                    "bsdf": "black",
                }
            ],
            "camera": {
                "type": "pinhole",
                "tonemap": "linear",
                "resolution": [24, 24],
                "reconstruction_filter": "tent",
                "fov": 20,
                "medium": "fog",
                "transform": {
                    "position": [0, dist, 0],
                    "look_at": [0, 0, 0],
                    "up": [0, 0, 1],
                },
            },
            "integrator": {
                "type": "path_tracer",
                "max_bounces": 16,
                "enable_light_sampling": nee,
                "enable_volume_light_sampling": nee,
            },
            "renderer": {"spp": 8, "scene_bvh": False},
        },
        path="/tmp/medium.json",
    )


def center_mean(img):
    return img[9:15, 9:15].mean()


def test_absorption_exponential():
    """Pure absorption: pixel = E * exp(-sigma_a * dist)."""
    doc = medium_scene(sigma_a=0.7, dist=2.0)
    img = render_flat(flatten_scene(doc), spp=8, seed=3)
    expected = 4.0 * np.exp(-0.7 * 2.0)
    assert abs(center_mean(img) - expected) / expected < 0.01


@pytest.mark.parametrize(
    "trans,expected_tr",
    [
        ({"type": "davis", "alpha": 2.0}, (1 + 1.4 / 2.0) ** -2.0),
        ({"type": "quadratic", "max_t": 3.0}, 1 - 2 * (1.4 / 3) + (1.4 / 3) ** 2),
        ({"type": "erlang", "rate": 1.0}, 0.5 * np.exp(-1.4) * (2 + 1.4)),
        ({"type": "double_exponential", "sigma_a": 0.5, "sigma_b": 2.0},
         0.5 * (np.exp(-0.5 * 1.4) + np.exp(-2.0 * 1.4))),
        # davis_weinstein h=0.75, c=1: beta=.5, alpha=sqrt(tau),
        # ss = (1 + sqrt(tau))^(-sqrt(tau))  (DavisWeinsteinTransmittance.cpp)
        ({"type": "davis_weinstein", "h": 0.75, "c": 1.0},
         (1.0 + np.sqrt(1.4)) ** (-np.sqrt(1.4))),
        # interpolated linear(3) + erlang(1), ratio .5:
        # sbar*lerp(ssA/sbarA, ssB/sbarB)  (InterpolatedTransmittance.cpp)
        ({"type": "interpolated", "ratio": 0.5,
          "tr_a": {"type": "linear", "max_t": 3.0},
          "tr_b": {"type": "erlang", "rate": 1.0}},
         (1.0 / (0.5 * 3.0 + 0.5 * 2.0))
         * (0.5 * (1 - 1.4 / 3) * 3.0
            + 0.5 * (0.5 * np.exp(-1.4) * (2 + 1.4)) * 2.0)),
    ],
)
def test_absorption_non_exponential(trans, expected_tr):
    """Generalized transmittance, surface-surface case: pixel = E * T_ss(tau)."""
    doc = medium_scene(sigma_a=0.7, dist=2.0, trans=trans)
    img = render_flat(flatten_scene(doc), spp=8, seed=3)
    expected = 4.0 * expected_tr
    assert abs(center_mean(img) - expected) / expected < 0.015, (
        f"{trans}: got {center_mean(img)}, want {expected}"
    )


def test_scattering_medium_nee_vs_bruteforce():
    """Isotropic scattering fog lit by the emissive quad: NEE+MIS and pure
    phase-sampling transport must agree (volume estimator unbiasedness)."""
    doc = medium_scene(sigma_a=0.1, sigma_s=0.5, nee=True)
    img_nee = render_flat(flatten_scene(doc), spp=48, seed=5)
    doc_bf = medium_scene(sigma_a=0.1, sigma_s=0.5, nee=False)
    img_bf = render_flat(flatten_scene(doc_bf), spp=384, seed=6)
    m1, m2 = img_nee.mean(), img_bf.mean()
    assert abs(m1 - m2) / m2 < 0.05, f"nee {m1} vs bf {m2}"


def test_exponential_medium_absorption():
    """ExponentialMedium (ExponentialMedium.cpp): density = exp(-k (p-u).f).
    Camera at y=dist looking down: tau = sigma_a * (1 - e^{-k d})/k."""
    doc = medium_scene(sigma_a=0.7, dist=2.0)
    doc.media[0]["type"] = "exponential"
    doc.media[0]["falloff_scale"] = 0.5
    doc.media[0]["falloff_direction"] = [0, 1, 0]
    doc.media[0]["unit_point"] = [0, 0, 0]
    img = render_flat(flatten_scene(doc), spp=8, seed=3)
    integral = (1 - np.exp(-0.5 * 2.0)) / 0.5
    expected = 4.0 * np.exp(-0.7 * integral)
    assert abs(center_mean(img) - expected) / expected < 0.01, (
        center_mean(img), expected)


def test_exponential_medium_scattering_unbiased():
    """Scattering exponential medium: NEE render mean matches a
    high-spp no-NEE render (cross-validation of the density-weighted
    distance sampling + pdfs)."""
    def scene(nee):
        doc = medium_scene(sigma_a=0.1, sigma_s=0.6, dist=2.0, nee=nee)
        doc.media[0]["type"] = "exponential"
        doc.media[0]["falloff_scale"] = 0.7
        doc.media[0]["falloff_direction"] = [0, 1, 0]
        return flatten_scene(doc)

    a = render_flat(scene(True), spp=128, seed=3)
    b = render_flat(scene(False), spp=512, seed=11)
    ra = float(a[6:18, 6:18].mean())
    rb = float(b[6:18, 6:18].mean())
    assert abs(ra / rb - 1.0) < 0.06, (ra, rb)


def test_atmosphere_medium_absorption():
    """AtmosphericMedium (AtmosphericMedium.cpp): gaussian shell density
    exp(-s^2 (|p-c|^2 - R^2)). Vertical camera ray through the center line:
    tau = sigma_a * e^{s^2 R^2} * sqrt(pi)/(2s) * erf(2s)."""
    from scipy.special import erf as _erf

    doc = medium_scene(sigma_a=0.7, dist=2.0)
    doc.media[0]["type"] = "atmosphere"
    doc.media[0]["radius"] = 1.5
    doc.media[0]["falloff_scale"] = 1.2
    doc.media[0]["center"] = [0, 0, 0]
    img = render_flat(flatten_scene(doc), spp=8, seed=3)
    s = 1.2 / 1.5
    integral = np.exp(s * s * 1.5 * 1.5) * np.sqrt(np.pi) / (2 * s) * _erf(2 * s)
    expected = 4.0 * np.exp(-0.7 * integral)
    assert abs(center_mean(img) - expected) / expected < 0.01, (
        center_mean(img), expected)


def test_atmosphere_medium_scattering_unbiased():
    def scene(nee):
        doc = medium_scene(sigma_a=0.05, sigma_s=0.4, dist=2.0, nee=nee)
        doc.media[0]["type"] = "atmosphere"
        doc.media[0]["radius"] = 1.0
        doc.media[0]["falloff_scale"] = 1.0
        return flatten_scene(doc)

    a = render_flat(scene(True), spp=128, seed=3)
    b = render_flat(scene(False), spp=512, seed=11)
    ra = float(a[6:18, 6:18].mean())
    rb = float(b[6:18, 6:18].mean())
    assert abs(ra / rb - 1.0) < 0.06, (ra, rb)
