"""Per-BSDF consistency tests (SURVEY.md §4 test strategy):
 - sample/eval/pdf agreement: weight == eval(wi, wo) / pdf(wi, wo)
 - pdf normalization: ∫ pdf dω == 1 over sampled lobes (MC over samples)
 - energy conservation: ∫ f cos dω <= 1 (white furnace bound)
These validate the vectorized ports against their mathematical definitions
without needing reference renders."""
import numpy as np
import pytest
import jax.numpy as jnp

from tungsten_tpu.models.bsdfs import pack_materials, bsdf_eval, bsdf_pdf, bsdf_sample
from tungsten_tpu.models.bsdfs.common import Lobes
from tungsten_tpu.models.textures import TextureBuilder
from tungsten_tpu.sampling import Sampler

N = 1 << 14

SPECS = {
    "lambert": {"type": "lambert", "albedo": 0.8},
    "oren_nayar": {"type": "oren_nayar", "albedo": 0.8, "roughness": 0.4},
    "phong": {"type": "phong", "albedo": 0.8, "exponent": 30, "diffuse_ratio": 0.3},
    "rough_conductor_beckmann": {
        "type": "rough_conductor", "albedo": 1.0, "material": "Cu",
        "distribution": "beckmann", "roughness": 0.1,
    },
    "rough_conductor_ggx": {
        "type": "rough_conductor", "albedo": 1.0, "material": "Au",
        "distribution": "ggx", "roughness": 0.3,
    },
    "rough_dielectric": {
        "type": "rough_dielectric", "albedo": 1.0, "ior": 1.5,
        "distribution": "ggx", "roughness": 0.25,
    },
    "plastic": {"type": "plastic", "albedo": [0.6, 0.3, 0.2], "ior": 1.5},
    "rough_plastic": {
        "type": "rough_plastic", "albedo": 0.5, "ior": 1.5,
        "distribution": "ggx", "roughness": 0.2,
    },
    "diffuse_transmission": {"type": "diffuse_transmission", "albedo": 0.8, "transmittance": 0.4},
    "smooth_coat": {
        "type": "smooth_coat", "ior": 1.7, "thickness": 5, "sigma_a": [0.1, 0.2, 0.5],
        "substrate": {
            "type": "rough_conductor", "albedo": 1.0, "material": "Cu",
            "distribution": "beckmann", "roughness": 0.1,
        },
    },
    "rough_coat": {
        "type": "rough_coat", "ior": 1.3, "thickness": 1, "sigma_a": 0.0,
        "roughness": 0.2, "distribution": "ggx",
        "substrate": {"type": "lambert", "albedo": 0.7},
    },
    "mixed": {
        "type": "mixed", "albedo": 1.0, "ratio": 0.4,
        "bsdf0": {"type": "lambert", "albedo": 0.9},
        "bsdf1": {"type": "oren_nayar", "albedo": 0.5, "roughness": 0.3},
    },
    # textured parameters (VERDICT r3 weak #7: these used to raise
    # NotImplementedError at pack time; they are ordinary Textures in the
    # reference: MixedBsdf.hpp / OrenNayarBsdf.hpp)
    "mixed_textured_ratio": {
        "type": "mixed", "albedo": 1.0,
        "ratio": {"type": "checker", "on_color": 0.8, "off_color": 0.2},
        "bsdf0": {"type": "lambert", "albedo": 0.9},
        "bsdf1": {"type": "oren_nayar", "albedo": 0.5, "roughness": 0.3},
    },
    "oren_nayar_textured_roughness": {
        "type": "oren_nayar", "albedo": 0.8,
        "roughness": {"type": "checker", "on_color": 0.7, "off_color": 0.1},
    },
}


def build_table(spec):
    from tungsten_tpu.scene.load import parse_scene

    doc = parse_scene(
        {
            "bsdfs": [dict(spec, name="m")],
            "primitives": [],
            "camera": {},
        },
        path="/tmp/x.json",
    )
    # parse_scene resolves nested refs; pack all materials
    tb = TextureBuilder()
    mats = pack_materials(doc.bsdfs, tb)
    return mats, tb.build()


def fixed_wi(n, z=0.6):
    x = np.sqrt(1 - z * z)
    wi = np.tile(np.array([x, 0.0, z], np.float32), (n, 1))
    return jnp.asarray(wi)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_sample_eval_pdf_agreement(name):
    mats, texs = build_table(SPECS[name])
    ctx = (mats, texs)
    s = Sampler.create(7, jnp.arange(N, dtype=jnp.uint32))
    u2, s = s.next_2d()
    u1, s = s.next_1d()
    wi = fixed_wi(N)
    uv = jnp.full((N, 2), 0.3)
    mat_id = jnp.zeros((N,), jnp.int32)

    bs = bsdf_sample(ctx, mat_id, uv, wi, u2, u1)
    valid = np.asarray(bs.valid)
    assert valid.mean() > 0.5, f"{name}: too many invalid samples"

    # non-dirac lanes: weight must equal eval/pdf
    dirac = (np.asarray(bs.lobe) & Lobes.SPECULAR) != 0
    sel = valid & ~dirac
    if sel.sum() > 100:
        f = np.asarray(bsdf_eval(ctx, mat_id, uv, wi, bs.wo))
        p = np.asarray(bsdf_pdf(ctx, mat_id, uv, wi, bs.wo))
        w = np.asarray(bs.weight)
        recon = f[sel] / np.maximum(p[sel, None], 1e-20)
        err = np.abs(recon - w[sel]) / np.maximum(np.abs(w[sel]), 1e-3)
        frac_bad = (err > 0.02).any(axis=-1).mean()
        assert frac_bad < 0.02, f"{name}: weight != eval/pdf for {frac_bad:.1%} of lanes"

    # energy conservation: E[weight] = albedo-ish <= 1 per channel
    w = np.array(bs.weight)
    w[~valid] = 0.0
    mean_w = w.mean(axis=0)
    assert (mean_w <= 1.02).all(), f"{name}: energy gain {mean_w}"


@pytest.mark.parametrize(
    "name",
    [
        "lambert",
        "oren_nayar",
        "phong",
        "rough_conductor_beckmann",
        "rough_conductor_ggx",
        "plastic",
        "rough_plastic",
    ],
)
def test_pdf_normalization(name):
    """MC check: E_uniform[pdf(wo)] * 2pi (hemisphere) ~= total sampled lobe
    probability (<= 1, == 1 for reflection-complete BSDFs with wi up)."""
    mats, texs = build_table(SPECS[name])
    ctx = (mats, texs)
    rng = np.random.default_rng(5)
    wo = rng.normal(size=(N, 3))
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo[:, 2] = np.abs(wo[:, 2])  # upper hemisphere
    wo = jnp.asarray(wo, jnp.float32)
    wi = fixed_wi(N)
    uv = jnp.full((N, 2), 0.3)
    mat_id = jnp.zeros((N,), jnp.int32)
    p = np.asarray(bsdf_pdf(ctx, mat_id, uv, wi, wo))
    assert np.isfinite(p).all() and (p >= 0).all()
    integral = p.mean() * 2.0 * np.pi
    assert 0.7 < integral < 1.1, f"{name}: pdf integrates to {integral}"


def test_thinsheet_textured_thickness_and_structured_alpha():
    """Textured thinsheet thickness and structured (checker) transparency
    alpha pack and evaluate per hit (VERDICT r3 weak #7 second half)."""
    from tungsten_tpu.models.bsdfs.dispatch import module_for_id, _gather

    for spec in (
        {"type": "thinsheet", "ior": 1.5, "enable_interference": True,
         "thickness": {"type": "checker", "on_color": 1.2, "off_color": 0.2}},
        {"type": "transparency",
         "alpha": {"type": "checker", "on_color": 1.0, "off_color": 0.1},
         "base": {"type": "lambert", "albedo": 0.8}},
    ):
        mats, texs = build_table(spec)
        ctx = (mats, texs)
        n = 256
        wi = fixed_wi(n)
        # uv spanning checker cells -> transparency must VARY across uv
        uv = jnp.stack([jnp.linspace(0.0, 1.0, n), jnp.full((n,), 0.26)], -1)
        params, mtype, albedo = _gather(ctx, jnp.zeros((n,), jnp.int32), uv)[:3]
        mod = module_for_id(int(np.asarray(mtype)[0]))
        tr = np.asarray(mod.forward_transparency(ctx, params, albedo, uv, wi))
        assert np.isfinite(tr).all()
        assert tr.std() > 1e-3, f"{spec['type']}: transparency constant over uv"
