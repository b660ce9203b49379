"""Heterogeneous grid media: golden tests against the analytic gaussian blob
(VERDICT round-2 item 4 — grids/Grid.hpp:13-25, media/VoxelMedium.cpp:97-186
semantics on a dense grid)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.models.grids import (
    grid_density,
    grid_inverse_optical_depth,
    grid_optical_depth,
    load_grid_spec,
)
from tungsten_tpu.models.media import medium_sample_distance, medium_transmittance, pack_media

SIGMA = 0.25


@pytest.fixture(scope="module")
def blob():
    return load_grid_spec({"type": "gaussian", "resolution": 64, "sigma": SIGMA, "steps": 128})


CENTER = np.array([0.0, 0.5, 0.0])  # normalize_size bottom-aligns y
# (VdbGrid.cpp:237-240): world box is x,z in [-0.5,0.5], y in [0,1]


def _analytic_tau(o, d, t):
    """int_0^t exp(-|o+s d - c|^2 / (2 sigma^2)) ds, restricted to the grid's
    world box (the dense grid is zero outside its bounds)."""
    from scipy.integrate import quad

    def dens(s):
        p = o + s * d - CENTER
        if np.any(np.abs(p) > 0.5):
            return 0.0
        return np.exp(-np.dot(p, p) / (2 * SIGMA * SIGMA))

    return quad(dens, 0.0, t, limit=400)[0]


def test_density_matches_analytic(blob):
    rng = np.random.default_rng(0)
    p = (rng.uniform(-0.45, 0.45, (64, 3)) + CENTER).astype(np.float32)
    got = np.asarray(grid_density(blob, jnp.asarray(p)))
    pc = p - CENTER.astype(np.float32)
    want = np.exp(-np.sum(pc * pc, axis=1) / (2 * SIGMA * SIGMA))
    assert np.allclose(got, want, atol=2e-3)


def test_optical_depth_matches_analytic(blob):
    rng = np.random.default_rng(1)
    o = (rng.uniform(-0.9, -0.6, (8, 3)) + CENTER).astype(np.float32)
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # aim roughly at the blob so the integral is nontrivial
    d = (CENTER.astype(np.float32) - o + rng.uniform(-0.2, 0.2, (8, 3)).astype(np.float32))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t1 = np.full((8,), 3.0, np.float32)
    got = np.asarray(
        grid_optical_depth(blob, jnp.asarray(o), jnp.asarray(d), jnp.zeros(8), jnp.asarray(t1))
    )
    want = np.array([_analytic_tau(o[i], d[i], t1[i]) for i in range(8)])
    # 64^3 trilinear discretization biases a gaussian peak ~3%; the march
    # itself converges (tested exactly by the roundtrip test below)
    assert np.allclose(got, want, rtol=0.04, atol=1e-3), (got, want)


def test_inverse_optical_depth_roundtrip(blob):
    rng = np.random.default_rng(2)
    o = np.tile(np.array([[-1.0, 0.52, -0.03]], np.float32), (16, 1))
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (16, 1))
    t = rng.uniform(0.6, 1.4, 16).astype(np.float32)  # inside the blob span
    tau = grid_optical_depth(blob, jnp.asarray(o), jnp.asarray(d), jnp.zeros(16), jnp.asarray(t))
    t_back = np.asarray(
        grid_inverse_optical_depth(
            blob, jnp.asarray(o), jnp.asarray(d), jnp.zeros(16),
            jnp.full(16, 1e30), tau,
        )
    )
    assert np.allclose(t_back, t, atol=5e-3)


def test_inverse_unreachable_is_inf(blob):
    o = jnp.asarray([[-1.0, 0.5, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    total = grid_optical_depth(blob, o, d, jnp.zeros(1), jnp.full(1, 1e30))
    t = grid_inverse_optical_depth(
        blob, o, d, jnp.zeros(1), jnp.full(1, 1e30), total * 1.5
    )
    assert float(t[0]) >= 1e30


def _voxel_media():
    return pack_media(
        [
            {
                "type": "voxel",
                "sigma_a": 0.5,
                "sigma_s": 1.5,
                "grid": {
                    "type": "gaussian",
                    "resolution": 48,
                    "sigma": SIGMA,
                    "steps": 128,
                    "normalize_size": True,
                },
                "phase_function": {"type": "isotropic"},
            }
        ]
    )


def test_voxel_medium_transmittance_matches_analytic():
    media = _voxel_media()
    n = 4
    o = jnp.asarray(np.tile([[-1.0, 0.5, 0.0]], (n, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)).astype(np.float32))
    far = jnp.asarray([0.6, 1.0, 1.4, 2.0], jnp.float32)
    mid = jnp.zeros((n,), jnp.int32)
    tr = np.asarray(
        medium_transmittance(
            media, mid, far, jnp.ones(n, bool), jnp.ones(n, bool), o, d
        )
    )
    sigma_t = 2.0
    want = np.array(
        [np.exp(-sigma_t * _analytic_tau(np.array([-1.0, 0.5, 0]), np.array([1.0, 0, 0]), float(f)))
         for f in np.asarray(far)]
    )
    assert np.allclose(tr[:, 0], want, rtol=0.03), (tr[:, 0], want)


def test_voxel_medium_distance_sampling_unbiased():
    """E[1{scatter before t*}] must equal 1 - exp(-sigma_t tau(t*)) plus the
    estimator must be pdf-consistent (weights finite and positive)."""
    media = _voxel_media()
    n = 4096
    rng = np.random.default_rng(3)
    o = jnp.asarray(np.tile([[-1.0, 0.5, 0.0]], (n, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)).astype(np.float32))
    far = jnp.full((n,), 2.0)
    mid = jnp.zeros((n,), jnp.int32)
    ms = medium_sample_distance(
        media, mid, o, d, far,
        jnp.ones(n, bool), jnp.zeros(n, jnp.int32),
        jnp.asarray(rng.uniform(size=n).astype(np.float32)),
        jnp.asarray(rng.uniform(size=n).astype(np.float32)),
        jnp.asarray(rng.uniform(size=n).astype(np.float32)),
    )
    scatter_frac = float(np.mean(np.asarray(ms.scattered)))
    tau_total = _analytic_tau(np.array([-1.0, 0.5, 0]), np.array([1.0, 0, 0]), 2.0)
    want = 1.0 - np.exp(-2.0 * tau_total)
    assert abs(scatter_frac - want) < 0.03, (scatter_frac, want)
    w = np.asarray(ms.weight)
    assert np.all(np.isfinite(w)) and np.all(w >= 0.0)
    # scattered points concentrate inside the blob
    p = np.asarray(ms.p)[np.asarray(ms.scattered)]
    if len(p):
        assert np.abs(p[:, 0]).max() < 0.55


def test_exact_dda_linear_ramp_machine_exact():
    """A linear density ramp is reproduced EXACTLY by trilinear
    interpolation, so the exact cell-walk (DDA + Gauss-2, VdbGrid
    ExactLinear) must integrate it to float precision — the VERDICT r3
    item-5 "transmittance golden vs analytic grid" gate, at 1e-5 instead
    of 0.5%."""
    n = 16
    c = (np.arange(n) + 0.5) / n
    z, y, x = np.meshgrid(c, c, c, indexing="ij")
    dens = (0.25 + 1.5 * x).astype(np.float32)  # linear in world x

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ramp.npy")
        np.save(p, dens)
        g = load_grid_spec({"type": "dense", "file": p})
    assert g.exact

    rng = np.random.default_rng(5)
    o = np.stack([
        np.full(64, -1.0),
        rng.uniform(0.15, 0.85, 64),
        rng.uniform(-0.35, 0.35, 64),
    ], -1).astype(np.float32)
    d = np.tile([1.0, 0.0, 0.0], (64, 1)).astype(np.float32)
    tau = np.asarray(grid_optical_depth(
        g, jnp.asarray(o), jnp.asarray(d), jnp.zeros(64), jnp.full(64, 10.0)))
    # interpolated density along x in [-0.5, 0.5]: matches the ramp on
    # [-0.5 + h/2, 0.5 - h/2] (h = voxel size); in each half-voxel margin
    # the missing neighbor taps contribute 0 (not clamp), so the field is
    # w * d_edge with w ramping 0.5 -> 1 (mean 0.75) over width h/2
    h = 1.0 / n
    lo, hi = -0.5 + 0.5 * h, 0.5 - 0.5 * h
    f = lambda xx: 0.25 + 1.5 * (xx + 0.5)  # world x -> density
    interior = 0.5 * (f(lo) + f(hi)) * (hi - lo)
    margins = 0.75 * (f(lo) + f(hi)) * 0.5 * h
    expected = interior + margins
    assert np.allclose(tau, expected, rtol=1e-5), (tau[:4], expected)

    # inverse round-trip at machine precision
    target = jnp.asarray(np.full(64, 0.35, np.float32))
    t_inv = grid_inverse_optical_depth(
        g, jnp.asarray(o), jnp.asarray(d), jnp.zeros(64), jnp.full(64, 10.0),
        target)
    tau_back = grid_optical_depth(
        g, jnp.asarray(o), jnp.asarray(d), jnp.zeros(64), np.asarray(t_inv))
    assert np.allclose(np.asarray(tau_back), 0.35, atol=2e-5)
