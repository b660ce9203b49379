"""Tabulated reconstruction filters (mitchell/catmull_rom/lanczos/gaussian):
sampling distribution, signed splat kernels, end-to-end camera use.
Reference: cameras/ReconstructionFilter.hpp:19-33, .cpp:34-58."""
import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.models.cameras import rfilter
from tungsten_tpu.models.cameras.pinhole import filter_offset

NAMES = ["mitchell_netravali", "catmull_rom", "lanczos", "gaussian"]


@pytest.mark.parametrize("name", NAMES)
def test_signed_kernel_integrates_to_one(name):
    xs = jnp.linspace(-2.0, 2.0, 8001)
    integral = float(jnp.trapezoid(rfilter.eval_approx(name, xs), xs))
    assert abs(integral - 1.0) < 5e-3


@pytest.mark.parametrize("name", NAMES)
def test_sample_matches_positive_density(name):
    """Inverse-CDF samples should reproduce the per-bin positive mass."""
    filt, cdf, bin_size = rfilter.tables(name)
    u = (np.arange(200_000) + 0.5) / 200_000
    x = np.asarray(rfilter.sample_offset_1d(name, jnp.asarray(u, jnp.float32)))
    # sample() can extrapolate slightly past a bin edge where the raw cdf is
    # flat/decreasing (reference artifact); allow one bin of slack
    assert np.all(np.abs(x) <= 2.0 + bin_size + 1e-5)
    # mirror symmetry of the two half-streams
    assert abs(np.mean(x)) < 5e-3
    # a draw crossing the cdf at index i maps to |x|~[i*bin, (i+1)*bin), so
    # histogram bin i carries the RUNNING-MAX cdf increment at i (negative-
    # lobe bins get zero mass) and bin 0 is empty (cdf[0]=0, strict <)
    hist, _ = np.histogram(np.abs(x), bins=np.arange(rfilter.RES + 1) * bin_size)
    runmax = np.maximum.accumulate(cdf)
    want = np.diff(np.minimum(runmax[: rfilter.RES], 1.0))
    got = hist[1 : rfilter.RES] / len(x)
    big = want > 0.01
    np.testing.assert_allclose(got[big], want[big], rtol=0.08)


def test_mitchell_has_negative_lobe():
    x = jnp.linspace(1.05, 1.95, 64)
    assert float(rfilter.eval_approx("mitchell_netravali", x).min()) < 0.0
    assert float(rfilter.eval_approx("catmull_rom", x).min()) < 0.0
    assert float(rfilter.eval_approx("lanczos", x).min()) < 0.0


@pytest.mark.parametrize("name", ["tent", "mitchell_netravali", "box"])
def test_splat_energy_conservation(name):
    """A splat far from borders deposits ~the full value (signed kernel
    sums to ~1 over its 4x4 support)."""
    from tungsten_tpu.integrators.light_tracer import splat_filtered

    res = 16
    buf = jnp.zeros((res * res, 3))
    pix = jnp.asarray([[7.3, 8.6]], jnp.float32)
    val = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
    out = splat_filtered(buf, pix, val, jnp.asarray([True]), res, res, filter_name=name)
    total = np.asarray(out).sum(axis=0)
    np.testing.assert_allclose(total, [1.0, 2.0, 3.0], rtol=0.04)


def test_filter_offset_dispatch():
    u2 = jnp.asarray(np.random.default_rng(3).uniform(size=(512, 2)), jnp.float32)
    for name in ["dirac", "box", "tent", "gaussian", "mitchell_netravali",
                 "catmull_rom", "lanczos"]:
        off = filter_offset(name, u2)
        assert off.shape == (512, 2)
        lim = {"dirac": 1e-6, "box": 0.51, "tent": 1.01}.get(name, 2.01)
        assert float(jnp.abs(off).max()) <= lim
