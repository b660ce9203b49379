import numpy as np
import jax
import jax.numpy as jnp

from tungsten_tpu.sampling import Sampler, warps
from tungsten_tpu.sampling.distributions import Distribution1D, Distribution2D


def make_sampler(n=4096, seed=42):
    return Sampler.create(seed, jnp.arange(n, dtype=jnp.uint32))


def test_sampler_uniform_and_decorrelated():
    s = make_sampler(1 << 16)
    u1, s = s.next_1d()
    u2, s = s.next_2d()
    for u in [np.asarray(u1), np.asarray(u2[:, 0]), np.asarray(u2[:, 1])]:
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.01
    # cross-dimension and cross-lane correlation ~ 0
    a, b = np.asarray(u1), np.asarray(u2[:, 0])
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02
    assert abs(np.corrcoef(a[:-1], a[1:])[0, 1]) < 0.02


def test_sampler_deterministic_replay():
    s1 = make_sampler()
    s2 = make_sampler()
    u1, _ = s1.next_1d()
    u2, _ = s2.next_1d()
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_sampler_jit_matches_eager():
    s = make_sampler(128)
    u_eager, _ = s.next_1d()
    u_jit = jax.jit(lambda s: s.next_1d()[0])(s)
    np.testing.assert_array_equal(np.asarray(u_eager), np.asarray(u_jit))


def test_cosine_hemisphere_distribution():
    s = make_sampler(1 << 16)
    u, _ = s.next_2d()
    w = warps.cosine_hemisphere(u)
    w = np.asarray(w)
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
    assert (w[:, 2] >= 0).all()
    # E[cos theta] = 2/3 under pdf = cos/pi
    assert abs(w[:, 2].mean() - 2.0 / 3.0) < 0.01
    pdf = warps.cosine_hemisphere_pdf(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(pdf), w[:, 2] / np.pi, atol=1e-6)


def test_power_heuristic():
    ph = warps.power_heuristic(jnp.float32(1.0), jnp.float32(1.0))
    assert abs(float(ph) - 0.5) < 1e-6
    ph0 = warps.power_heuristic(jnp.float32(0.0), jnp.float32(2.0))
    assert float(ph0) == 0.0


def test_distribution1d_sampling_frequencies():
    w = np.array([1.0, 2.0, 3.0, 4.0])
    d = Distribution1D.build(w)
    s = make_sampler(1 << 16)
    u, _ = s.next_1d()
    idx, pdf, u_re = d.sample(u)
    idx = np.asarray(idx)
    counts = np.bincount(idx, minlength=4) / idx.size
    np.testing.assert_allclose(counts, w / w.sum(), atol=0.01)
    np.testing.assert_allclose(np.asarray(pdf), (w / w.sum())[idx], rtol=1e-5)
    u_re = np.asarray(u_re)
    assert (u_re >= 0).all() and (u_re <= 1).all()
    assert abs(u_re.mean() - 0.5) < 0.01  # remapped uniform is still uniform


def test_distribution2d_matches_weights():
    rng = np.random.default_rng(3)
    wgt = rng.random((16, 32)) ** 2
    d = Distribution2D.build(wgt)
    s = make_sampler(1 << 17)
    u, _ = s.next_2d()
    x, y, pdf, uv = d.sample(u)
    x, y = np.asarray(x), np.asarray(y)
    hist = np.zeros_like(wgt)
    np.add.at(hist, (y, x), 1.0)
    hist /= hist.sum()
    np.testing.assert_allclose(hist, wgt / wgt.sum(), atol=0.002)
    np.testing.assert_allclose(np.asarray(pdf), (wgt / wgt.sum())[y, x], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.prob(jnp.asarray(x), jnp.asarray(y))), np.asarray(pdf), rtol=1e-5)



def test_sobol_strat_sampler():
    """Padded Owen-scrambled (0,2) sampler ("stratified_sampler" mode, the
    SobolPathSampler analog): every dimension yields an exact 8x8-stratified
    64-point net per pixel, streams differ across dims and pixels."""
    import numpy as np
    import jax.numpy as jnp
    from tungsten_tpu.sampling.sampler import Sampler

    n = 64
    seed = jnp.array([7, 0], jnp.uint32)
    lane = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.arange(n, dtype=jnp.uint32)
    pix = jnp.zeros((n,), jnp.uint32)
    s = Sampler.create(seed, lane, None, samp, pix, True)
    # draw 0 = Sobol dims (0,1): an exact (0,2)-net -> 8x8 stratified
    u = np.asarray(s.next_2d()[0])
    cells = set((int(x * 8), int(y * 8)) for x, y in u)
    assert len(cells) == 64
    # higher draws use true Sobol dims (2d, 2d+1): each 1D projection of the
    # first 64 points is exactly 64-stratified (every Sobol dim is a base-2
    # (0,1)-sequence; Owen scrambling preserves it). The 2D pairing is NOT
    # a (0,2)-net in general -- that's the true-QMC trade documented in
    # Sampler._draw.
    for dd in (5, 11):
        u = np.asarray(s.skip(dd).next_2d()[0])
        for ax in (0, 1):
            assert len(set(np.floor(u[:, ax] * 64).astype(int))) == 64
    u0 = np.asarray(s.next_2d()[0])
    u5 = np.asarray(s.skip(5).next_2d()[0])
    assert not np.allclose(u0, u5)
    s2 = Sampler.create(seed, lane, None, samp, pix + 1, True)
    assert not np.allclose(u0, np.asarray(s2.next_2d()[0]))


def test_sobol_qmc_variance_below_hash():
    """True Sobol' dims (VERDICT r2 item 7): integrating a smooth function of
    draws 2..5 (dims 4..11) over 64 samples/pixel must have measurably lower
    pixel-to-pixel estimator variance in strat (Sobol+Owen) mode than with
    the plain PCG4D hash."""
    import jax.numpy as jnp
    import numpy as np

    from tungsten_tpu.sampling import Sampler

    n_pix, spp = 128, 64
    seed = jnp.array([7, 9], jnp.uint32)

    def estimate(strat):
        vals = np.zeros((n_pix,))
        lane = jnp.arange(n_pix, dtype=jnp.uint32)
        pixk = jnp.arange(n_pix, dtype=jnp.uint32)
        for s_i in range(spp):
            samp = jnp.full((n_pix,), s_i, jnp.uint32)
            smp = Sampler.create(seed, lane, None,
                                 samp if strat else None,
                                 pixk if strat else None, strat)
            if not strat:
                # hash mode decorrelates via lane/seed; fold the sample index
                smp = Sampler.create(
                    jnp.array([7, 100 + s_i], jnp.uint32), lane)
            smp = smp.skip(2)
            acc = jnp.zeros((n_pix,))
            for _ in range(4):
                u, smp = smp.next_2d()
                acc = acc + u[:, 0] * u[:, 1]
            vals += np.asarray(acc)
        return vals / spp

    # E[sum of 4 products of independent U(0,1)] = 4 * 0.25 = 1.0
    est_hash = estimate(False)
    est_qmc = estimate(True)
    assert abs(est_qmc.mean() - 1.0) < 0.01
    assert abs(est_hash.mean() - 1.0) < 0.05
    var_hash = est_hash.var()
    var_qmc = est_qmc.var()
    # Sobol at 64 spp on a smooth 8-dim integrand: >= 4x variance reduction
    assert var_qmc < var_hash / 4.0, (var_qmc, var_hash)


def test_sobol_window_prefetch_parity():
    """prefetch(K) windowed draws are bitwise identical to per-draw gathers,
    across bases (incl. the 512-row clamp edge), 2d/1d sites, and skip."""
    import jax.numpy as jnp

    from tungsten_tpu.sampling.sampler import Sampler

    N = 257
    lane = jnp.arange(N, dtype=jnp.uint32)
    seed = jnp.array([123, 77], jnp.uint32)
    samp = jnp.full((N,), 5, jnp.uint32)
    pix = jnp.arange(N, dtype=jnp.uint32) * 31
    for base in [0, 2, 26, 505, 511, 520]:
        s0 = Sampler(seed, lane, jnp.full((N,), base, jnp.int32), None,
                     samp, pix, True)
        sw = s0.prefetch(8)
        s0, sw = s0.skip(1), sw.skip(1)
        for k in range(7):  # offsets 1..7, the last past-window draws re-gather
            u_a, s0 = s0.next_2d()
            u_b, sw = sw.next_2d()
            assert jnp.array_equal(u_a, u_b), (base, k)
