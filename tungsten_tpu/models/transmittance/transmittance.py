"""Generalized (non-exponential) free-flight transmittance family.

The Bitterli non-exponential-transport feature (src/core/transmittances/,
Transmittance.hpp:17-57): transmittance depends on whether the endpoints of a
segment are on surfaces or at medium scatter events (history-dependent,
non-reciprocal). Four-case eval:

    surface->surface: surfaceSurface(tau)
    medium->medium:   mediumMedium(tau) / sigmaBar
    mixed:            mediumSurface(tau)

Models: exponential, double_exponential, quadratic, linear, erlang, davis
davis_weinstein, pulse, interpolated (one level of 2-param children). All
batched over lanes with
per-lane type/params (media carry their transmittance in the medium table).

params layout (2 floats): model-specific
    double_exponential: [sigma_a, sigma_b]; quadratic/linear: [max_t];
    erlang: [rate]; davis: [alpha].
"""
from __future__ import annotations

import jax.numpy as jnp

T_EXPONENTIAL = 0
T_DOUBLE_EXPONENTIAL = 1
T_QUADRATIC = 2
T_LINEAR = 3
T_ERLANG = 4
T_DAVIS = 5
T_PULSE = 6
T_DAVIS_WEINSTEIN = 7
T_INTERPOLATED = 8

_NAMES = {
    "exponential": T_EXPONENTIAL,
    "double_exponential": T_DOUBLE_EXPONENTIAL,
    "quadratic": T_QUADRATIC,
    "linear": T_LINEAR,
    "erlang": T_ERLANG,
    "davis": T_DAVIS,
    "pulse": T_PULSE,
    "davis_weinstein": T_DAVIS_WEINSTEIN,
    "interpolated": T_INTERPOLATED,
}

MAX_PULSES = 8


def trans_id(name: str) -> int:
    if name not in _NAMES:
        raise NotImplementedError(f"transmittance model '{name}' not implemented yet")
    return _NAMES[name]


def _cases(ttype, pa, pb, tau, pc=4.0):
    """Returns dict of the four case values, each (N, 3). pa/pb/pc: (N, 1)."""
    e = jnp.exp(-tau)

    de_ss = 0.5 * (jnp.exp(-pa * tau) + jnp.exp(-pb * tau))
    de_sm = 0.5 * (pa * jnp.exp(-pa * tau) + pb * jnp.exp(-pb * tau))
    de_ms = (pa * jnp.exp(-pa * tau) + pb * jnp.exp(-pb * tau)) / (pa + pb)
    de_mm = (pa * pa * jnp.exp(-pa * tau) + pb * pb * jnp.exp(-pb * tau)) / (pa + pb)

    tq = jnp.minimum(tau / pa, 1.0)
    q_ss = 1.0 - 2.0 * tq + tq * tq
    q_sm = (2.0 / pa) * (1.0 - tq)
    q_ms = 1.0 - tq
    q_mm = jnp.where(tau > pa, 0.0, 1.0 / pa)

    l_ss = 1.0 - jnp.minimum(tau / pa, 1.0)
    l_sm = jnp.where(tau > pa, 0.0, 1.0 / pa)
    l_ms = jnp.where(tau > pa, 0.0, 1.0)
    l_mm = jnp.where(jnp.abs(tau - pa) < 1e-3, 1.0, 0.0)

    lam = pa
    er_ss = 0.5 * jnp.exp(-lam * tau) * (2.0 + lam * tau)
    er_ms = jnp.exp(-lam * tau) * (1.0 + lam * tau)
    er_sm = er_ms * lam * 0.5
    er_mm = lam * lam * tau * jnp.exp(-lam * tau)

    al = pa
    d_ss = jnp.power(1.0 + tau / al, -al)
    d_sm = jnp.power(1.0 + tau / al, -(al + 1.0))
    d_ms = d_sm
    d_mm = (1.0 + 1.0 / al) * jnp.power(1.0 + tau / al, -(al + 2.0))

    # davis_weinstein (DavisWeinsteinTransmittance.cpp): tau-dependent alpha
    dw_t = jnp.maximum(tau, 1e-6)
    dw_beta = 2.0 * pa - 1.0
    dw_alpha = jnp.power(dw_t, 1.0 - dw_beta) / jnp.power(
        jnp.maximum(pb, 1e-6), 1.0 + dw_beta
    )
    dw_alpha = jnp.maximum(dw_alpha, 1e-8)
    dw_base = 1.0 + dw_t / dw_alpha
    dw_log = jnp.log(dw_base)
    dw_ss = jnp.power(dw_base, -dw_alpha)
    dw_sm = dw_ss * (
        dw_beta / dw_base - (dw_beta - 1.0) * dw_alpha / dw_t * dw_log
    )
    dw_term1 = dw_beta * (
        -1.0 + dw_beta * (1.0 + dw_t) + (-1.0 + 2.0 * dw_beta) * dw_t / dw_alpha
    ) / (dw_t * dw_base * dw_base)
    dw_term2 = (
        (-1.0 + dw_beta) * dw_beta * dw_alpha / (dw_t * dw_t)
        * (2.0 * dw_t + dw_base) * dw_log
    ) / dw_base
    dw_term3 = (dw_beta - 1.0) * dw_alpha / dw_t * dw_log
    dw_mm = dw_ss * (dw_term1 - dw_term2 + dw_term3 * dw_term3)
    fin = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
    dw_ss, dw_sm, dw_mm = fin(dw_ss), fin(dw_sm), fin(dw_mm)

    # pulse (PulseTransmittance.cpp): piecewise-linear comb, dirac mm
    npul = pc
    rel = (tau - pa) / jnp.maximum(pb - pa, 1e-20)
    idx_f = jnp.clip(npul * rel + 0.5, 0.0, npul)
    idx = jnp.floor(idx_f)
    height = (npul - idx) / npul
    cell = height * (idx_f - idx)
    cell = jnp.where(
        idx > 0,
        cell + (idx - 0.5) - (idx * (idx - 1.0)) / (2.0 * npul),
        cell - 0.5,
    )
    p_ss = 1.0 - (2.0 / npul) * cell
    idx_ms = jnp.clip(jnp.floor(npul * rel + 0.5), 0.0, npul)
    p_ms = 1.0 - idx_ms / npul
    p_sm = 2.0 / jnp.maximum(pb - pa, 1e-20) * p_ms
    idx_mm_f = jnp.clip(npul * rel, 0.0, npul)
    p_mm = (1.0 / npul) * jnp.where(
        jnp.abs(idx_mm_f - jnp.floor(idx_mm_f) - 0.5) < 1e-3, 1.0, 0.0
    )

    def pick(exp_v, de, q, l, er, d, pu, dw):
        out = exp_v
        out = jnp.where(ttype == T_DOUBLE_EXPONENTIAL, de, out)
        out = jnp.where(ttype == T_QUADRATIC, q, out)
        out = jnp.where(ttype == T_LINEAR, l, out)
        out = jnp.where(ttype == T_ERLANG, er, out)
        out = jnp.where(ttype == T_DAVIS, d, out)
        out = jnp.where(ttype == T_PULSE, pu, out)
        out = jnp.where(ttype == T_DAVIS_WEINSTEIN, dw, out)
        return out

    return dict(
        ss=pick(e, de_ss, q_ss, l_ss, er_ss, d_ss, p_ss, dw_ss),
        sm=pick(e, de_sm, q_sm, l_sm, er_sm, d_sm, p_sm, dw_sm),
        ms=pick(e, de_ms, q_ms, l_ms, er_ms, d_ms, p_ms, dw_sm),
        mm=pick(e, de_mm, q_mm, l_mm, er_mm, d_mm, p_mm, dw_mm),
    )


def _interp_blend(params, tau, key):
    """Interpolated transmittance (InterpolatedTransmittance.cpp): lerp of two
    child models. params: [u, typeA, typeB, paA, pbA, paB, pbB, -]. Children
    are limited to 2-parameter models (the reference defaults are linear +
    erlang); the mm case uses the dirac-xor rule for dirac-lobed children."""
    u = params[..., 0:1]
    tA = params[..., 1:2].astype(jnp.int32)
    tB = params[..., 2:3].astype(jnp.int32)
    cA = _cases(tA, params[..., 3:4], params[..., 4:5], tau)
    cB = _cases(tB, params[..., 5:6], params[..., 6:7], tau)
    a, b = cA[key], cB[key]
    if key == "ss":
        sbarA = trans_sigma_bar(tA[..., 0], params[..., 3:5])[..., None]
        sbarB = trans_sigma_bar(tB[..., 0], params[..., 5:7])[..., None]
        sbar = 1.0 / ((1.0 - u) / sbarA + u / sbarB)
        return sbar * ((1.0 - u) * a / sbarA + u * b / sbarB)
    if key == "mm":
        diracA = ((tA == T_LINEAR) | (tA == T_PULSE)) & (a > 0.0)
        diracB = ((tB == T_LINEAR) | (tB == T_PULSE)) & (b > 0.0)
        lin = (1.0 - u) * a + u * b
        one = jnp.where(diracA, a, b)
        return jnp.where(diracA ^ diracB, one, lin)
    if key == "sm":
        # surfaceMedium = mediumSurface * sigmaBar
        ms = (1.0 - u) * cA["ms"] + u * cB["ms"]
        sbarA = trans_sigma_bar(tA[..., 0], params[..., 3:5])[..., None]
        sbarB = trans_sigma_bar(tB[..., 0], params[..., 5:7])[..., None]
        sbar = 1.0 / ((1.0 - u) / sbarA + u / sbarB)
        return ms * sbar
    return (1.0 - u) * a + u * b  # ms


def _apply_interp(ttype, params, tau, cases, present):
    if present is not None and T_INTERPOLATED not in present:
        return cases
    is_i = (ttype[..., None] if ttype.ndim < tau.ndim else ttype) == T_INTERPOLATED
    out = {}
    for key, val in cases.items():
        out[key] = jnp.where(is_i, _interp_blend(params, tau, key), val)
    return out


def trans_sigma_bar(ttype, params):
    pa = params[..., 0]
    pb = params[..., 1]
    out = jnp.ones_like(pa)  # exponential, davis
    out = jnp.where(ttype == T_DOUBLE_EXPONENTIAL, 0.5 * (pa + pb), out)
    out = jnp.where(ttype == T_QUADRATIC, 2.0 / pa, out)
    out = jnp.where(ttype == T_LINEAR, 1.0 / pa, out)
    out = jnp.where(ttype == T_ERLANG, pa * 0.5, out)
    out = jnp.where(ttype == T_PULSE, 2.0 / jnp.maximum(pb - pa, 1e-20), out)
    return out


def _sigma_bar_full(ttype, params, present=None):
    out = trans_sigma_bar(ttype, params)
    if present is None or T_INTERPOLATED in present:
        u = params[..., 0]
        sA = trans_sigma_bar(params[..., 1].astype(jnp.int32), params[..., 3:5])
        sB = trans_sigma_bar(params[..., 2].astype(jnp.int32), params[..., 5:7])
        si = 1.0 / ((1.0 - u) / sA + u / sB)
        out = jnp.where(ttype == T_INTERPOLATED, si, out)
    return out


def _case(ttype, params, tau, key):
    pa = params[..., 0:1]
    pb = params[..., 1:2]
    ttype = ttype[..., None] if tau.ndim > ttype.ndim else ttype
    return _cases(ttype, pa, pb, tau)[key]


def _all_cases(ttype, params, tau, present):
    c = _cases(ttype[..., None], params[..., 0:1], params[..., 1:2], tau, params[..., 2:3])
    return _apply_interp(ttype[..., None], params, tau, c, present)


def trans_eval(ttype, params, tau, start_on_surface, end_on_surface, present=None):
    """Transmittance.eval — tau: (N, 3), flags: (N,) bool."""
    c = _all_cases(ttype, params, tau, present)
    sbar = _sigma_bar_full(ttype, params, present)[..., None]
    both_s = (start_on_surface & end_on_surface)[..., None]
    both_m = (~start_on_surface & ~end_on_surface)[..., None]
    return jnp.where(both_s, c["ss"], jnp.where(both_m, c["mm"] / sbar, c["ms"]))


def trans_surface_prob(ttype, params, tau, start_on_surface, present=None):
    c = _all_cases(ttype, params, tau, present)
    return jnp.where(start_on_surface[..., None], c["ss"], c["ms"])


def trans_medium_pdf(ttype, params, tau, start_on_surface, present=None):
    c = _all_cases(ttype, params, tau, present)
    return jnp.where(start_on_surface[..., None], c["sm"], c["mm"])


def _bisect_sample(cdf_fn, u, iters=42):
    """Reference bisection sampler (DavisWeinsteinTransmittance.cpp:86-117):
    42 halvings from step 1e6 bracket tau to ~1e-6."""
    step = jnp.full_like(u, 1e6)
    x = jnp.full_like(u, 2e6)
    for _ in range(iters):
        x = jnp.where(cdf_fn(x) > u, x - step, x + step)
        step = step * 0.5
    return x


def trans_sample(ttype, params, u, u_b, start_on_surface, present=None):
    """Free-flight tau sample (unitless optical depth). u, u_b: uniforms."""
    pa = params[..., 0]
    pb = params[..., 1]
    u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
    t_exp = -jnp.log1p(-u)

    # double exponential: surface: pick a/b evenly; medium: pick prop sigma
    p_pick = jnp.where(start_on_surface, 0.5, pa / (pa + pb))
    t_de = jnp.where(u_b < p_pick, t_exp / pa, t_exp / pb)

    t_q = jnp.where(start_on_surface, pa * (1.0 - jnp.sqrt(1.0 - u)), pa * u)
    t_l = jnp.where(start_on_surface, pa * u, pa)

    # erlang: surface case uses 10 Newton steps (reference); medium:
    # -log(u1*u2)/lambda
    lam = pa

    def erlang_newton(u):
        x = jnp.full_like(u, 0.5)
        for _ in range(10):
            ss = 0.5 * jnp.exp(-lam * x) * (2.0 + lam * x)
            sm = jnp.exp(-lam * x) * (1.0 + lam * x) * lam * 0.5
            x = jnp.maximum(x + (u - (1.0 - ss)) / jnp.maximum(sm, 1e-20), 0.0)
        return x

    u2c = jnp.clip(u_b, 1e-7, 1.0)
    t_er = jnp.where(
        start_on_surface, erlang_newton(u), -jnp.log(u * u2c) / lam
    )

    al = pa
    t_dv = jnp.where(
        start_on_surface,
        al * (jnp.power(1.0 - u, -1.0 / al) - 1.0),
        al * (jnp.power(1.0 - u, -1.0 / (1.0 + al)) - 1.0),
    )

    # pulse: piecewise-constant comb (PulseTransmittance::sampleSurface /
    # sampleMedium); unrolled over MAX_PULSES with masking
    a = params[..., 0]
    b = params[..., 1]
    npul = params[..., 2]
    delta = 1.0 / jnp.maximum(npul, 1.0)
    xi = u * npul * 0.5
    t_pu_s = jnp.zeros_like(u)
    found = jnp.zeros_like(u, dtype=bool)
    for i in range(MAX_PULSES):
        h0 = 1.0 - i * delta
        h1 = 1.0 - (i + 1.0) * delta
        in_range = i < npul
        hit0 = ~found & in_range & (xi - h0 * 0.5 < 0.0)
        t_pu_s = jnp.where(hit0, a + (i + 0.5 * u_b) * (b - a) * delta, t_pu_s)
        found = found | hit0
        xi = jnp.where(~found & in_range, xi - h0 * 0.5, xi)
        hit1 = ~found & in_range & (xi - h1 * 0.5 < 0.0)
        t_pu_s = jnp.where(hit1, a + (i + 0.5 + 0.5 * u_b) * (b - a) * delta, t_pu_s)
        found = found | hit1
        xi = jnp.where(~found & in_range, xi - h1 * 0.5, xi)
    t_pu_m = a + (0.5 + jnp.floor(u * npul)) * delta * (b - a)
    t_pu = jnp.where(start_on_surface, t_pu_s, t_pu_m)

    out = t_exp
    out = jnp.where(ttype == T_DOUBLE_EXPONENTIAL, t_de, out)
    out = jnp.where(ttype == T_QUADRATIC, t_q, out)
    out = jnp.where(ttype == T_LINEAR, t_l, out)
    out = jnp.where(ttype == T_ERLANG, t_er, out)
    out = jnp.where(ttype == T_DAVIS, t_dv, out)
    out = jnp.where(ttype == T_PULSE, t_pu, out)

    if present is None or T_DAVIS_WEINSTEIN in present:
        # no analytic inverse: bisection on the exact cdf (reference parity)
        h = params[..., 0:1]
        cdw = params[..., 1:2]

        def cdf(x):
            tt = jnp.full(x.shape + (1,), T_DAVIS_WEINSTEIN, jnp.int32)
            c = _cases(tt, h, cdw, x[..., None])
            tr = jnp.where(start_on_surface[..., None], c["ss"], c["ms"])
            return 1.0 - tr[..., 0]

        t_dw = _bisect_sample(cdf, u)
        out = jnp.where(ttype == T_DAVIS_WEINSTEIN, t_dw, out)

    if present is None or T_INTERPOLATED in present:
        # pick a child by ratio then sample it (InterpolatedTransmittance
        # sampleSurface/sampleMedium nextBoolean(u))
        ui = params[..., 0]
        pick_b = u_b < ui
        ct = jnp.where(pick_b, params[..., 2], params[..., 1]).astype(jnp.int32)
        cp = jnp.where(
            pick_b[..., None], params[..., 5:7], params[..., 3:5]
        )
        cp = jnp.concatenate([cp, jnp.full(cp.shape[:-1] + (1,), 4.0)], axis=-1)
        # re-derive a fresh uniform for the child draw (u_b was consumed)
        u_c = jnp.abs(u_b * 7919.0) % 1.0
        t_in = trans_sample(ct, cp, u, u_c, start_on_surface, present=())
        out = jnp.where(ttype == T_INTERPOLATED, t_in, out)
    return out
