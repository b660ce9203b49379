"""Kelemen-style primary-sample-space MLT (PSSMLT).

Mirror of src/core/integrators/kelemen_mlt/ (MetropolisSampler.hpp:14-160,
KelemenMltIntegrator.cpp bootstrap :69-124, KelemenMltTracer chain loop
:103-146 with expected-value splatting :116-138), in the path-traced variant
(settings "bidirectional": false — the reference supports both).

TPU design (SURVEY.md §7): thousands of *parallel* Markov chains, one
mutation step per wavefront dispatch. Chain state is the primary-sample
table (N, D, 2) consumed by the table-driven Sampler; mutations are the
Kelemen large-step/small-step kernels applied to the whole table at once.
Bootstrap luminances seed the chains proportionally and set the luminance
scale b; contributions splat with expected-value weights (1-a) / a.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sampling import Sampler
from ..sampling.sampler import pcg4d, _to_unit_float
from ..scene.flatten import FlatScene
from .light_tracer import splat_filtered
from .path_tracer import DIMS_PER_BOUNCE, trace_pass

S1 = 1.0 / 1024.0  # Kelemen mutation sizes (MetropolisSampler.hpp)
S2 = 1.0 / 64.0


def _table_dims(meta):
    return 5 + DIMS_PER_BOUNCE * min(meta.max_bounces, 12)


def _luminance(rgb):
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722


def _rand(shape, seed0, seed1, salt):
    """Stateless uniform grid for the driver's own decisions."""
    n = int(np.prod(shape))
    i = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    r0, r1, _, _ = pcg4d(
        i, jnp.full((n,), salt, jnp.uint32),
        jnp.broadcast_to(seed0, (n,)), jnp.broadcast_to(seed1, (n,)),
    )
    return _to_unit_float(r0).reshape(shape), _to_unit_float(r1).reshape(shape)


def _mutate_small(table, u_dir, u_mag):
    """Kelemen small-step kernel: du = s2 * exp(-log(s2/s1) * xi), sign from
    a second uniform, wrap to [0, 1) (MetropolisSampler::mutate :43)."""
    mag0 = S2 * jnp.exp(-jnp.log(S2 / S1) * u_mag[..., 0])
    mag1 = S2 * jnp.exp(-jnp.log(S2 / S1) * u_mag[..., 1])
    d0 = jnp.where(u_dir[..., 0] < 0.5, mag0, -mag0)
    d1 = jnp.where(u_dir[..., 1] < 0.5, mag1, -mag1)
    out = table + jnp.stack([d0, d1], axis=-1)
    return out - jnp.floor(out)


def _eval(scene, table, lane_ids, seed):
    """Trace the paths encoded by the table; returns (rad, px, py, pixel_f)."""
    meta = scene.meta
    w, h = meta.res_x, meta.res_y
    u_pix = table[:, 0, :]
    px = jnp.minimum((u_pix[:, 0] * w).astype(jnp.int32), w - 1)
    py = jnp.minimum((u_pix[:, 1] * h).astype(jnp.int32), h - 1)
    rad = trace_pass(scene, seed, lane_ids, px, py, table)
    if isinstance(rad, tuple):
        rad = rad[0]
    pixel_f = jnp.stack([px + 0.5, py + 0.5], axis=-1)
    return rad, pixel_f


def _eval_bdpt(scene, table, lane_ids, seed, sel=None, skip_dims=1):
    """Bidirectional chain evaluation (KelemenMltTracer.cpp:26-85: the full
    BDPT connection set per primary-sample vector). Returns a dict of the
    chain's splat set: eye value at the chain pixel + every t=1 splat, plus
    the total luminance in eye units (t1 values are light-tracer units, so
    they weigh in at 1/n_pix — see render_bdpt's normalization)."""
    from .bdpt import _bdpt_sample

    meta = scene.meta
    w, h = meta.res_x, meta.res_y
    u_pix = table[:, 0, :]
    px = jnp.minimum((u_pix[:, 0] * w).astype(jnp.int32), w - 1)
    py = jnp.minimum((u_pix[:, 1] * h).astype(jnp.int32), h - 1)
    out = _bdpt_sample(scene, seed, lane_ids, px, py, table=table,
                       skip_dims=skip_dims, sel=sel, collect=True)
    inv_pix = 1.0 / (w * h)
    t1 = jnp.where(out["t1_ok"][..., None], out["t1_val"], 0.0) * inv_pix
    lum = _luminance(out["eye"]) + _luminance(t1).sum(axis=1)
    return dict(
        eye=out["eye"],
        pix=jnp.stack([px + 0.5, py + 0.5], axis=-1),
        t1_val=t1,
        t1_pixf=out["t1_pixf"],
        lum=lum,
    )


def _splat_chain(buf, ev, weight, res_x, res_y, filter_name="tent"):
    """Splat one chain state's full splat set with scalar per-chain weight."""
    buf = splat_filtered(buf, ev["pix"], ev["eye"] * weight[:, None],
                         weight > 0, res_x, res_y, filter_name=filter_name)
    S = ev["t1_val"].shape[1]
    for i in range(S):
        buf = splat_filtered(
            buf, ev["t1_pixf"][:, i], ev["t1_val"][:, i] * weight[:, None],
            weight > 0, res_x, res_y, filter_name=filter_name,
        )
    return buf


def _mlt_step_impl(scene: FlatScene, state, lane_ids, seed, step_idx, p_large, b):
    """One Metropolis mutation for all chains + expected-value splats."""
    meta = scene.meta
    table = state["table"]
    n, dims, _ = table.shape

    s0 = seed[0] ^ jnp.uint32(0xDEADBEEF)  # decorrelate from trace draws
    u_large, _ = _rand((n,), s0, seed[1], jnp.uint32(step_idx) * 4 + 0)
    ud0, ud1 = _rand((n, dims), s0, seed[1], jnp.uint32(step_idx) * 4 + 1)
    um0, um1 = _rand((n, dims), s0, seed[1], jnp.uint32(step_idx) * 4 + 2)
    fresh = jnp.stack([ud0, um0], axis=-1)  # reuse as fresh uniforms

    large = u_large < p_large
    small = _mutate_small(table, jnp.stack([ud0, um0], -1), jnp.stack([ud1, um1], -1))
    proposal = jnp.where(large[:, None, None], fresh, small)

    rad_p, pix_p = _eval(scene, proposal, lane_ids, seed)
    lum_p = _luminance(rad_p)

    a = jnp.clip(lum_p / jnp.maximum(state["lum"], 1e-20), 0.0, 1.0)

    # expected-value splats (KelemenMltTracer.cpp:116-138)
    w_cur = (1.0 - a) * b / jnp.maximum(state["lum"], 1e-20)
    w_prop = a * b / jnp.maximum(lum_p, 1e-20)
    buf = state["splat"]
    buf = splat_filtered(
        buf, state["pix"], state["rad"] * w_cur[:, None],
        state["lum"] > 0, meta.res_x, meta.res_y, filter_name=meta.filter,
    )
    buf = splat_filtered(
        buf, pix_p, rad_p * w_prop[:, None], lum_p > 0, meta.res_x, meta.res_y,
        filter_name=meta.filter,
    )

    u_acc, _ = _rand((n,), s0, seed[1], jnp.uint32(step_idx) * 4 + 3)
    accept = u_acc < a
    return dict(
        table=jnp.where(accept[:, None, None], proposal, table),
        rad=jnp.where(accept[:, None], rad_p, state["rad"]),
        lum=jnp.where(accept, lum_p, state["lum"]),
        pix=jnp.where(accept[:, None], pix_p, state["pix"]),
        splat=buf,
    )


mlt_step = jax.jit(_mlt_step_impl)


@partial(jax.jit, static_argnames=("k",))
def mlt_steps(scene: FlatScene, state, lane_ids, seed, step0, k, p_large, b):
    """k mutation steps fused into ONE dispatch (a host round-trip per step
    costs ~25 ms on the tunneled runtime; fusing makes the chain loop
    device-resident like trace_batch)."""

    def body(i, st):
        return _mlt_step_impl(
            scene, st, lane_ids, seed, (step0 + i).astype(jnp.uint32), p_large, b
        )

    return jax.lax.fori_loop(0, k, body, state)


def _mlt_step_bdpt_impl(scene, state, lane_ids, seed, step_idx, p_large, bw,
                        v_sel=None, skip_dims=1):
    """One Metropolis mutation for bidirectional chains (full BDPT connection
    set per primary-sample vector, KelemenMltTracer.cpp:26-85) + expected-
    value splats of the whole splat set.

    bw: per-chain normalization c = b * n_chains / n_pop (scalar for the
    single-population Kelemen; per-lane b_V-scaled for multiplexed MLT).
    v_sel: per-lane total vertex count (MMLT) — the technique index s is
    read from table slot 1 and the contribution is scaled by the per-length
    technique count (MultiplexedMltTracer.cpp:52-54)."""
    meta = scene.meta
    table = state["table"]
    n, dims, _ = table.shape

    s0 = seed[0] ^ jnp.uint32(0xDEADBEEF)
    u_large, _ = _rand((n,), s0, seed[1], jnp.uint32(step_idx) * 4 + 0)
    ud0, ud1 = _rand((n, dims), s0, seed[1], jnp.uint32(step_idx) * 4 + 1)
    um0, um1 = _rand((n, dims), s0, seed[1], jnp.uint32(step_idx) * 4 + 2)
    fresh = jnp.stack([ud0, um0], axis=-1)

    large = u_large < p_large
    small = _mutate_small(table, jnp.stack([ud0, um0], -1), jnp.stack([ud1, um1], -1))
    proposal = jnp.where(large[:, None, None], fresh, small)

    if v_sel is not None:
        ntech = jnp.where(v_sel <= 2, 1, v_sel).astype(jnp.float32)
        s_sel = jnp.minimum(
            (proposal[:, 1, 0] * ntech).astype(jnp.int32), v_sel - 1
        )
        s_sel = jnp.where(v_sel <= 2, 0, s_sel)
        sel = (s_sel, v_sel)
    else:
        ntech = None
        sel = None

    ev_p = _eval_bdpt(scene, proposal, lane_ids, seed, sel=sel, skip_dims=skip_dims)
    if ntech is not None:
        ev_p = dict(
            ev_p,
            eye=ev_p["eye"] * ntech[:, None],
            t1_val=ev_p["t1_val"] * ntech[:, None, None],
            lum=ev_p["lum"] * ntech,
        )

    a = jnp.clip(ev_p["lum"] / jnp.maximum(state["lum"], 1e-20), 0.0, 1.0)
    w_cur = (1.0 - a) * bw / jnp.maximum(state["lum"], 1e-20)
    w_prop = a * bw / jnp.maximum(ev_p["lum"], 1e-20)

    ev_cur = dict(eye=state["eye"], pix=state["pix"],
                  t1_val=state["t1_val"], t1_pixf=state["t1_pixf"])
    buf = state["splat"]
    buf = _splat_chain(buf, ev_cur, jnp.where(state["lum"] > 0, w_cur, 0.0),
                       meta.res_x, meta.res_y, filter_name=meta.filter)
    buf = _splat_chain(buf, ev_p, jnp.where(ev_p["lum"] > 0, w_prop, 0.0),
                       meta.res_x, meta.res_y, filter_name=meta.filter)

    u_acc, _ = _rand((n,), s0, seed[1], jnp.uint32(step_idx) * 4 + 3)
    accept = u_acc < a
    acc3 = accept[:, None]
    return dict(
        table=jnp.where(accept[:, None, None], proposal, table),
        eye=jnp.where(acc3, ev_p["eye"], state["eye"]),
        pix=jnp.where(acc3, ev_p["pix"], state["pix"]),
        t1_val=jnp.where(accept[:, None, None], ev_p["t1_val"], state["t1_val"]),
        t1_pixf=jnp.where(accept[:, None, None], ev_p["t1_pixf"], state["t1_pixf"]),
        lum=jnp.where(accept, ev_p["lum"], state["lum"]),
        splat=buf,
    )


@partial(jax.jit, static_argnames=("k", "skip_dims"))
def mlt_steps_bdpt(scene: FlatScene, state, lane_ids, seed, step0, k, p_large,
                   bw, v_sel=None, skip_dims=1):
    def body(i, st):
        return _mlt_step_bdpt_impl(
            scene, st, lane_ids, seed, (step0 + i).astype(jnp.uint32),
            p_large, bw, v_sel, skip_dims,
        )

    return jax.lax.fori_loop(0, k, body, state)


def _table_dims_bdpt(meta, k_max, extra=1):
    """Primary-sample slots consumed by one _bdpt_sample: driver slots +
    camera root (2) + light root (4) + 5 per subpath step, both subpaths."""
    return extra + 2 + 4 + 2 * 5 * (k_max - 1)


def render_kelemen_bdpt(
    scene: FlatScene,
    spp=None,
    seed=0xBA5EBA11,
    n_chains=1 << 13,
    p_large=0.1,
    bootstrap_factor=16,
    verbose=False,
    mesh=None,
    resume_file=None,
    scene_hash_value="",
):
    """Bidirectional PSSMLT (the reference's default "bidirectional": true
    mode): each primary-sample vector drives one camera + one light subpath
    and the full (s, t) connection set; acceptance on the total splat-set
    luminance. Total mutations = spp * W * H."""
    meta = scene.meta
    spp = spp if spp is not None else meta.spp
    w, h = meta.res_x, meta.res_y
    k_max = min(meta.max_bounces + 1, meta.bdpt_max_vertices)
    dims = _table_dims_bdpt(meta, k_max)
    lane_ids = jnp.arange(n_chains, dtype=jnp.uint32)
    seed_arr = jnp.array([seed & 0xFFFFFFFF, 0x60000], jnp.uint32)

    boot = []
    for i in range(bootstrap_factor):
        u0, u1 = _rand((n_chains, dims), seed_arr[0] ^ jnp.uint32(0xDEADBEEF),
                       seed_arr[1], jnp.uint32(0x7E000 + i))
        tbl = jnp.stack([u0, u1], axis=-1)
        ev = _eval_bdpt(scene, tbl, lane_ids, seed_arr)
        boot.append((tbl, ev))
    lums = jnp.concatenate([ev["lum"] for _, ev in boot])
    b = float(jnp.mean(lums))
    if b <= 0:
        return np.zeros((h, w, 3), np.float32)
    p = np.asarray(lums, np.float64)
    p = p / p.sum()
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(p), size=n_chains, p=p)
    which = sel // n_chains
    idx = sel % n_chains
    tables = jnp.stack([t for t, _ in boot])
    table = tables[which, idx]
    evs = jax.tree.map(lambda *xs: jnp.stack(xs)[which, idx], *[ev for _, ev in boot])

    state = dict(
        table=table,
        eye=evs["eye"], pix=evs["pix"], t1_val=evs["t1_val"],
        t1_pixf=evs["t1_pixf"], lum=evs["lum"],
        splat=jnp.zeros((w * h, 3), jnp.float32),
    )
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_chain_state, shard_lanes

        scene = replicate(mesh, scene)
        lane_ids = shard_lanes(mesh, lane_ids)
        state = shard_chain_state(mesh, state, n_chains)

    total_mutations = spp * w * h
    steps = max(1, total_mutations // n_chains)
    chunk = 16
    it = 0
    if resume_file:
        loaded = load_mlt_state(resume_file, scene_hash_value)
        if loaded is not None:
            state, _, it = loaded
            if verbose:
                print(f"  resumed at mlt step {it}")
    while it < steps:
        k = min(chunk, steps - it)
        state = mlt_steps_bdpt(
            scene, state, lane_ids, seed_arr, jnp.uint32(it), k,
            jnp.float32(p_large), jnp.float32(b),
        )
        it += k
        if verbose:
            print(f"  mlt-bdpt step {it}/{steps}")
    if resume_file:
        save_mlt_state(resume_file, scene_hash_value, state, it)
    img = np.asarray(state["splat"]).reshape(h, w, 3) / (steps * n_chains)
    return img * (w * h)


def render_kelemen(
    scene: FlatScene,
    spp=None,
    seed=0xBA5EBA11,
    n_chains=1 << 14,
    p_large=0.1,
    bootstrap_factor=16,
    verbose=False,
    mesh=None,
    resume_file=None,
    scene_hash_value="",
):
    """Full PSSMLT render. Total mutations = spp * W * H."""
    meta = scene.meta
    spp = spp if spp is not None else meta.spp
    w, h = meta.res_x, meta.res_y
    dims = _table_dims(meta)
    lane_ids = jnp.arange(n_chains, dtype=jnp.uint32)
    seed_arr = jnp.array([seed & 0xFFFFFFFF, 0x50000], jnp.uint32)

    # ---- bootstrap: fresh tables, luminance scale, seed selection ----
    n_boot = n_chains * bootstrap_factor
    boot_lums = []
    boot_tables = []
    for i in range(bootstrap_factor):
        u0, u1 = _rand((n_chains, dims), seed_arr[0] ^ jnp.uint32(0xDEADBEEF), seed_arr[1], jnp.uint32(0x7F000 + i))
        tbl = jnp.stack([u0, u1], axis=-1)
        rad, pix = _eval(scene, tbl, lane_ids, seed_arr)
        boot_lums.append(_luminance(rad))
        boot_tables.append((tbl, rad, pix))
    lums = jnp.concatenate(boot_lums)
    b = float(jnp.mean(lums))
    if b <= 0:
        return np.zeros((h, w, 3), np.float32)
    # luminance-proportional seed selection (KelemenMltIntegrator :102-124)
    p = np.asarray(lums, np.float64)
    p = p / p.sum()
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(p), size=n_chains, p=p)
    which = sel // n_chains
    idx = sel % n_chains
    # vectorized gather of the selected seeds
    tables = jnp.stack([bt[0] for bt in boot_tables])  # (F, N, D, 2)
    rads = jnp.stack([bt[1] for bt in boot_tables])
    pixs = jnp.stack([bt[2] for bt in boot_tables])
    table = tables[which, idx]
    rad = rads[which, idx]
    pix = pixs[which, idx]

    state = dict(
        table=table,
        rad=rad,
        lum=_luminance(rad),
        pix=pix,
        splat=jnp.zeros((w * h, 3), jnp.float32),
    )
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_chain_state, shard_lanes

        scene = replicate(mesh, scene)
        lane_ids = shard_lanes(mesh, lane_ids)
        state = shard_chain_state(mesh, state, n_chains)

    total_mutations = spp * w * h
    steps = max(1, total_mutations // n_chains)
    chunk = 32
    it = 0
    if resume_file:
        loaded = load_mlt_state(resume_file, scene_hash_value)
        if loaded is not None:
            state, _, it = loaded
            if verbose:
                print(f"  resumed at mlt step {it}")
    while it < steps:
        k = min(chunk, steps - it)
        state = mlt_steps(
            scene, state, lane_ids, seed_arr, jnp.uint32(it), k,
            jnp.float32(p_large), jnp.float32(b),
        )
        it += k
        if verbose:
            print(f"  mlt step {it}/{steps}")
    if resume_file:
        save_mlt_state(resume_file, scene_hash_value, state, it)
    img = np.asarray(state["splat"]).reshape(h, w, 3) / (steps * n_chains)
    return img * (w * h)


# ---- MLT chain-state checkpoint/resume --------------------------------------
# The reference CANNOT resume its splatting integrators (Integrator.cpp:117,
# saveState only covers the sample buffers — its own known gap). Here the
# complete chain population (primary-sample tables, cached splat sets,
# luminances, the accumulated splat buffer, and the per-length budgeting
# arrays) round-trips through one npz, so Kelemen/MMLT/RJ-MLT renders
# checkpoint and resume exactly.

def save_mlt_state(path, scene_hash, state, it, extras=None):
    import json as _json
    import os as _os

    header = _json.dumps({"scene_hash": scene_hash, "it": int(it)})
    arrs = {f"s_{k}": np.asarray(v) for k, v in state.items()}
    for k, v in (extras or {}).items():
        arrs[f"x_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __header__=np.frombuffer(header.encode(), np.uint8), **arrs)
    _os.replace(tmp, path)


def load_mlt_state(path, scene_hash):
    """Returns (state dict, extras dict, it) or None on mismatch/absence."""
    import json as _json
    import os as _os

    if not _os.path.exists(path):
        return None
    z = np.load(path)
    header = _json.loads(bytes(z["__header__"]).decode())
    if header["scene_hash"] != scene_hash:
        return None
    state = {k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("s_")}
    extras = {k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("x_")}
    return state, extras, int(header["it"])
