"""Photon mapping / SPPM (stochastic progressive photon mapping).

Mirror of src/core/integrators/photon_map/ + progressive_photon_map/
(PhotonTracer::tracePhotonPath :422 deposits surface photons;
traceSensorPath :246-420 walks specular chains and density-estimates at the
first non-specular hit; ProgressivePhotonMapIntegrator.cpp:42-110 drives
iterations with the radius schedule gamma = prod (i+alpha)/(i+1)).

TPU design (SURVEY.md §7): the kd-tree kNN gather becomes a *fixed-radius
hash grid* — photon cell keys sorted on device (one lax.sort), cell ranges
found by searchsorted, and the camera gather reads each of the 27 neighbor
cells as one bundled contiguous fetch (XLA row-gather cost is width-
independent). Mathematically the same fixed-radius density estimate
(sum of photon power * f / (pi r^2)); per-cell photon counts are capped at
MAX_PER_CELL (overflow is counted and reported — raise photon count or radius
granularity if it triggers).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..math import vecops as vo
from ..models.bsdfs import bsdf_eval, bsdf_sample
from ..models.bsdfs.common import Lobes
from ..models.cameras import camera_rays
from ..models.primitives import lights as L
from ..models.textures import eval_texture
from ..sampling import Sampler, warps
from ..scene.flatten import DEFAULT_EPSILON, FlatScene
from .path_tracer import DIMS_PER_BOUNCE, INF, _intersect, _shading_data

MAX_PER_CELL = 32
GRID_SIZE = 1 << 20  # hash table size (cells)


def _hash_cell(ix, iy, iz):
    """Spatial hash (pcg-ish mix) -> [0, GRID_SIZE)."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(73856093)
        ^ iy.astype(jnp.uint32) * jnp.uint32(19349663)
        ^ iz.astype(jnp.uint32) * jnp.uint32(83492791)
    )
    return (h % jnp.uint32(GRID_SIZE)).astype(jnp.uint32)


@partial(jax.jit, static_argnames=("k_max",))
def trace_photons(scene: FlatScene, seed, lane_ids, k_max=6):
    """Trace one photon path per lane; deposit a photon at every diffuse
    surface interaction. Returns (pos (N*K, 3), power (N*K, 3), wi (N*K, 3),
    valid (N*K,)) — wi points back along the photon's incoming direction."""
    meta = scene.meta
    n = lane_ids.shape[0]
    sampler = Sampler.create(seed, lane_ids)

    u_li, sampler = sampler.next_1d()
    li = jnp.minimum((u_li * meta.n_lights).astype(jnp.int32), meta.n_lights - 1)
    u_tri, sampler = sampler.next_1d()
    u_pos, sampler = sampler.next_2d()
    em = L.sample_emitter_position(scene, li, u_tri, u_pos)
    u_dir, sampler = sampler.next_2d()
    d_loc = warps.cosine_hemisphere(u_dir)
    t_e, b_e = vo.tangent_frame(em.ng)
    d0 = vo.to_global(t_e, b_e, em.ng, d_loc)
    power0 = em.weight * meta.n_lights  # pi*A*Le / pick

    ph_pos = jnp.zeros((n, k_max, 3))
    ph_pow = jnp.zeros((n, k_max, 3))
    ph_wi = jnp.zeros((n, k_max, 3))
    ph_valid = jnp.zeros((n, k_max), bool)

    state = dict(
        o=em.p, d=d0, power=power0, alive=em.valid,
        pos=ph_pos, pw=ph_pow, wi=ph_wi, val=ph_valid,
        base_dim=sampler.dim, seed=sampler.seed, lane_id=sampler.lane_id,
    )

    def body(k, s):
        smp = Sampler(s["seed"], s["lane_id"], s["base_dim"] + k * DIMS_PER_BOUNCE)
        o, d, alive, power = s["o"], s["d"], s["alive"], s["power"]
        hit = _intersect(scene, o, d, jnp.full((n,), DEFAULT_EPSILON), jnp.where(alive, INF, 0.0))
        did_hit = (hit.prim >= 0) & alive

        p, ng, ns, uv, mat_id, light_id = _shading_data(scene, hit, o, d)
        lobes = scene.materials.lobes[mat_id]
        ctx = (scene.materials, scene.textures)
        hit_backside = vo.dot(ns, d) > 0.0
        flip = hit_backside & ~Lobes.is_transmissive(lobes) if meta.enable_two_sided else jnp.zeros_like(hit_backside)
        nf = vo.where3(flip, -ns, ns)
        t_ax, b_ax = vo.tangent_frame(nf)
        t_ax = vo.where3(flip, -t_ax, t_ax)
        wi_l = vo.to_local(t_ax, b_ax, nf, -d)

        # deposit at non-pure-specular hits (PhotonTracer deposits where the
        # surface has a diffuse/glossy component)
        deposit = did_hit & ~Lobes.is_pure_specular(lobes) & (lobes != 0)
        s["pos"] = s["pos"].at[:, k].set(jnp.where(deposit[..., None], p, 0.0))
        s["pw"] = s["pw"].at[:, k].set(jnp.where(deposit[..., None], power, 0.0))
        s["wi"] = s["wi"].at[:, k].set(-d)
        s["val"] = s["val"].at[:, k].set(deposit)

        # continue (adjoint)
        u2, smp = smp.next_2d()
        u1, smp = smp.next_1d()
        bs = bsdf_sample(ctx, mat_id, uv, wi_l, u2, u1)
        wo_w = vo.to_global(t_ax, b_ax, nf, bs.wo)
        from ..models.bsdfs.dispatch import bsdf_eta_sq

        eta2 = bsdf_eta_sq(ctx, mat_id, uv, wi_l, bs.wo)
        corr = jnp.abs(
            (vo.dot(wo_w, ng) * wi_l[..., 2])
            / jnp.maximum(jnp.abs(vo.dot(-d, ng) * bs.wo[..., 2]), 1e-20)
        )
        power = power * jnp.where(
            did_hit[..., None], bs.weight * (corr / jnp.maximum(eta2, 1e-20))[..., None], 1.0
        )
        alive = did_hit & bs.valid & (vo.max3(jnp.abs(power)) > 0.0)

        # roulette on photon power
        rp = jnp.minimum(vo.max3(jnp.abs(power)), 1.0)
        u_rr, smp = smp.next_1d()
        do_rr = (k > 1) & (rp < 0.5)
        survive = u_rr < rp
        power = jnp.where((do_rr & survive)[..., None], power / jnp.maximum(rp, 1e-20)[..., None], power)
        alive = alive & (~do_rr | survive)

        s.update(o=p, d=wo_w, power=power, alive=alive)
        return s

    final = jax.lax.fori_loop(0, k_max, body, state)
    return (
        final["pos"].reshape(n * k_max, 3),
        final["pw"].reshape(n * k_max, 3),
        final["wi"].reshape(n * k_max, 3),
        final["val"].reshape(n * k_max),
    )


@jax.jit
def build_photon_grid(pos, power, wi, valid, radius):
    """Sort photons by hash-grid cell (cell size = gather radius).
    Returns sorted photon arrays + (cell_start, cell_count) tables."""
    cell = jnp.where(
        valid[:, None], jnp.floor(pos / radius).astype(jnp.int32), 1 << 28
    )
    key = jnp.where(valid, _hash_cell(cell[:, 0], cell[:, 1], cell[:, 2]), jnp.uint32(GRID_SIZE))
    order = jnp.argsort(key)
    key_s = key[order]
    pack = jnp.concatenate([pos, power, wi], axis=1)[order]
    starts = jnp.searchsorted(key_s, jnp.arange(GRID_SIZE, dtype=jnp.uint32), side="left")
    ends = jnp.searchsorted(key_s, jnp.arange(GRID_SIZE, dtype=jnp.uint32), side="right")
    counts = (ends - starts).astype(jnp.int32)
    return pack, starts.astype(jnp.int32), counts


@jax.jit
def gather_pass(scene: FlatScene, seed, lane_ids, px, py, pack, starts, counts,
                radius, n_emitted):
    """Camera pass: specular-chain walk + fixed-radius photon density estimate
    at the first non-specular hit (PhotonTracer::traceSensorPath)."""
    meta = scene.meta
    n = px.shape[0]
    sampler = Sampler.create(seed, lane_ids)
    u_cam, sampler = sampler.next_2d()
    u_lens, sampler = sampler.next_2d()
    o, d = camera_rays(scene.camera, meta, px, py, u_cam, u_lens)

    state = dict(
        o=o, d=d, throughput=jnp.ones((n, 3)), emission=jnp.zeros((n, 3)),
        alive=jnp.ones((n,), bool), gathered=jnp.zeros((n,), bool),
        gp=jnp.zeros((n, 3)), gn=jnp.zeros((n, 3)), gwi=jnp.zeros((n, 3)),
        gmat=jnp.zeros((n,), jnp.int32), guv=jnp.zeros((n, 2)),
        near=jnp.full((n,), 1e-4),
        base_dim=sampler.dim, seed=sampler.seed, lane_id=sampler.lane_id,
    )

    def body(k, s):
        smp = Sampler(s["seed"], s["lane_id"], s["base_dim"] + k * DIMS_PER_BOUNCE)
        o, d, alive = s["o"], s["d"], s["alive"]
        throughput, emission = s["throughput"], s["emission"]
        hit = _intersect(scene, o, d, s["near"], jnp.where(alive, INF, 0.0))
        did_hit = (hit.prim >= 0) & alive

        # env on miss
        if meta.has_env:
            miss = alive & ~did_hit
            emission = emission + jnp.where(
                miss[..., None], throughput * L.env_radiance(scene, d), 0.0
            )

        p, ng, ns, uv, mat_id, light_id = _shading_data(scene, hit, o, d)
        lobes = scene.materials.lobes[mat_id]
        ctx = (scene.materials, scene.textures)
        hit_backside = vo.dot(ns, d) > 0.0
        flip = hit_backside & ~Lobes.is_transmissive(lobes) if meta.enable_two_sided else jnp.zeros_like(hit_backside)
        nf = vo.where3(flip, -ns, ns)
        t_ax, b_ax = vo.tangent_frame(nf)
        t_ax = vo.where3(flip, -t_ax, t_ax)
        wi_l = vo.to_local(t_ax, b_ax, nf, -d)

        # emission at hit
        geo_front = vo.dot(d, ng) < 0.0
        e_hit = eval_texture(scene.textures, scene.lights.tex[jnp.maximum(light_id, 0)], uv)
        emission = emission + jnp.where(
            (did_hit & (light_id >= 0) & geo_front)[..., None], throughput * e_hit, 0.0
        )

        # stop & record gather point at the first non-pure-specular hit
        is_spec = Lobes.is_pure_specular(lobes)
        record = did_hit & ~is_spec & (lobes != 0)
        s["gp"] = vo.where3(record, p, s["gp"])
        s["gn"] = vo.where3(record, nf, s["gn"])
        s["gwi"] = vo.where3(record, -d, s["gwi"])
        s["gmat"] = jnp.where(record, mat_id, s["gmat"])
        s["guv"] = jnp.where(record[..., None], uv, s["guv"])
        s["gathered"] = s["gathered"] | record
        g_throughput = throughput

        # specular lanes continue
        u2, smp = smp.next_2d()
        u1, smp = smp.next_1d()
        bs = bsdf_sample(ctx, mat_id, uv, wi_l, u2, u1)
        wo_w = vo.to_global(t_ax, b_ax, nf, bs.wo)
        throughput = throughput * jnp.where((did_hit & is_spec)[..., None], bs.weight, 1.0)
        alive = did_hit & is_spec & bs.valid & ~record

        s.update(
            o=p, d=wo_w, throughput=throughput, emission=emission, alive=alive,
            near=jnp.full((n,), DEFAULT_EPSILON),
        )
        return s

    # remember throughput at the recorded gather point: recompute by running
    # the loop with capture (throughput frozen when gathered)
    def body2(k, s):
        s2 = body(k, dict(s))
        # freeze throughput snapshot at the moment of gathering
        newly = s2["gathered"] & ~s["gathered"]
        s2["gthr"] = vo.where3(newly, s["throughput"], s["gthr"])
        return s2

    state["gthr"] = jnp.ones((n, 3))
    final = jax.lax.fori_loop(0, min(meta.max_bounces, 8), body2, state)

    # ---- photon gather at (gp, gn) ----
    gp = final["gp"]
    cell = jnp.floor(gp / radius).astype(jnp.int32)
    contrib = jnp.zeros((n, 3))
    t_ax, b_ax = vo.tangent_frame(final["gn"])
    wi_l = vo.to_local(t_ax, b_ax, final["gn"], final["gwi"])
    ctx = (scene.materials, scene.textures)
    total = pack.shape[0]

    # accumulate the 27 neighbor cells with a lax loop over cell offsets:
    # materializing the concatenated (N, 27M, 9) bundle padded its 9-wide
    # minor dim 14x in HBM and OOMed big scenes; per-cell temps are 27x
    # smaller and the offsets loop compiles once
    offsets = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        jnp.int32,
    )
    marange = jnp.arange(MAX_PER_CELL)
    gmat_f = jnp.repeat(final["gmat"][:, None], MAX_PER_CELL, 1).reshape(-1)
    guv_f = jnp.repeat(final["guv"][:, None], MAX_PER_CELL, 1).reshape(-1, 2)
    wi_f = jnp.repeat(wi_l[:, None], MAX_PER_CELL, 1).reshape(-1, 3)

    def cell_body(k, acc):
        off = offsets[k]
        h = _hash_cell(cell[:, 0] + off[0], cell[:, 1] + off[1], cell[:, 2] + off[2])
        start = starts[h]
        cnt = jnp.minimum(counts[h], MAX_PER_CELL)
        idx = jnp.clip(start[:, None] + marange[None, :], 0, total - 1)
        ph = pack[idx]  # (N, M, 9) one bundled fetch
        mask = marange[None, :] < cnt[:, None]
        dvec = ph[..., 0:3] - gp[:, None, :]
        in_r = mask & (vo.length_sq(dvec) < radius * radius)
        wo_ph = vo.to_local(
            t_ax[:, None, :], b_ax[:, None, :], final["gn"][:, None, :], ph[..., 6:9]
        )
        f = bsdf_eval(
            ctx, gmat_f, guv_f, wi_f, wo_ph.reshape(-1, 3), nonspecular_only=True
        ).reshape(n, MAX_PER_CELL, 3)
        # photon estimate uses plain f (the cos is already in the photon
        # flux); bsdf_eval folds in |cos wo| -- divide it back out
        cos_o = jnp.abs(wo_ph[..., 2])
        f = f / jnp.maximum(cos_o, 1e-6)[..., None]
        return acc + jnp.sum(jnp.where(in_r[..., None], f * ph[..., 3:6], 0.0), axis=1)

    contrib = jax.lax.fori_loop(0, 27, cell_body, jnp.zeros((n, 3)))

    density = contrib / (jnp.pi * radius * radius * n_emitted)
    emission = final["emission"] + jnp.where(
        final["gathered"][..., None], final["gthr"] * density, 0.0
    )
    return jnp.where(jnp.isfinite(emission), emission, 0.0)
