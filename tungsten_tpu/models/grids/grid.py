"""Heterogeneous density grids (the reference's grids/ layer).

Re-implements the Grid interface — density / emission / opticalDepth /
inverseOpticalDepth (src/core/grids/Grid.hpp:13-25) — TPU-first: the grid
is a dense HBM-resident array sampled with vectorized trilinear (or
nearest) gathers, and both optical-depth directions are a fixed-step
lockstep raymarch over the ray's grid-bounds overlap (no data-dependent
loop lengths, so the whole march stays inside one fused jit region).

The reference's VdbGrid offers integration methods exact_nearest /
exact_linear / raymarching / residual_ratio (grids/VdbGrid.hpp:16-27;
default ExactLinear, VdbGrid.cpp:52-63). exact_linear/exact_nearest run an
EXACT cell-walk here: a lockstep DDA over the trilinear dual grid whose
per-cell tau uses 2-point Gauss-Legendre — algebraically exact for the
cubic polynomial trilinear interpolation is along a line — and nearest
cells integrate density*length directly (the VdbRaymarcher.hpp DDA
semantics). "raymarching" keeps the fixed-step trapezoid march (stepSize
analog). residual_ratio — a rejection loop around a control density,
hostile to lockstep SIMD — maps onto the exact DDA, which dominates it
(zero variance at comparable cost).

Sources: .npy/.npz dense arrays, procedural test grids, and a minimal
OpenVDB reader (vdb.py) for uncompressed/zip grids.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree, field

from ...math.transform import mat4_from_json

INF = jnp.float32(3.0e38)


@pytree
class DenseGrid:
    """One dense density (+ optional emission) grid with its world<->grid
    transform. Grid coords: continuous [0, nx] x [0, ny] x [0, nz], cell
    (i,j,k) spans [i,i+1) etc. (matches VdbGrid's index-space sampling)."""

    density: jnp.ndarray  # (nz, ny, nx) f32
    emission: jnp.ndarray  # (nz, ny, nx, 3) f32 (zeros when absent)
    w2g: jnp.ndarray  # (3, 4) world -> grid affine
    g2w_scale: jnp.ndarray  # () mean world-units-per-voxel (tau scaling)
    dims: tuple = field(pytree_node=False, default=(1, 1, 1))  # (nx, ny, nz)
    steps: int = field(pytree_node=False, default=96)
    linear: bool = field(pytree_node=False, default=True)
    has_emission: bool = field(pytree_node=False, default=False)
    # exact cell-walk integration (DDA + Gauss-2; VdbGrid ExactLinear) vs
    # the fixed-step trapezoid march ("raymarching")
    exact: bool = field(pytree_node=False, default=True)


def _world_to_grid(g: DenseGrid, p):
    ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,))], axis=-1)
    return ph @ g.w2g.T  # (..., 3) grid coords


def _sample_nearest(g: DenseGrid, q):
    nx, ny, nz = g.dims
    ix = jnp.clip(q[..., 0].astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(q[..., 1].astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(q[..., 2].astype(jnp.int32), 0, nz - 1)
    inside = (
        (q[..., 0] >= 0.0) & (q[..., 0] < nx)
        & (q[..., 1] >= 0.0) & (q[..., 1] < ny)
        & (q[..., 2] >= 0.0) & (q[..., 2] < nz)
    )
    return jnp.where(inside, g.density[iz, iy, ix], 0.0)


def _sample_linear(g: DenseGrid, q, arr=None):
    """Trilinear with zero outside; cell centers at integer+0.5."""
    a = g.density if arr is None else arr
    nx, ny, nz = g.dims
    qc = q - 0.5
    i0 = jnp.floor(qc).astype(jnp.int32)
    f = qc - i0
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix = i0[..., 0] + dx
                iy = i0[..., 1] + dy
                iz = i0[..., 2] + dz
                inb = (
                    (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                    & (iz >= 0) & (iz < nz)
                )
                v = a[
                    jnp.clip(iz, 0, nz - 1),
                    jnp.clip(iy, 0, ny - 1),
                    jnp.clip(ix, 0, nx - 1),
                ]
                wx = jnp.where(dx == 1, f[..., 0], 1.0 - f[..., 0])
                wy = jnp.where(dy == 1, f[..., 1], 1.0 - f[..., 1])
                wz = jnp.where(dz == 1, f[..., 2], 1.0 - f[..., 2])
                wgt = wx * wy * wz
                if arr is None:
                    out = out + jnp.where(inb, v, 0.0) * wgt
                else:
                    out = out + jnp.where(inb[..., None], v, 0.0) * wgt[..., None]
    return out


def grid_density(g: DenseGrid, p):
    q = _world_to_grid(g, p)
    return _sample_linear(g, q) if g.linear else _sample_nearest(g, q)


def grid_emission(g: DenseGrid, p):
    if not g.has_emission:
        return jnp.zeros(p.shape[:-1] + (3,))
    q = _world_to_grid(g, p)
    return _sample_linear(g, q, arr=g.emission)


def _grid_span(g: DenseGrid, o, d, t0, t1):
    """Clip [t0, t1] to the ray's overlap with the grid bounds (slab test
    in grid space)."""
    nx, ny, nz = g.dims
    oq = _world_to_grid(g, o)
    dq = _world_to_grid(g, o + d) - oq
    lo = jnp.zeros(3)
    hi = jnp.asarray([nx, ny, nz], jnp.float32)
    safe = jnp.where(jnp.abs(dq) < 1e-12, 1e-12, dq)
    ta = (lo - oq) / safe
    tb = (hi - oq) / safe
    tmin = jnp.max(jnp.minimum(ta, tb), axis=-1)
    tmax = jnp.min(jnp.maximum(ta, tb), axis=-1)
    return jnp.maximum(t0, tmin), jnp.minimum(t1, tmax)


def grid_march(g: DenseGrid, o, d, t0, t1):
    """Fixed-step march: returns (ts (S+1, N), dens (S+1, N), ta, tb).
    Sample points are the S+1 segment endpoints over the clipped span;
    callers integrate with the trapezoid rule (exact_linear semantics)."""
    S = g.steps
    ta, tb = _grid_span(g, o, d, t0, jnp.minimum(t1, 1e30))
    tb = jnp.maximum(tb, ta)
    frac = jnp.linspace(0.0, 1.0, S + 1)[:, None]
    ts = ta[None, :] + (tb - ta)[None, :] * frac
    p = o[None, :, :] + d[None, :, :] * ts[..., None]
    dens = grid_density(g, p)
    return ts, dens, ta, tb


_G2 = 0.5 / np.sqrt(3.0)  # Gauss-Legendre 2-point node offset on [0, 1]
_MAX_DDA = 4096  # runaway backstop, far above any real cell-crossing count


def _dda_cells(g: DenseGrid, o, d, t0, t1, fn_cell, carry0, early_out=None):
    """Lockstep DDA over the interpolation cells crossed by each ray.

    The trilinear pieces live on the DUAL grid (cell centers at integer
    + 0.5, _sample_linear), so boundaries sit at half-integers; nearest
    sampling pieces live on the data cells (integer boundaries). Each
    round advances every live lane to its next boundary and folds the
    segment [t_cur, t_next] into `carry` via fn_cell(carry, t_cur, t_next,
    oq, dq, live). Exactly the VdbRaymarcher.hpp walk, vectorized."""
    ta, tb = _grid_span(g, o, d, t0, jnp.minimum(t1, 1e30))
    tb = jnp.maximum(tb, ta)
    oq = _world_to_grid(g, o)
    dq = _world_to_grid(g, o + d) - oq
    shift = 0.5 if g.linear else 0.0
    inv_dq = 1.0 / jnp.where(jnp.abs(dq) < 1e-12, 1e-12, dq)

    def next_boundary(t):
        q = (oq + dq * t[..., None]) - shift
        stepped = jnp.where(dq > 0.0, jnp.floor(q) + 1.0, jnp.ceil(q) - 1.0)
        t_ax = (stepped + shift - oq) * inv_dq
        # degenerate axis (|dq|~0): never the minimizer
        t_ax = jnp.where(jnp.abs(dq) < 1e-12, 3.0e37, t_ax)
        tn = jnp.min(t_ax, axis=-1)
        return jnp.maximum(tn, t + 1e-6)  # monotone progress

    def cond(state):
        rounds, t_cur, carry, done = state
        return jnp.any(~done) & (rounds < _MAX_DDA)

    def body(state):
        rounds, t_cur, carry, done = state
        t_next = jnp.minimum(next_boundary(t_cur), tb)
        live = ~done & (t_next > t_cur)
        carry = fn_cell(carry, t_cur, t_next, oq, dq, live)
        new_done = done | (t_next >= tb)
        if early_out is not None:
            new_done = new_done | early_out(carry)
        return rounds + 1, jnp.where(live, t_next, t_cur), carry, new_done

    state = (jnp.int32(0), ta, carry0, tb <= ta)
    _, t_fin, carry, _ = jax.lax.while_loop(cond, body, state)
    return carry, ta, tb


def _segment_tau(g, t_a, t_b, oq, dq):
    """Exact optical depth of [t_a, t_b] inside ONE interpolation cell:
    Gauss-2 (exact for the trilinear cubic) or midpoint (exact for nearest
    piecewise-constant)."""
    h = t_b - t_a
    if g.linear:
        tau = 0.0
        for off in (0.5 - _G2, 0.5 + _G2):
            t = t_a + h * off
            q = oq + dq * t[..., None]
            tau = tau + _sample_linear(g, q)
        return 0.5 * h * tau
    t = t_a + 0.5 * h
    return h * _sample_nearest(g, oq + dq * t[..., None])


def grid_optical_depth(g: DenseGrid, o, d, t0, t1):
    """int_{t0}^{t1} density(o + s d) ds. exact mode: per-cell DDA with
    Gauss-2 (algebraically exact, Grid::opticalDepth ExactLinear); else the
    fixed-step trapezoid march (Raymarching)."""
    if not g.exact:
        ts, dens, ta, tb = grid_march(g, o, d, t0, t1)
        h = (tb - ta) / g.steps
        tau = h * (jnp.sum(dens, axis=0) - 0.5 * (dens[0] + dens[-1]))
        return jnp.maximum(tau, 0.0)

    def fold(carry, t_a, t_b, oq, dq, live):
        return carry + jnp.where(live, _segment_tau(g, t_a, t_b, oq, dq), 0.0)

    tau, _, _ = _dda_cells(g, o, d, t0, t1, fold, jnp.zeros(o.shape[:-1]))
    return jnp.maximum(tau, 0.0)


def grid_inverse_optical_depth(g: DenseGrid, o, d, t0, t1, tau_target):
    """Smallest t in [t0, t1] with int_{t0}^{t} density = tau_target; INF
    when the total depth is insufficient (Grid::inverseOpticalDepth)."""
    if g.exact:
        return _grid_inverse_exact(g, o, d, t0, t1, tau_target)
    ts, dens, ta, tb = grid_march(g, o, d, t0, t1)
    h = ((tb - ta) / g.steps)[None, :]
    seg = 0.5 * (dens[:-1] + dens[1:]) * h  # (S, N) per-segment tau
    cum = jnp.concatenate([jnp.zeros_like(seg[:1]), jnp.cumsum(seg, axis=0)], axis=0)
    total = cum[-1]
    reached = total >= tau_target
    # first segment whose cumulative end >= target
    idx = jnp.sum((cum < tau_target[None, :]).astype(jnp.int32), axis=0) - 1
    idx = jnp.clip(idx, 0, g.steps - 1)
    n = o.shape[0]
    lane = jnp.arange(n)
    c0 = cum[idx, lane]
    s0 = seg[idx, lane]
    frac = jnp.clip((tau_target - c0) / jnp.maximum(s0, 1e-20), 0.0, 1.0)
    t = ts[idx, lane] + frac * (ts[idx + 1, lane] - ts[idx, lane])
    return jnp.where(reached, t, INF)


def _grid_inverse_exact(g: DenseGrid, o, d, t0, t1, tau_target):
    """Exact inverseOpticalDepth: DDA until the cumulative tau crosses the
    target, then 24 bisection rounds on the exact per-cell integral inside
    the bracketing cell (the cumulative is a monotone quartic there)."""
    def fold(carry, t_a, t_b, oq, dq, live):
        tau, seg_a, seg_b, tau_at_a, found = carry
        dt = jnp.where(live, _segment_tau(g, t_a, t_b, oq, dq), 0.0)
        crosses = live & ~found & (tau + dt >= tau_target)
        seg_a = jnp.where(crosses, t_a, seg_a)
        seg_b = jnp.where(crosses, t_b, seg_b)
        tau_at_a = jnp.where(crosses, tau, tau_at_a)
        return (tau + dt, seg_a, seg_b, tau_at_a, found | crosses)

    n = o.shape[:-1]
    carry0 = (jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
              jnp.zeros(n, bool))
    (tau_tot, seg_a, seg_b, tau_at_a, found), ta, tb = _dda_cells(
        g, o, d, t0, t1, fold, carry0, early_out=lambda c: c[4])

    oq = _world_to_grid(g, o)
    dq = _world_to_grid(g, o + d) - oq
    lo = seg_a
    hi = seg_b
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        tau_mid = tau_at_a + _segment_tau(g, seg_a, mid, oq, dq)
        go_hi = tau_mid < tau_target
        lo = jnp.where(go_hi, mid, lo)
        hi = jnp.where(go_hi, hi, mid)
    return jnp.where(found, 0.5 * (lo + hi), INF)


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def _gaussian_grid(n, sigma=0.25):
    """Procedural unit-cube gaussian blob (for tests and demos)."""
    c = (np.arange(n) + 0.5) / n - 0.5
    z, y, x = np.meshgrid(c, c, c, indexing="ij")
    r2 = x * x + y * y + z * z
    return np.exp(-r2 / (2.0 * sigma * sigma)).astype(np.float32)


def load_grid_spec(spec: dict, resolve=None) -> DenseGrid:
    """Build a DenseGrid from a scene-JSON grid spec (the reference's
    {"type": "vdb", "file": ..., "transform": ...} block, VoxelMedium.cpp).
    Also accepts {"type": "dense", "file": x.npy|x.npz} and
    {"type": "gaussian", "resolution": n, "sigma": s} procedural grids."""
    gtype = spec.get("type", "vdb")
    emission = None
    if gtype == "gaussian":
        dens = _gaussian_grid(int(spec.get("resolution", 32)), float(spec.get("sigma", 0.25)))
    elif gtype == "dense":
        path = spec["file"]
        if resolve is not None:
            path = resolve(path)
        if path.endswith(".npz"):
            z = np.load(path)
            dens = np.asarray(z["density"], np.float32)
            if "emission" in z.files:
                emission = np.asarray(z["emission"], np.float32)
        else:
            dens = np.asarray(np.load(path), np.float32)
    elif gtype == "vdb":
        from .vdb import read_vdb_grid

        path = spec["file"]
        if resolve is not None:
            path = resolve(path)
        dens, vinfo = read_vdb_grid(path, spec.get("density_name", "density"))
        ename = spec.get("emission_name")
        if ename:
            try:
                emission, _ = read_vdb_grid(path, ename)
            except KeyError:
                emission = None
        # VdbGrid.cpp:241-249 normalize_size=false semantics: world =
        # fileIndex * densitySpacing.min() + densityCenter, with the grid
        # spanning file indices minP..maxP — so the dense array's origin
        # (dense index 0 == file index index_min) sits at translate +
        # index_min * spacing. Spec keys still override for repacks.
        fs = float(np.min(vinfo["voxel_size"]))
        spec = dict(spec)
        spec.setdefault("spacing", fs)
        spec.setdefault(
            "grid_center",
            (
                np.asarray(vinfo["translate"])
                + fs * np.asarray(vinfo["index_min"], np.float64)
            ).tolist(),
        )
    else:
        raise NotImplementedError(f"grid type '{gtype}'")

    dens = dens * float(spec.get("density_scale", 1.0))
    nz, ny, nx = dens.shape[:3]
    if emission is not None:
        escale = float(spec.get("emission_scale", 1.0))
        if emission.ndim == 3:
            emission = emission[..., None].repeat(3, axis=-1)
        emission = emission[..., :3] * escale
        if spec.get("scale_emission_by_density", False):
            emission = emission * dens[..., None]

    # transform: grid index space [0,n]^3 -> world. The reference maps the
    # grid's bounding box through `transform`, optionally normalized to the
    # unit cube (VdbGrid::load "normalize_size").
    xf = mat4_from_json(spec.get("transform", {}))  # (4,4) object->world
    norm = spec.get("normalize_size", True)
    if norm:
        # VdbGrid.cpp:237-240: scale by 1/max-extent, center x/z at the
        # origin, and place the box BOTTOM at y=0 (center.y gets no offset)
        scale = 1.0 / max(nx, ny, nz)
        off = (-0.5 * nx * scale, 0.0, -0.5 * nz * scale)
        g2o = np.array(
            [
                [scale, 0, 0, off[0]],
                [0, scale, 0, off[1]],
                [0, 0, scale, off[2]],
                [0, 0, 0, 1.0],
            ],
            np.float32,
        )
    else:
        # VdbGrid.cpp:241-243: scale = voxel spacing, world = p*spacing +
        # density grid center. Dense repacks carry these in the spec (the
        # .vdb metadata is lost in the repack); defaults: unit spacing,
        # centered at the origin.
        spacing = float(spec.get("spacing", 1.0))
        center = spec.get("grid_center", [0.0, 0.0, 0.0])
        g2o = np.array(
            [
                [spacing, 0, 0, float(center[0])],
                [0, spacing, 0, float(center[1])],
                [0, 0, spacing, float(center[2])],
                [0, 0, 0, 1.0],
            ],
            np.float32,
        )
    g2w = np.asarray(xf, np.float32) @ g2o
    w2g = np.linalg.inv(g2w)[:3, :]
    vox_world = float(np.cbrt(abs(np.linalg.det(g2w[:3, :3])) + 1e-30))
    return DenseGrid(
        density=jnp.asarray(dens),
        emission=jnp.asarray(
            emission if emission is not None else np.zeros((1, 1, 1, 3), np.float32)
        ),
        w2g=jnp.asarray(w2g),
        g2w_scale=jnp.float32(vox_world),
        dims=(nx, ny, nz),
        steps=int(spec.get("steps", 96)),
        linear=spec.get("sampling_method", "exact_linear") != "exact_nearest",
        has_emission=emission is not None,
        exact=spec.get("integration_method", "exact_linear") != "raymarching",
    )
