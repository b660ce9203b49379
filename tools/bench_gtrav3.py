#!/usr/bin/env python
"""Bisect the gather-traversal round cost: which body component dominates?

Runs fixed-round fori loops over (N,) lanes with the real BVH row table:
  g     : the row gather alone (random walking cursor)
  g+box : gather + 8 slab tests + argmin select
  g+mt  : gather + 8 Moller-Trumbore tests
  g+stk : gather + L-level bitstack push/pop selects
  full  : the real _traverse body (measured via max_rounds delta)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


ROUNDS = 64
L = 10


def main():
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.scene.load import load_scene
    from tungsten_tpu.ops import gather_bvh as v5

    doc = load_scene("/root/reference/data/materialtest/materialtest.json")
    doc.camera["resolution"] = [250, 141]
    scene = flatten_scene(doc)
    v0 = np.asarray(scene.tris.v0)
    e1 = np.asarray(scene.tris.e1)
    e2 = np.asarray(scene.tris.e2)
    pack = v5.build_gather_pack(v0, e1, e2)
    rows = pack.rows
    m = pack.n_rows
    print(f"rows={m}")

    rng = np.random.default_rng(0)
    lo, hi = np.min(v0, 0), np.max(v0, 0)

    for n in [141_000, 524_288]:
        o = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
        dn = rng.normal(size=(n, 3)).astype(np.float32)
        d = jnp.asarray(dn / np.linalg.norm(dn, axis=1, keepdims=True))
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        idx = 1.0 / jnp.where(dx == 0, 1e-30, dx)
        idy = 1.0 / jnp.where(dy == 0, 1e-30, dy)
        idz = 1.0 / jnp.where(dz == 0, 1e-30, dz)
        cur0 = jnp.arange(n, dtype=jnp.int32) % m
        tn = jnp.full((n,), 1e-4)
        bt0 = jnp.full((n,), 3e38)

        def boxes(row, best_t, pend):
            tsel = jnp.full((n,), jnp.inf)
            child = jnp.full((n,), -1, jnp.int32)
            sel = jnp.zeros((n,), jnp.int32)
            hitbits = jnp.zeros((n,), jnp.int32)
            for j in range(8):
                t0x = (row[:, j] - ox) * idx
                t1x = (row[:, 24 + j] - ox) * idx
                t0y = (row[:, 8 + j] - oy) * idy
                t1y = (row[:, 32 + j] - oy) * idy
                t0z = (row[:, 16 + j] - oz) * idz
                t1z = (row[:, 40 + j] - oz) * idz
                tlo = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z),
                )
                thi = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                code = row[:, 48 + j].astype(jnp.int32)
                h = ((pend >> j) & 1 > 0) & (code >= 0) & (tlo <= thi) & (thi >= tn) & (tlo < best_t)
                hitbits = hitbits | jnp.where(h, 1 << j, 0)
                tj = jnp.where(h, tlo, jnp.inf)
                take = tj < tsel
                child = jnp.where(take, code, child)
                sel = jnp.where(take, j, sel)
                tsel = jnp.minimum(tsel, tj)
            return child, sel, hitbits

        def mt(row, best_t):
            best_p = jnp.full((n,), -1, jnp.int32)
            for i in range(8):
                av0x, av0y, av0z = row[:, i], row[:, 8 + i], row[:, 16 + i]
                e1x, e1y, e1z = row[:, 24 + i], row[:, 32 + i], row[:, 40 + i]
                e2x, e2y, e2z = row[:, 48 + i], row[:, 56 + i], row[:, 64 + i]
                tid = row[:, 72 + i]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
                tx, ty, tz = ox - av0x, oy - av0y, oz - av0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (tid >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > tn) & (tt < best_t)
                best_p = jnp.where(ok, tid.astype(jnp.int32), best_p)
                best_t = jnp.where(ok, tt, best_t)
            return best_t, best_p

        @jax.jit
        def loop_g(cur):
            def body(i, c):
                row = rows[c]
                nxt = row[:, 48].astype(jnp.int32) % m
                return jnp.abs(nxt + i) % m
            return jax.lax.fori_loop(0, ROUNDS, body, cur)

        @jax.jit
        def loop_gbox(cur):
            def body(i, state):
                c, bt = state
                row = rows[c]
                child, sel, hb = boxes(row, bt, jnp.full((n,), 0xFF))
                nxt = jnp.where(child >= 0, child % m, (c + 1) % m)
                return nxt, jnp.minimum(bt, jnp.where(child >= 0, bt, bt))
            return jax.lax.fori_loop(0, ROUNDS, body, (cur, bt0))

        @jax.jit
        def loop_gmt(cur):
            def body(i, state):
                c, bt = state
                row = rows[c]
                bt2, bp = mt(row, bt)
                nxt = (c + jnp.where(bp >= 0, 1, 2)) % m
                return nxt, bt2
            return jax.lax.fori_loop(0, ROUNDS, body, (cur, bt0))

        @jax.jit
        def loop_gstk(cur):
            pid0 = tuple(jnp.zeros((n,), jnp.int32) for _ in range(L))
            pms0 = tuple(jnp.zeros((n,), jnp.int32) for _ in range(L))
            lvl0 = jnp.zeros((n,), jnp.int32)

            def body(i, state):
                c, pid, pms, lvl = state
                pid = list(pid)
                pms = list(pms)
                row = rows[c]
                nxt = row[:, 48].astype(jnp.int32) % m
                push = (nxt & 1) == 0
                for dd in range(L):
                    w = push & (lvl == dd)
                    pid[dd] = jnp.where(w, c, pid[dd])
                    pms[dd] = jnp.where(w, nxt, pms[dd])
                lvl = jnp.where(push, jnp.minimum(lvl + 1, L - 1), jnp.maximum(lvl - 1, 0))
                top = pid[0]
                for dd in range(1, L):
                    top = jnp.where((lvl - 1) == dd, pid[dd], top)
                return jnp.abs(nxt + top) % m, tuple(pid), tuple(pms), lvl
            return jax.lax.fori_loop(0, ROUNDS, body, (cur, pid0, pms0, lvl0))

        r = {}
        r["g"] = timed(loop_g, cur0)
        r["g+box"] = timed(loop_gbox, cur0)
        r["g+mt"] = timed(loop_gmt, cur0)
        r["g+stk"] = timed(loop_gstk, cur0)
        out = ", ".join(
            f"{k}={v / ROUNDS / n * 1e9:6.2f} ns/lane/rd" for k, v in r.items()
        )
        print(f"N={n:8d}: {out}", flush=True)


if __name__ == "__main__":
    main()
