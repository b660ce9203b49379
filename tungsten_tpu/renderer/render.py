"""Render driver: spp-batched accumulation into the framebuffer.

The analog of the reference's render loop (src/tungsten/Shared.hpp:283-311 +
PathTraceIntegrator): render proceeds in spp batches; each batch is one jitted
wavefront pass over all pixels. Seeds fold the pass index so every sample is
an independent, replayable stream (default seed 0xBA5EBA11, Shared.hpp:246).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..integrators.path_tracer import trace_batch, trace_pass
from ..models.cameras import tonemap
from ..scene.flatten import FlatScene, flatten_scene
from ..scene.load import SceneDocument, load_scene

DEFAULT_SEED = 0xBA5EBA11


def render_flat(
    scene: FlatScene,
    spp: int | None = None,
    seed: int = DEFAULT_SEED,
    verbose: bool = False,
    mesh=None,
    samples_per_pass: int = 1,
    passes_per_batch: int = 16,
) -> np.ndarray:
    """Render and return the *linear* HDR framebuffer (H, W, 3) float32.

    mesh: optional jax.sharding.Mesh — shards the wavefront over devices
    (scene replicated, lanes pixel-sharded; bitwise identical to single-chip
    because lane ids are global).
    samples_per_pass: lanes per pixel per pass (bigger wavefronts amortize
    launch/while_loop overhead on big chips).
    """
    meta = scene.meta
    spp = spp if spp is not None else meta.spp
    w, h = meta.res_x, meta.res_y
    n_pix = w * h
    m = samples_per_pass
    n = n_pix * m
    px = np.tile(np.tile(np.arange(w, dtype=np.int32), h), m)
    py = np.tile(np.repeat(np.arange(h, dtype=np.int32), w), m)

    if mesh is not None:
        from ..parallel.mesh import pad_to_devices, replicate, shard_lanes

        n_dev = mesh.devices.size
        n_pad = pad_to_devices(n, n_dev)
        if n_pad != n:
            px = np.concatenate([px, np.zeros(n_pad - n, np.int32)])
            py = np.concatenate([py, np.zeros(n_pad - n, np.int32)])
        scene = replicate(mesh, scene)

    n_total = len(px)
    # lane ids must be globally unique within a pass; pass index enters the
    # seed, so lane arrays are constant across passes (one transfer per render)
    lane_base = np.arange(n_total, dtype=np.uint32)
    if mesh is not None:
        from ..parallel.mesh import shard_lanes

        lane_arr, px_arr, py_arr = shard_lanes(
            mesh, jnp.asarray(lane_base), jnp.asarray(px), jnp.asarray(py)
        )
    else:
        lane_arr, px_arr, py_arr = (
            jnp.asarray(lane_base),
            jnp.asarray(px),
            jnp.asarray(py),
        )

    passes = (spp + m - 1) // m
    batch = max(1, min(passes, passes_per_batch))
    seed_arr = jnp.array([seed & 0xFFFFFFFF, 0], jnp.uint32)
    acc = None
    t0 = time.time()
    done = 0
    while done < passes:
        nb = min(batch, passes - done)
        rad = trace_batch(
            scene, seed_arr, lane_arr, px_arr, py_arr, jnp.uint32(done), n_passes=nb
        )
        acc = rad if acc is None else acc + rad
        done += nb
        if verbose:
            acc.block_until_ready()
            dt = time.time() - t0
            rate = n_pix * m * done / dt / 1e6
            print(f"  spp {done * m}/{passes * m}  ({dt:.1f}s, {rate:.2f} Mpaths/s)")
    acc = np.asarray(acc)[:n]
    img = acc.reshape(m, n_pix, 3).sum(0) / (passes * m)
    return img.reshape(h, w, 3)


def render_scene(doc_or_path, spp=None, seed=DEFAULT_SEED, verbose=False):
    """Load+flatten+render; returns (linear_hdr, tonemapped_ldr01)."""
    doc = load_scene(doc_or_path) if isinstance(doc_or_path, str) else doc_or_path
    scene = flatten_scene(doc)
    hdr = render_flat(scene, spp=spp, seed=seed, verbose=verbose)
    ldr = np.asarray(tonemap(scene.meta.tonemap, jnp.asarray(hdr)))
    return hdr, np.clip(ldr, 0.0, 1.0)


def render_light_traced(scene: FlatScene, spp=None, seed=DEFAULT_SEED, verbose=False):
    """Light-traced render: spp passes of W*H light paths each; the splat
    estimator satisfies E[splat_j per path] = I_j, so the image is
    splat_sum / total_paths (LightTraceIntegrator semantics)."""
    from ..integrators.light_tracer import trace_light_pass

    meta = scene.meta
    spp = spp if spp is not None else meta.spp
    w, h = meta.res_x, meta.res_y
    n = w * h
    lane_ids = jnp.arange(n, dtype=jnp.uint32)
    acc = None
    for s in range(spp):
        pass_seed = jnp.array([seed & 0xFFFFFFFF, 0x10000 + s], jnp.uint32)
        buf = trace_light_pass(scene, pass_seed, lane_ids)
        acc = buf if acc is None else acc + buf
    # E[splat_j per light path] = I_j  =>  normalize by total path count
    img = np.asarray(acc).reshape(h, w, 3) / (spp * float(n))
    return img
