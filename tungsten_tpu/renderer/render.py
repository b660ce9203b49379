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

from ..integrators.path_tracer import trace_pass
from ..models.cameras import tonemap
from ..scene.flatten import FlatScene, flatten_scene
from ..scene.load import SceneDocument, load_scene

DEFAULT_SEED = 0xBA5EBA11


def render_flat(
    scene: FlatScene,
    spp: int | None = None,
    seed: int = DEFAULT_SEED,
    verbose: bool = False,
) -> np.ndarray:
    """Render and return the *linear* HDR framebuffer (H, W, 3) float32."""
    meta = scene.meta
    spp = spp if spp is not None else meta.spp
    w, h = meta.res_x, meta.res_y
    n = w * h
    px = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)

    acc = jnp.zeros((n, 3), jnp.float32)
    t0 = time.time()
    for s in range(spp):
        lane_ids = jnp.arange(n, dtype=jnp.uint32)
        pass_seed = jnp.array([seed & 0xFFFFFFFF, s], jnp.uint32)
        rad = trace_pass(scene, pass_seed, lane_ids, px, py)
        acc = acc + rad
        if verbose and (s == 0 or (s + 1) % 4 == 0 or s == spp - 1):
            acc.block_until_ready()
            dt = time.time() - t0
            print(f"  spp {s + 1}/{spp}  ({dt:.1f}s, {n * (s + 1) / dt / 1e6:.2f} Mpaths/s)")
    img = (acc / spp).reshape(h, w, 3)
    return np.asarray(img)


def render_scene(doc_or_path, spp=None, seed=DEFAULT_SEED, verbose=False):
    """Load+flatten+render; returns (linear_hdr, tonemapped_ldr01)."""
    doc = load_scene(doc_or_path) if isinstance(doc_or_path, str) else doc_or_path
    scene = flatten_scene(doc)
    hdr = render_flat(scene, spp=spp, seed=seed, verbose=verbose)
    ldr = np.asarray(tonemap(scene.meta.tonemap, jnp.asarray(hdr)))
    return hdr, np.clip(ldr, 0.0, 1.0)
