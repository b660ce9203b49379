"""tungsten-tpu: a TPU-native physically-based renderer.

A brand-new JAX/XLA/Pallas wavefront renderer with the capabilities of the
Tungsten renderer (C++ reference surveyed in SURVEY.md). The per-ray recursive
CPU megakernel of the reference becomes a batched, SPMD wavefront: SoA ray
megabatches traced through a flattened HBM-resident BVH, masked vectorized
BSDF dispatch, on-device NEE/MIS, and `jax.sharding`-based scaling over device
meshes.

Package layout:
  math/         vector/matrix/transform utilities (host numpy + device jnp)
  sampling/     RNG, low-discrepancy samplers, warps, distributions
  io/           scene JSON, mesh (.wo3/.obj), image (PNG/HDR/EXR/PFM) IO
  scene/        scene object model + flattening into device-resident tables
  accel/        BVH construction (host-side, numpy/C++)
  ops/          device kernels: intersection, traversal, compaction
  models/       physical models: bsdfs, cameras, media, phase functions,
                transmittances, textures, primitives
  integrators/  light-transport algorithms (path tracer, BDPT, photon map, MLT...)
  parallel/     device-mesh sharding of the sample megabatch
  utils/        logging, timers, CLI plumbing
"""

__version__ = "0.1.0"

# TPU MXU matmuls default to bfloat16 inputs; the renderer's small dense
# matmuls (camera ray rotation `local @ rot.T`, env direction_to_uv
# `d @ inv_rot.T`, analytic-prim frames) are GEOMETRY — bf16 quantizes ray
# directions to ~8 mantissa bits, which measurably shifted rendered images
# ~0.5-1 px vs the CPU/C++ reference (round-4 materialtest SSIM hunt).
# Force full-f32 matmul everywhere; Pallas kernels pick their own precision
# and hot paths that WANT bf16 must opt in explicitly.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
