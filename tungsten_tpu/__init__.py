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
