"""Pinhole camera ray generation (src/core/cameras/PinholeCamera.cpp:70-86).

fov is horizontal; pixel aspect is isotropic (both axes use pixelSize.x);
the reconstruction filter is importance-sampled analytically with weight 1
(filter importance sampling — the reference tabulates a 31-bin CDF,
ReconstructionFilter.hpp:19-33; the analytic inverse is exact)."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo
from ...sampling import warps


def filter_offset(filter_name: str, u2):
    """Sample the reconstruction-filter displacement in pixels, weight 1."""
    if filter_name == "dirac":
        return jnp.zeros_like(u2)
    if filter_name == "box":
        return u2 - 0.5
    if filter_name == "tent":
        return jnp.stack(
            [warps.tent_filter_sample(u2[..., 0]), warps.tent_filter_sample(u2[..., 1])],
            axis=-1,
        )
    if filter_name == "gaussian":
        gx, gy = warps.gaussian_filter_sample(u2[..., 0], u2[..., 1])
        return jnp.stack([gx, gy], axis=-1)
    # mitchell_netravali / catmull_rom / lanczos need the tabulated CDF +
    # negative-lobe weights; fall back to tent until implemented.
    return jnp.stack(
        [warps.tent_filter_sample(u2[..., 0]), warps.tent_filter_sample(u2[..., 1])],
        axis=-1,
    )


def camera_rays(camera, meta, px, py, u_filter):
    """px, py: (N,) integer pixel coords; u_filter: (N, 2) uniforms.
    Returns (origin (N,3), direction (N,3))."""
    w = meta.res_x
    ratio = meta.res_y / meta.res_x
    f = filter_offset(meta.filter, u_filter)
    local = jnp.stack(
        [
            -1.0 + (px.astype(jnp.float32) + 0.5 + f[..., 0]) * (2.0 / w),
            ratio - (py.astype(jnp.float32) + 0.5 + f[..., 1]) * (2.0 / w),
            jnp.broadcast_to(camera.plane_dist, px.shape),
        ],
        axis=-1,
    )
    local = vo.normalize(local)
    d = local @ camera.rot.T
    o = jnp.broadcast_to(camera.pos, d.shape)
    return o, d
