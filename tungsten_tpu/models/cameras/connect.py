"""Camera importance evaluation for adjoint techniques (light tracer, BDPT
t=1 connections): PinholeCamera::evalDirection / sampleDirect
(PinholeCamera.cpp:88-127)."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vecops as vo


def camera_eval_direction(camera, meta, d_world):
    """Importance of direction d_world leaving the camera.
    Returns (weight (N,), pixel_xy (N,2), valid (N,))."""
    # inverse rotation = transpose (orthonormal)
    local = d_world @ camera.rot  # R^T @ d  == d @ R
    valid = local[..., 2] > 0.0
    scale = camera.plane_dist / jnp.where(valid, local[..., 2], 1.0)
    lx = local[..., 0] * scale
    ly = local[..., 1] * scale
    pixel_size_x = 1.0 / meta.res_x
    ratio = meta.res_y / meta.res_x
    px = (lx + 1.0) / (2.0 * pixel_size_x)
    py = (ratio - ly) / (2.0 * pixel_size_x)
    fw = 1.0  # filter width (tent); dirac would be 0
    valid = valid & (px > 0.5 - fw) & (py > 0.5 - fw)
    valid = valid & (px < meta.res_x - 0.5 + fw) & (py < meta.res_y - 0.5 + fw)
    cos3 = (local[..., 2] / jnp.maximum(vo.length(local), 1e-20)) ** 3
    weight = (camera.plane_dist**2) / jnp.maximum(
        4.0 * pixel_size_x * pixel_size_x * cos3, 1e-20
    )
    return weight, jnp.stack([px, py], axis=-1), valid


def camera_sample_direct(camera, meta, p):
    """Connect a point to the pinhole (Camera/PinholeCamera::sampleDirect).
    Returns (d to camera (N,3), dist, weight (N,) = importance / r^2,
    pixel (N,2), valid)."""
    dvec = camera.pos - p
    r_sq = vo.length_sq(dvec)
    dist = jnp.sqrt(jnp.maximum(r_sq, 1e-30))
    d = dvec / dist[..., None]
    w, pixel, valid = camera_eval_direction(camera, meta, -d)
    return d, dist, w / jnp.maximum(r_sq, 1e-30), pixel, valid
