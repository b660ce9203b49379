"""Camera ray generation: pinhole, thinlens, equirectangular, cubemap
(src/core/cameras/, CameraFactory.cpp:10-15).

Pinhole (PinholeCamera.cpp:70-86): horizontal fov, isotropic pixels (both
axes use pixelSize.x), reconstruction filter importance-sampled analytically
with weight 1.
Thinlens (ThinlensCamera.cpp): aperture disk sampling, focal-plane targeting,
optional cat-eye diaphragm vignetting.
Equirectangular (EquirectangularCamera.cpp): lat-long directions.
Cubemap (CubemapCamera.cpp): six faces tiled horizontally.
"""
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
    from . import rfilter

    if rfilter.is_tabulated(filter_name):
        # mitchell_netravali / catmull_rom / lanczos: 31-bin tabulated CDF
        # with mirror-folded sign (ReconstructionFilter.hpp:86-104)
        return rfilter.sample_offset(filter_name, u2)
    # unknown name: reference StringableEnum would have rejected it at parse
    # time; behave like tent rather than crash mid-render
    return jnp.stack(
        [warps.tent_filter_sample(u2[..., 0]), warps.tent_filter_sample(u2[..., 1])],
        axis=-1,
    )


def camera_rays(camera, meta, px, py, u_filter, u_lens=None):
    """px, py: (N,) integer pixel coords; u_filter/u_lens: (N, 2) uniforms.
    Returns (origin (N,3), direction (N,3))."""
    w = meta.res_x
    h = meta.res_y
    ratio = meta.res_y / meta.res_x
    f = filter_offset(meta.filter, u_filter)
    ctype = meta.camera_type

    if ctype == "equirectangular":
        u = (px.astype(jnp.float32) + 0.5 + f[..., 0]) / w
        v = (py.astype(jnp.float32) + 0.5 + f[..., 1]) / h
        phi = (u - 0.5) * (2.0 * jnp.pi)
        theta = (1.0 - v) * jnp.pi
        st = jnp.sin(theta)
        local = jnp.stack([jnp.cos(phi) * st, -jnp.cos(theta), jnp.sin(phi) * st], axis=-1)
        d = local @ camera.rot.T
        return jnp.broadcast_to(camera.pos, d.shape), d

    if ctype == "cubemap":
        # six faces side by side: +x -x +y -y +z -z (CubemapCamera layout)
        fw = w // 6
        face = jnp.clip(px // fw, 0, 5)
        fx = ((px % fw).astype(jnp.float32) + 0.5 + f[..., 0]) / fw * 2.0 - 1.0
        fy = 1.0 - ((py.astype(jnp.float32) + 0.5 + f[..., 1]) / h) * 2.0
        one = jnp.ones_like(fx)
        dirs = [
            jnp.stack([one, fy, -fx], -1),
            jnp.stack([-one, fy, fx], -1),
            jnp.stack([fx, one, -fy], -1),
            jnp.stack([fx, -one, fy], -1),
            jnp.stack([fx, fy, one], -1),
            jnp.stack([-fx, fy, -one], -1),
        ]
        local = dirs[0]
        for i in range(1, 6):
            local = jnp.where((face == i)[..., None], dirs[i], local)
        d = vo.normalize(local) @ camera.rot.T
        return jnp.broadcast_to(camera.pos, d.shape), d

    if ctype == "thinlens":
        # ThinlensCamera::sampleDirection — note the reference uses
        # (pixel + filterUv), no +0.5 center offset
        plane = jnp.stack(
            [
                -1.0 + (px.astype(jnp.float32) + f[..., 0]) * (2.0 / w),
                ratio - (py.astype(jnp.float32) + f[..., 1]) * (2.0 / w),
                jnp.broadcast_to(camera.plane_dist, px.shape),
            ],
            axis=-1,
        )
        plane = plane * (camera.focus_dist / camera.plane_dist)
        lens_xy = warps.uniform_disk(u_lens) * camera.aperture_size
        lens = jnp.stack([lens_xy[..., 0], lens_xy[..., 1], jnp.zeros_like(lens_xy[..., 0])], -1)
        local = vo.normalize(plane - lens)
        d = local @ camera.rot.T
        o = camera.pos + lens @ camera.rot.T
        return o, d

    # pinhole
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
