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


def _sample_aperture(camera, meta, u2):
    """Aperture texture sample in [0,1]^2 (ThinlensCamera::samplePosition:
    `_aperture->sample(MAP_UNIFORM, lensUv)`). disk: SampleWarp::uniformDisk
    (DiskTexture.cpp:66-69); blade: uniform point in one of N fan triangles
    (BladeTexture.cpp:103-124); bitmap: Distribution2D over texel luminance
    (BitmapTexture::sample); const: the unit square."""
    kind = meta.aperture_kind
    if kind == "blade":
        nb = meta.ap_blades
        blade_angle = 2.0 * jnp.pi / nb
        u = u2[..., 0] * nb
        blade = jnp.clip(u.astype(jnp.int32), 0, nb - 1)
        u = u - blade.astype(jnp.float32)
        phi = camera.ap_angle + blade.astype(jnp.float32) * blade_angle
        sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
        base_edge_scale = 2.0 * jnp.sin(jnp.pi / nb)
        bex = -jnp.sin(blade_angle * 0.5) * base_edge_scale
        bey = jnp.cos(blade_angle * 0.5) * base_edge_scale
        u_sqrt = jnp.sqrt(u)
        alpha = 1.0 - u_sqrt
        beta = (1.0 - u2[..., 1]) * u_sqrt
        lx = (1.0 + bex) * beta + (1.0 - alpha - beta)
        ly = bey * beta
        return jnp.stack(
            [lx * cos_phi - ly * sin_phi, ly * cos_phi + lx * sin_phi],
            axis=-1,
        ) * 0.5 + 0.5
    if kind == "bitmap" and camera.ap_dist is not None:
        h, w = camera.ap_dist.shape
        x, row, _, uvr = camera.ap_dist.sample(u2)
        return jnp.stack(
            [(uvr[..., 0] + x) / w, 1.0 - (uvr[..., 1] + row) / h], axis=-1
        )
    if kind == "const":
        return u2
    return warps.uniform_disk(u2) * 0.5 + 0.5


def camera_rays(camera, meta, px, py, u_filter, u_lens=None):
    """Back-compat wrapper: rays only (unit weight assumed)."""
    o, d, _ = camera_rays_w(camera, meta, px, py, u_filter, u_lens)
    return o, d


def camera_rays_w(camera, meta, px, py, u_filter, u_lens=None):
    """px, py: (N,) integer pixel coords; u_filter/u_lens: (N, 2) uniforms.
    Returns (origin (N,3), direction (N,3), weight (N,)) — weight is 0 for
    thinlens rays vignetted by the cat-eye diaphragm
    (ThinlensCamera::sampleDirection, ThinlensCamera.cpp:119-124), else 1."""
    w = meta.res_x
    h = meta.res_y
    ratio = meta.res_y / meta.res_x
    f = filter_offset(meta.filter, u_filter)
    ctype = meta.camera_type
    ones = jnp.ones(px.shape, jnp.float32)

    if ctype == "equirectangular":
        u = (px.astype(jnp.float32) + 0.5 + f[..., 0]) / w
        v = (py.astype(jnp.float32) + 0.5 + f[..., 1]) / h
        phi = (u - 0.5) * (2.0 * jnp.pi)
        theta = (1.0 - v) * jnp.pi
        st = jnp.sin(theta)
        local = jnp.stack([jnp.cos(phi) * st, -jnp.cos(theta), jnp.sin(phi) * st], axis=-1)
        d = local @ camera.rot.T
        return jnp.broadcast_to(camera.pos, d.shape), d, ones

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
        return jnp.broadcast_to(camera.pos, d.shape), d, ones

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
        ap01 = _sample_aperture(camera, meta, u_lens)
        lens_xy = (ap01 * 2.0 - 1.0) * camera.aperture_size
        lens = jnp.stack([lens_xy[..., 0], lens_xy[..., 1], jnp.zeros_like(lens_xy[..., 0])], -1)
        local = vo.normalize(plane - lens)
        wgt = ones
        if meta.cateye > 0.0:
            # diaphragm projected along the ray by the cat-eye strength:
            # outside the aperture radius the ray is vignetted
            # (ThinlensCamera.cpp:119-124)
            dia_x = lens_xy[..., 0] - camera.cateye * camera.plane_dist * local[..., 0] / local[..., 2]
            dia_y = lens_xy[..., 1] - camera.cateye * camera.plane_dist * local[..., 1] / local[..., 2]
            wgt = jnp.where(
                dia_x * dia_x + dia_y * dia_y > camera.aperture_size ** 2,
                0.0, wgt,
            )
        d = local @ camera.rot.T
        o = camera.pos + lens @ camera.rot.T
        return o, d, wgt

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
    return o, d, ones
