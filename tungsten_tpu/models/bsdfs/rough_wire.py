"""Rough wire BCSDF (src/core/bsdfs/RoughWireBcsdf.cpp).

Metal wire: perfectly smooth in azimuth (N reduces to the h->phi mirror
jacobian, RoughWireBcsdf.cpp:56-61) with a rough von-Mises longitudinal
lobe M of variance v = (roughness * pi/2)^2 (:64-76), attenuated by the
complex-IOR conductor Fresnel at the wi/wo half angle (:120-137).

Frame convention matches models/bsdfs/hair.py: fiber tangent on local y
(sin(theta) = dir.y), phi measured in the (x, z) normal plane. The
reference's cosPhi = wo.z / |wo.xz| assumes its ribbon frame where wi's
azimuth is 0; here cosPhi = cos(azimuth(wo) - azimuth(wi)) — the
rotation-invariant generalization for arbitrary tube frames.

Params: [0:3] eta rgb, [3:6] k rgb, [6] v (longitudinal variance).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .common import BsdfSample, Lobes
from .complex_ior import lookup
from .fresnel import conductor_reflectance
from .hair import _M, _sample_m, _trig_inv

NAME = "rough_wire"
LOBES = Lobes.GLOSSY_R | Lobes.ANISOTROPIC

TWO_PI = 2.0 * np.pi


def pack(spec, params, tex_builder):
    eta = spec.get("eta")
    k = spec.get("k")
    if eta is None or k is None:
        mat = lookup(spec.get("material", "Cu"))
        if mat is None:
            raise ValueError(f"unknown conductor material {spec.get('material')!r}")
        eta, k = mat
    params[0:3] = np.asarray(eta, np.float32)
    params[3:6] = np.asarray(k, np.float32)
    rough = float(spec.get("roughness", 0.1))
    params[6] = max((rough * np.pi * 0.5) ** 2, 1e-6)  # prepareForRender (:177-180)
    return params


def _trig_half(x):
    return jnp.minimum(jnp.sqrt(jnp.maximum(x * 0.5 + 0.5, 0.0)), 1.0)


def _N(cos_phi):
    """Azimuthal mirror jacobian (RoughWireBcsdf.cpp:56-61)."""
    return 0.25 * _trig_half(cos_phi)


def _angles(wi, wo):
    sin_ti = jnp.clip(wi[..., 1], -1.0, 1.0)
    sin_to = jnp.clip(wo[..., 1], -1.0, 1.0)
    cos_ti = _trig_inv(sin_ti)
    cos_to = _trig_inv(sin_to)
    # cos(azimuth difference) via the normalized 2D dot in the normal plane
    lo = jnp.sqrt(jnp.maximum(wo[..., 0] ** 2 + wo[..., 2] ** 2, 1e-24))
    li = jnp.sqrt(jnp.maximum(wi[..., 0] ** 2 + wi[..., 2] ** 2, 1e-24))
    cos_phi = (wo[..., 0] * wi[..., 0] + wo[..., 2] * wi[..., 2]) / (lo * li)
    return sin_ti, sin_to, cos_ti, cos_to, jnp.clip(cos_phi, -1.0, 1.0)


def _nm(params, wi, wo):
    v = params[..., 6]
    sin_ti, sin_to, cos_ti, cos_to, cos_phi = _angles(wi, wo)
    nm = _N(cos_phi) * _M(v, sin_ti, sin_to, cos_ti, cos_to)
    return jnp.where(jnp.isfinite(nm), nm, 0.0)


def eval(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    eta, k = params[..., 0:3], params[..., 3:6]
    f = conductor_reflectance(eta, k, _trig_half(jnp.sum(wi * wo, axis=-1)))
    return albedo * f * _nm(params, wi, wo)[..., None]


def pdf(ctx, params, albedo, uv, wi, wo, nonspecular_only=False):
    return _nm(params, wi, wo)


def sample(ctx, params, albedo, uv, wi, u2, u1, nonspecular_only=False):
    """sampleN + sampleM (RoughWireBcsdf.cpp:78-96, 139-163), rotated from
    the wi-azimuth frame into the shading frame.

    Azimuth: the fiber offset h = sin(gamma) is uniform and the mirror
    deflection is phi = 2*gamma (so sin(phi/2) = h), whose density is
    exactly N(cos phi) = 0.25 cos(phi/2). The reference's sample (:155)
    instead uses gamma itself as the outgoing azimuth, which disagrees
    with its own N pdf by the half-angle jacobian; we sample the
    self-consistent phi = 2*gamma so sample/pdf/eval stay in exact MIS
    agreement."""
    n = wi.shape[0]
    eta, k = params[..., 0:3], params[..., 3:6]
    v = params[..., 6]
    sin_ti = jnp.clip(wi[..., 1], -1.0, 1.0)
    cos_ti = _trig_inv(sin_ti)

    h = 2.0 * u1 - 1.0  # sampleN: uniform across the fiber width
    sin_half = h
    cos_half = _trig_inv(h)
    sin_phi = 2.0 * sin_half * cos_half
    cos_phi = 1.0 - 2.0 * sin_half * sin_half
    sin_to = _sample_m(v, sin_ti, cos_ti, u2[..., 0], u2[..., 1])
    cos_to = _trig_inv(sin_to)
    wo0 = jnp.stack([sin_phi * cos_to, sin_to, cos_phi * cos_to], axis=-1)
    phi_i = jnp.arctan2(wi[..., 0], wi[..., 2])
    c, s = jnp.cos(phi_i), jnp.sin(phi_i)
    wo = jnp.stack(
        [
            wo0[..., 0] * c + wo0[..., 2] * s,
            wo0[..., 1],
            -wo0[..., 0] * s + wo0[..., 2] * c,
        ],
        axis=-1,
    )
    p = _N(cos_phi) * _M(v, sin_ti, sin_to, cos_ti, cos_to)
    p = jnp.where(jnp.isfinite(p), p, 0.0)
    f = conductor_reflectance(eta, k, _trig_half(jnp.sum(wi * wo, axis=-1)))
    valid = p > 0.0
    return BsdfSample(
        wo=wo,
        weight=jnp.where(valid[..., None], albedo * f, 0.0),
        pdf=p,
        lobe=jnp.full((n,), LOBES, jnp.int32),
        valid=valid,
    )
