"""Tonemapping operators (src/core/cameras/Tonemap.hpp:25-47), batched."""
from __future__ import annotations

import jax.numpy as jnp


def tonemap(name: str, c):
    if name == "linear":
        return c
    if name == "gamma":
        return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)
    if name == "reinhard":
        return jnp.power(jnp.maximum(c, 0.0) / (jnp.maximum(c, 0.0) + 1.0), 1.0 / 2.2)
    if name == "filmic":
        x = jnp.maximum(0.0, c - 0.004)
        return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    if name == "pbrt":
        c = jnp.maximum(c, 0.0)
        return jnp.where(
            c < 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
        )
    raise ValueError(f"unknown tonemap: {name}")
