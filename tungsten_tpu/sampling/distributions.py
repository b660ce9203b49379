"""Device-side discrete distributions (CDF warps).

TPU-native analogs of src/core/sampling/Distribution1D.hpp and
Distribution2D.hpp:11-60: CDFs are built host-side (numpy) at scene-flatten
time and sampled on device with vectorized binary search
(jnp.searchsorted over the whole wavefront).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax.struct import dataclass as pytree


@pytree
class Distribution1D:
    """cdf: (n+1,) with cdf[0]=0, cdf[-1]=1;  pdf: (n,) discrete prob."""

    pdf: jnp.ndarray
    cdf: jnp.ndarray

    @staticmethod
    def build(weights: np.ndarray) -> "Distribution1D":
        w = np.asarray(weights, np.float64).ravel()
        total = w.sum()
        if total <= 0.0:
            w = np.ones_like(w)
            total = w.sum()
        p = w / total
        cdf = np.concatenate([[0.0], np.cumsum(p)])
        cdf[-1] = 1.0
        return Distribution1D(pdf=jnp.asarray(p, jnp.float32), cdf=jnp.asarray(cdf, jnp.float32))

    def sample(self, u):
        """u: (...,) -> (idx, pdf, u_remapped). u is reused within the bin
        (matches Distribution1D::warp's reuse for a fresh uniform)."""
        idx = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, self.pdf.shape[0] - 1)
        lo = self.cdf[idx]
        p = self.pdf[idx]
        u_re = jnp.where(p > 0, (u - lo) / jnp.maximum(p, 1e-38), 0.0)
        return idx, p, jnp.clip(u_re, 0.0, 1.0)

    def prob(self, idx):
        return self.pdf[idx]


@pytree
class Distribution2D:
    """Row-major 2D CDF (marginal over rows, conditional over columns).

    Mirrors Distribution2D.hpp:11-60: sample() returns integer cell (x, y)
    plus the discrete pdf; continuous uv is (cell + remapped u) / res.
    """

    marginal_pdf: jnp.ndarray  # (h,)
    marginal_cdf: jnp.ndarray  # (h+1,)
    cond_pdf: jnp.ndarray  # (h, w)
    cond_cdf: jnp.ndarray  # (h, w+1)

    @property
    def shape(self):
        return self.cond_pdf.shape

    @staticmethod
    def build(weights: np.ndarray) -> "Distribution2D":
        w = np.asarray(weights, np.float64)
        h, width = w.shape
        row_sums = w.sum(axis=1)
        total = row_sums.sum()
        if total <= 0.0:
            w = np.ones_like(w)
            row_sums = w.sum(axis=1)
            total = row_sums.sum()
        marg = row_sums / total
        mcdf = np.concatenate([[0.0], np.cumsum(marg)])
        mcdf[-1] = 1.0
        safe_rows = np.where(row_sums > 0, row_sums, 1.0)[:, None]
        cond = np.where(row_sums[:, None] > 0, w / safe_rows, 1.0 / width)
        ccdf = np.concatenate([np.zeros((h, 1)), np.cumsum(cond, axis=1)], axis=1)
        ccdf[:, -1] = 1.0
        return Distribution2D(
            marginal_pdf=jnp.asarray(marg, jnp.float32),
            marginal_cdf=jnp.asarray(mcdf, jnp.float32),
            cond_pdf=jnp.asarray(cond, jnp.float32),
            cond_cdf=jnp.asarray(ccdf, jnp.float32),
        )

    def sample(self, u):
        """u: (..., 2) -> (x, y, pdf_discrete, uv_remapped (..., 2))."""
        h, w = self.shape
        uy = u[..., 1]
        y = jnp.clip(jnp.searchsorted(self.marginal_cdf, uy, side="right") - 1, 0, h - 1)
        py = self.marginal_pdf[y]
        vy = jnp.clip((uy - self.marginal_cdf[y]) / jnp.maximum(py, 1e-38), 0.0, 1.0)

        ux = u[..., 0]
        # Per-lane binary search in the lane's own conditional CDF row. Rows
        # are gathered one scalar at a time (log2(w) gathers per lane) instead
        # of materializing (N, w+1) rows in HBM.
        flat_cdf = self.cond_cdf.reshape(-1)
        row_base = y * (w + 1)
        x = _searchsorted_strided(flat_cdf, row_base, ux, w + 1) - 1
        x = jnp.clip(x, 0, w - 1)
        px = self.cond_pdf[y, x]
        lo = flat_cdf[row_base + x]
        vx = jnp.clip((ux - lo) / jnp.maximum(px, 1e-38), 0.0, 1.0)
        return x, y, py * px, jnp.stack([vx, vy], axis=-1)

    def prob(self, x, y):
        """Discrete probability of cell (x, y)."""
        return self.marginal_pdf[y] * self.cond_pdf[y, x]


def _searchsorted_strided(flat, base, u, row_len, max_len=None):
    """'right' searchsorted of u in flat[base : base+row_len], per lane.

    flat: concatenated sorted rows; base, u: (...,); row_len: int or per-lane
    array. Branchless binary search with ceil(log2(max_len)) scalar gathers —
    VPU/gather friendly.
    """
    import math

    if max_len is None:
        max_len = int(row_len)
    steps = max(1, math.ceil(math.log2(max_len + 1)))
    lo = jnp.zeros_like(base)  # invariant: flat[base+lo] <= u (cdf[0] == 0)
    width = jnp.broadcast_to(jnp.asarray(row_len, base.dtype), base.shape)
    for _ in range(steps):
        half = width // 2
        mid = lo + half
        val = flat[jnp.clip(base + mid, 0, flat.shape[0] - 1)]
        go_right = val <= u
        lo = jnp.where(go_right, mid, lo)
        width = jnp.where(go_right, width - half, half)
    return lo + 1
