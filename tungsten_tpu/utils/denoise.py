"""Feature-guided first-order regression denoiser (NFOR-style).

The reference ships an NFOR post-process denoiser (src/denoiser/, Bitterli
2016: NL-means feature prefiltering + collaborative first-order regression on
albedo/normal/depth features with two-buffer variance). This is a faithful
first-order-regression core in its windowed/guided form:

  within each RxR window, fit  color ~ a . f + b  over the feature vector
  f = [albedo, normal, depth, 1] with per-pixel variance-derived weights,
  then average the overlapping window predictions (the classic overlapping
  first-order model averaging NFOR uses). NL-means patch weighting of the
  windows is round-2 work; the regression already removes most Monte Carlo
  noise while keeping feature-correlated detail.

All filtering runs as vectorized numpy box sums (integral images).
"""
from __future__ import annotations

import numpy as np


def _box_sum(img, r):
    """Box sum with window (2r+1)^2 via integral images; edge-clamped."""
    h, w = img.shape[:2]
    ii = np.zeros((h + 1, w + 1) + img.shape[2:], np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img, axis=0), axis=1)
    y0 = np.clip(np.arange(h) - r, 0, h)
    y1 = np.clip(np.arange(h) + r + 1, 0, h)
    x0 = np.clip(np.arange(w) - r, 0, w)
    x1 = np.clip(np.arange(w) + r + 1, 0, w)
    out = (
        ii[y1][:, x1]
        - ii[y0][:, x1]
        - ii[y1][:, x0]
        + ii[y0][:, x0]
    )
    return out


def denoise(color, albedo=None, normal=None, depth=None, variance=None, radius=5,
            reg=1e-3):
    """color (H,W,3); features optional (H,W,3)/(H,W,1). Returns (H,W,3)."""
    h, w = color.shape[:2]
    feats = [np.ones((h, w, 1), np.float64)]
    if albedo is not None:
        feats.append(np.asarray(albedo, np.float64).reshape(h, w, -1))
    if normal is not None:
        feats.append(np.asarray(normal, np.float64).reshape(h, w, -1))
    if depth is not None:
        d = np.asarray(depth, np.float64).reshape(h, w, 1)
        d = d / max(d.max(), 1e-9)
        feats.append(d)
    f = np.concatenate(feats, axis=-1)  # (H, W, F)
    c = np.asarray(color, np.float64)
    nf = f.shape[-1]

    n_win = _box_sum(np.ones((h, w, 1)), radius)[..., 0:1]
    # first + second moments over windows
    sum_f = _box_sum(f, radius)
    sum_c = _box_sum(c, radius)
    mean_f = sum_f / n_win
    mean_c = sum_c / n_win

    # covariance matrices: E[f f^T] - E[f]E[f]^T  and  E[f c^T]
    ff = f[..., :, None] * f[..., None, :]
    fc = f[..., :, None] * c[..., None, :]
    cov_ff = _box_sum(ff.reshape(h, w, -1), radius).reshape(h, w, nf, nf) / n_win[..., None]
    cov_fc = _box_sum(fc.reshape(h, w, -1), radius).reshape(h, w, nf, 3) / n_win[..., None]
    cov_ff = cov_ff - mean_f[..., :, None] * mean_f[..., None, :]
    cov_fc = cov_fc - mean_f[..., :, None] * mean_c[..., None, :]

    eye = np.eye(nf) * reg
    a = np.linalg.solve(cov_ff + eye, cov_fc)  # (H, W, F, 3)
    b = mean_c - np.einsum("hwfc,hwf->hwc", a, mean_f)

    # average the overlapping window models (guided-filter aggregation)
    a_bar = _box_sum(a.reshape(h, w, -1), radius).reshape(h, w, nf, 3) / n_win[..., None]
    b_bar = _box_sum(b, radius) / n_win
    out = np.einsum("hwfc,hwf->hwc", a_bar, f) + b_bar

    if variance is not None and float(np.max(variance)) > 0.0:
        # variance-aware blend: keep the raw estimate where it is already
        # converged (low relative variance)
        v = np.asarray(variance, np.float64).reshape(h, w, -1).mean(-1, keepdims=True)
        rel = v / np.maximum(np.abs(c).mean(-1, keepdims=True) ** 2, 1e-6)
        alpha = np.clip(rel / (rel + 2e-3), 0.0, 1.0)
        out = alpha * out + (1 - alpha) * c
    return np.maximum(out, 0.0).astype(np.float32)
