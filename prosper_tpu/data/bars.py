"""Bars-test toolkit: ground-truth dictionaries, data, and recovery scoring.

Reference behavior: SURVEY.md §2 "Bars-test toolkit" —
``prosper/utils/barstest.py :: generate_bars_dict`` plus learned->true
matching (mount unavailable).  The bars test is THE correctness benchmark of
the reference (SURVEY.md §0): D = R^2 pixels, 2R ground-truth bars
(horizontal + vertical), data generated from the model itself; success =
recovering all bars.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def generate_bars_dict(H: int, neg_bars: bool = False,
                       intensity: float = 10.0) -> np.ndarray:
    """(D, H) dictionary of single-pixel-wide bars on an R x R grid, R = H//2.

    Columns 0..R-1 are horizontal bars, R..2R-1 vertical.  With
    ``neg_bars=True`` alternate bars are negative (for TSC/MMCA-style tests).
    """
    if H % 2 != 0:
        raise ValueError("H must be even (H = 2R bars)")
    R = H // 2
    D = R * R
    W = np.zeros((R, R, H))
    for i in range(R):
        W[i, :, i] = intensity
        W[:, i, R + i] = intensity
    W = W.reshape(D, H)
    if neg_bars:
        W[:, 1::2] *= -1.0
    return W


def cosine_match(W_learned: np.ndarray, W_true: np.ndarray,
                 signed: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Optimally assign learned columns to ground-truth columns.

    Returns (assignment, cosines): for each true column j, the matched
    learned column index and the |cosine| (signed=False keeps raw cosine).
    Uses the Hungarian algorithm on the (true x learned) cosine matrix —
    the reference uses a greedy/Hungarian-style cosine matching
    (SURVEY.md §2 "Bars-test toolkit").
    """
    Wl = np.asarray(W_learned, np.float64)
    Wt = np.asarray(W_true, np.float64)
    nl = np.linalg.norm(Wl, axis=0, keepdims=True) + 1e-12
    nt = np.linalg.norm(Wt, axis=0, keepdims=True) + 1e-12
    C = (Wt / nt).T @ (Wl / nl)          # (H_true, H_learned) cosines
    score = np.abs(C) if signed else C
    rows, cols = linear_sum_assignment(-score)
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    return cols, score[rows, cols]


def count_recovered_bars(W_learned, W_true, threshold: float = 0.8,
                         signed: bool = False) -> int:
    """Number of ground-truth bars matched with cosine above threshold."""
    _, cosines = cosine_match(W_learned, W_true, signed=signed)
    return int(np.sum(cosines > threshold))


def bars_gt_params(model, intensity: float = 10.0, pi: float = None,
                   sigma: float = 1.0, neg_bars: bool = False) -> Dict:
    """Ground-truth parameter dict for a bars test on the given model.

    The dictionary holds H_true = 2R bars where R^2 = model.D; when the
    model is overcomplete (H > 2R) the bars occupy the first 2R columns and
    the rest are zero (standard overcomplete bars setup).
    """
    R = int(round(np.sqrt(model.D)))
    if R * R != model.D:
        raise ValueError(f"bars test needs square D, got D={model.D}")
    H_true = 2 * R
    if model.H < H_true:
        raise ValueError(f"model H={model.H} < number of bars {H_true}")
    W = np.zeros((model.D, model.H))
    W[:, :H_true] = generate_bars_dict(H_true, neg_bars=neg_bars,
                                       intensity=intensity)
    if pi is None:
        pi = 2.0 / model.H
    params = {"W": W.astype(np.float32), "pi": np.float32(pi),
              "sigma": np.float32(sigma)}
    if hasattr(model, "phi"):  # DSC: uniform over non-zero values
        K = len(model.phi)
        params["pi"] = np.full((K,), pi / K, np.float32)
    return params
