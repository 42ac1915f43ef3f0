"""JPEG Lossless (Process 14) prediction, batched.

Semantics of reference jpeg/lossless/predictors.go:12-54 and the scan
order/neighbor-default rules of jpeg/lossless/encoder.go:219-282 /
decoder.go:210-336: 7 predictors over (Ra=left, Rb=above, Rc=above-left),
boundary neighbors replaced by 2^(P-1) (with the predictor-1 first-column
exception: Ra = sample above), first pixel predicted as 2^(P-1),
differences wrapped to int16, reconstruction wrapped to [0, 2^P).

The encode direction is embarrassingly parallel: Ra/Rb/Rc are whole-plane
shifts, so diffs for a full [H, W] plane (or a batch) are one vector
expression. Decode is a 2D recurrence: predictors 1-5 reduce to per-row
cumsums / previous-row vector ops; 6-7 are true scans (scalar inner loop).
"""

from __future__ import annotations

import numpy as np


def _predict(p: int, ra, rb, rc):
    """Predictor formulas (predictors.go:12-54); numpy-elementwise."""
    if p == 1:
        return ra
    if p == 2:
        return rb
    if p == 3:
        return rc
    if p == 4:
        return ra + rb - rc
    if p == 5:
        return ra + ((rb - rc) >> 1)
    if p == 6:
        return rb + ((ra - rc) >> 1)
    if p == 7:
        return (ra + rb) >> 1
    return ra


def encode_diffs(plane: np.ndarray, predictor: int, precision: int
                 ) -> np.ndarray:
    """[H, W] samples → int16-wrapped prediction differences.

    Matches encoder.go:219-282's neighbor rules exactly.
    """
    s = plane.astype(np.int64)
    h, w = s.shape
    default = 1 << (precision - 1)

    ra = np.empty_like(s)
    ra[:, 1:] = s[:, :-1]
    if predictor == 1:
        ra[0, 0] = default
        ra[1:, 0] = s[:-1, 0]  # pred-1 column exception (encoder.go:236-241)
    else:
        ra[:, 0] = default

    rb = np.empty_like(s)
    rb[1:, :] = s[:-1, :]
    rb[0, :] = default

    rc = np.full_like(s, default)
    rc[1:, 1:] = s[:-1, :-1]

    pred = _predict(predictor, ra, rb, rc)
    pred[0, 0] = default
    diff = s - pred
    return ((diff + 0x8000) & 0xFFFF).astype(np.int64) - 0x8000


def reconstruct(diffs: np.ndarray, predictor: int, precision: int
                ) -> np.ndarray:
    """Inverse of encode_diffs: [H, W] diffs → samples in [0, 2^P).

    Mirrors decoder.go:210-336 with per-row vectorization where the
    recurrence allows (predictors 1-5) and a scalar scan for 6-7.
    """
    d = diffs.astype(np.int64)
    h, w = d.shape
    default = 1 << (precision - 1)
    mod = 1 << precision
    s = np.zeros((h, w), dtype=np.int64)

    # first row: Rb=Rc=default; pred reduces to a left-to-right form
    s[0, 0] = (default + d[0, 0]) % mod
    if w > 1:
        if predictor in (2, 3):
            s[0, 1:] = (default + d[0, 1:]) % mod
        elif predictor in (1, 4, 5):          # pred = Ra (4,5 collapse)
            s[0, :] = (default + np.cumsum(d[0, :])) % mod
        elif predictor == 6:                   # default + ((Ra-default)>>1)
            for c in range(1, w):
                pred = default + ((s[0, c - 1] - default) >> 1)
                s[0, c] = (pred + d[0, c]) % mod
        elif predictor == 7:                   # (Ra+default)>>1
            for c in range(1, w):
                pred = (s[0, c - 1] + default) >> 1
                s[0, c] = (pred + d[0, c]) % mod

    for r in range(1, h):
        above = s[r - 1]
        # column 0: Ra = (pred1 ? above : default), Rb = above, Rc = default
        if predictor == 1:
            col0_pred = above[0]
        elif predictor in (2, 4):
            col0_pred = above[0]
        elif predictor == 3:
            col0_pred = default
        elif predictor == 5:
            col0_pred = default + ((above[0] - default) >> 1)
        elif predictor == 6:
            col0_pred = above[0] + ((default - default) >> 1)
        else:  # 7
            col0_pred = (default + above[0]) >> 1
        s[r, 0] = (col0_pred + d[r, 0]) % mod
        if w == 1:
            continue

        if predictor == 1:
            s[r, 1:] = (s[r, 0] + np.cumsum(d[r, 1:])) % mod
        elif predictor == 2:
            s[r, 1:] = (above[1:] + d[r, 1:]) % mod
        elif predictor == 3:
            s[r, 1:] = (above[:-1] + d[r, 1:]) % mod
        elif predictor == 4:
            inc = d[r, 1:] + above[1:] - above[:-1]
            s[r, 1:] = (s[r, 0] + np.cumsum(inc)) % mod
        elif predictor == 5:
            inc = d[r, 1:] + ((above[1:] - above[:-1]) >> 1)
            s[r, 1:] = (s[r, 0] + np.cumsum(inc)) % mod
        elif predictor == 6:
            for c in range(1, w):
                pred = above[c] + ((s[r, c - 1] - above[c - 1]) >> 1)
                s[r, c] = (pred + d[r, c]) % mod
        else:  # 7
            for c in range(1, w):
                pred = (s[r, c - 1] + above[c]) >> 1
                s[r, c] = (pred + d[r, c]) % mod
    return s


def select_best_predictor(planes, width: int, height: int) -> int:
    """Lowest prediction-error variance wins (predictors.go:80-96).

    Uses zero-valued out-of-bounds neighbors like the reference's variance
    scan (predictors.go:101-133), which differs from the scan's
    default-value rule — reproduced as-is since it only picks a predictor.
    """
    best, best_var = 1, None
    for p in range(1, 8):
        total = 0
        count = 0
        for plane in planes:
            s = plane.astype(np.int64)
            ra = np.zeros_like(s)
            ra[:, 1:] = s[:, :-1]
            rb = np.zeros_like(s)
            rb[1:, :] = s[:-1, :]
            rc = np.zeros_like(s)
            rc[1:, 1:] = s[:-1, :-1]
            diff = s - _predict(p, ra, rb, rc)
            total += int((diff * diff).sum())
            count += s.size
        var = total // count if count else 0
        if best_var is None or var < best_var:
            best, best_var = p, var
    return best
