"""Shared numpy helpers for the Arrow-vectorized kernels.

One rounding definition for every np kernel: `np.round` rounds half to
EVEN (banker's), while Spark's `F.round` and DuckDB's `round` — the
two engines every kernel is hash-compared against — round half AWAY
from zero. A score landing exactly on the half grid (e.g. a cosine of
0.0078125 at 6 dp) would flip between the kernel and its oracle and
could swap ranks at a top-k cutoff (r6 review #5). All kernels
therefore round through `round_half_up`.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, decimals: int):
    """Round half away from zero — `F.round` / DuckDB semantics.

    Implemented as sign(x)·floor(|x|·10^d + 0.5)/10^d: for values on
    the representable half grid this matches BigDecimal HALF_UP where
    `np.round` diverges; off the grid both formulations agree (the
    binary double is strictly above or below the boundary).
    """
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
