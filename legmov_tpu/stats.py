"""Small statistics helpers (reference math_util.cpp:7-43 equivalents).

The reference carries Eigen-based median/mean/stddev and an approximate
float comparison for its benchmark plumbing; kept here for API parity and
for host-side report code that wants them without importing scipy.
"""

from __future__ import annotations

import numpy as np


def median(values) -> float:
    """Middle element (mean of the two middles for even n),
    like ``calculateMedian`` (math_util.cpp:7-20)."""
    a = np.sort(np.asarray(values, dtype=np.float64).ravel())
    if a.size == 0:
        raise ValueError("median of empty array")
    return float(np.median(a))


def mean_stddev(values) -> tuple[float, float]:
    """Mean and population standard deviation (math_util.cpp:22-35)."""
    a = np.asarray(values, dtype=np.float64).ravel()
    return float(a.mean()), float(a.std())


def close(a: float, b: float, tol: float = 1e-5) -> bool:
    """Absolute-tolerance float comparison (math_util.cpp:37-43)."""
    return abs(a - b) < tol
