"""HLL small-range bias correction (Heule et al. empirical interpolation).

Semantics match /root/reference/CardinalityEstimation/BiasCorrection.cs:112-172:
binary-search the raw-estimate sample points for the precision, linearly
interpolate the bias between the neighbours (clamping to the first/last bias
outside the sampled range), subtract, floor at zero.
"""

from __future__ import annotations

import numpy as np

from .bias_tables import BIAS_DATA, RAW_ESTIMATE

_RAW = {p: np.asarray(v, dtype=np.float64) for p, v in RAW_ESTIMATE.items()}
_BIAS = {p: np.asarray(v, dtype=np.float64) for p, v in BIAS_DATA.items()}


def get_bias(raw_estimate: float, bits: int) -> float:
    if bits not in _RAW:
        raise ValueError(f"bias tables cover precisions 4..18, got {bits}")
    raw = _RAW[bits]
    bias = _BIAS[bits]
    idx = int(np.searchsorted(raw, raw_estimate, side="left"))
    if idx < len(raw) and raw[idx] == raw_estimate:
        return float(bias[idx])
    if idx >= len(raw):
        return float(bias[-1])
    if idx <= 0:
        return float(bias[0])
    lo, hi = raw[idx - 1], raw[idx]
    frac = (raw_estimate - lo) / (hi - lo)
    return float(bias[idx - 1] + frac * (bias[idx] - bias[idx - 1]))


def correct_bias(value: float, bits: int) -> float:
    """Bias-corrected estimate, clamped non-negative."""
    return max(value - get_bias(value, bits), 0.0)
