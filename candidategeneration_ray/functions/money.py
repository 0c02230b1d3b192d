"""Integer money/percent conversion with DuckDB round() semantics.

THE shared rounding kernel: half AWAY from zero (np.round is
half-to-even and diverges on exact .5), used by every operator whose
oracle compares integer cents/percents. One definition — the events
and relational pipelines import it rather than keeping copies that
could drift.
"""

from __future__ import annotations

import numpy as np


def round_scaled(values: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """value -> round(value * scale) as int64, half away from zero."""
    v = values * scale
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
