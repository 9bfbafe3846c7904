"""Second-order phase control loop as pure functions (JAX-friendly).

The reference builds every feedback stage (FLL, symbol timing, Costas) on
SDR++'s `PhaseControlLoop` (2nd-order alpha/beta loop with frequency clamps;
see SURVEY.md section 2.2).  Here the loop update is a pure function over an
explicit (phase, freq) state so it can live inside `lax.scan` carries and
Pallas kernels, vectorized over a channel axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def critically_damped(bandwidth: float, damping: float = np.sqrt(2.0) / 2.0
                      ) -> tuple[float, float]:
    """alpha/beta gains for a 2nd-order loop at the given noise bandwidth.

    Same closed form the reference derives at src/main.cpp:77-82:
      denom = 1 + 2 zeta bw + bw^2
      alpha = 4 zeta bw / denom,  beta = 4 bw^2 / denom
    """
    denom = 1.0 + 2.0 * damping * bandwidth + bandwidth * bandwidth
    alpha = (4.0 * damping * bandwidth) / denom
    beta = (4.0 * bandwidth * bandwidth) / denom
    return float(alpha), float(beta)


class PCLState(NamedTuple):
    phase: jnp.ndarray  # (...,) float32
    freq: jnp.ndarray   # (...,) float32


def pcl_advance(state: PCLState, error, alpha: float, beta: float,
                min_freq: float, max_freq: float,
                wrap_phase: bool = True,
                min_phase: float = -np.pi, max_phase: float = np.pi
                ) -> PCLState:
    """One loop update: freq += beta*err (clamped); phase += freq + alpha*err.

    With wrap_phase the phase is wrapped into [min_phase, max_phase] by
    adding/subtracting the span (the reference wraps rather than clamps).
    """
    freq = jnp.clip(state.freq + beta * error, min_freq, max_freq)
    phase = state.phase + freq + alpha * error
    if wrap_phase:
        span = max_phase - min_phase
        phase = phase - span * jnp.floor((phase - min_phase) / span)
    return PCLState(phase=phase, freq=freq)
