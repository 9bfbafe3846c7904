"""Channel impairment models for fixtures and BER sweeps (JAX).

Supports the BASELINE.json config-2 stress axes: carrier-frequency offset,
phase offset, gain, AWGN at a target SNR, and integer timing offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_cfo(iq: jnp.ndarray, cfo_hz: float, sample_rate: float,
              phase0: float = 0.0) -> jnp.ndarray:
    """Rotate by a carrier frequency offset (Hz at the given sample rate)."""
    n = jnp.arange(iq.shape[-1], dtype=jnp.float32)
    rot = jnp.exp(1j * (2.0 * jnp.pi * cfo_hz / sample_rate * n + phase0))
    return (iq * rot).astype(jnp.complex64)


def add_awgn(iq: jnp.ndarray, snr_db: float, key: jax.Array,
             signal_power: float | None = None) -> jnp.ndarray:
    """Add complex AWGN for a target SNR (dB) relative to signal power.

    If signal_power is None it is measured from the block.
    """
    if signal_power is None:
        signal_power = jnp.mean(jnp.abs(iq) ** 2)
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(noise_power / 2.0)
    noise = (jax.random.normal(kr, iq.shape) +
             1j * jax.random.normal(ki, iq.shape)) * std
    return (iq + noise).astype(jnp.complex64)


def channel(iq: jnp.ndarray, key: jax.Array, snr_db: float = 30.0,
            cfo_hz: float = 0.0, sample_rate: float = 36000.0,
            gain: float = 1.0, phase0: float = 0.0,
            delay_samples: int = 0) -> jnp.ndarray:
    """Composite impairment: delay -> gain/phase/CFO -> AWGN."""
    if delay_samples:
        iq = jnp.concatenate(
            [jnp.zeros(iq.shape[:-1] + (delay_samples,), iq.dtype), iq], -1)
    iq = iq * gain
    iq = apply_cfo(iq, cfo_hz, sample_rate, phase0)
    return add_awgn(iq, snr_db, key)
