"""Multi-chip sharding for the demod pipeline (jax.sharding + shard_map).

The scale-out axes (SURVEY.md section 2.10):
  * "ch" (data parallel): independent 25 kHz channels — the demod chain is
    embarrassingly parallel across channels, so the (C, T) batch shards its
    channel axis across the mesh with NO communication.
  * "t" (sequence parallel): within-channel time sharding for the stateless
    convolution stages, using overlap-save with halo exchange via
    `jax.lax.ppermute` over ICI (the reference's only "communication
    backend" is in-process stream buffers; this is the TPU-native analog).

The per-sample feedback loops carry state along time and therefore stay
sequential per channel; scaling comes from the channel axis, exactly as the
build plan prescribes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from ..core.fir import fir_valid
from ..rx import demod_fast as demod_mod


def make_mesh(n_devices: int | None = None, axis: str = "ch") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# Channel-sharded demod (dp axis)
# ---------------------------------------------------------------------------


def sharded_demod_step(mesh: Mesh, block_len: int):
    """Build a jitted multi-chip demod step: (state, iq (C,T)) -> (state, outs).

    Channels shard across the mesh; each device runs the full chain on its
    local channels.  State is sharded identically so no resharding happens
    between blocks.
    """
    n_chunks = int(np.ceil(block_len / (demod_mod.K_SYM * 1.96))) + 1

    def step(state, xr, xi):
        return demod_mod._demod_block_impl(state, xr, xi, n_chunks)

    cspec = Pspec("ch")
    state_spec = jax.tree.map(lambda _: cspec, demod_mod.demod_init(1))
    out_spec = dict(sym_re=cspec, sym_im=cspec, dibits=cspec, valid=cspec,
                    dist=cspec, fll_freq=cspec, agc_gain=cspec)
    shard = jax.shard_map(step, mesh=mesh,
                          in_specs=(state_spec, cspec, cspec),
                          out_specs=(state_spec, out_spec))
    return jax.jit(shard)


def sharded_demod_init(mesh: Mesh, channels: int) -> demod_mod.DemodState:
    state = demod_mod.demod_init(channels)
    spec = NamedSharding(mesh, Pspec("ch"))
    return jax.tree.map(lambda x: jax.device_put(x, spec), state)


# ---------------------------------------------------------------------------
# Time-sharded overlap-save FIR with ppermute halo exchange (sp axis)
# ---------------------------------------------------------------------------


def halo_fir(mesh: Mesh, h: np.ndarray, axis: str = "t"):
    """Build a time-sharded streaming FIR: each device holds a contiguous
    time shard of every channel; the (M-1)-sample halo travels left->right
    between neighbor shards over ICI via `lax.ppermute`.

    Returns a jitted fn: x (C, T_total) sharded on time -> y same sharding,
    where y matches the unsharded causal convolution (zero history at t=0).
    Operates on a float32 plane (run once for re and once for im).
    """
    M = len(h)
    n = mesh.shape[axis]
    hj = jnp.asarray(np.asarray(h, np.float32))

    def local(x):
        # x: (C, T_local) this device's shard
        halo = x[:, -(M - 1):]
        # send my trailing halo to my right neighbor
        left_halo = jax.lax.ppermute(
            halo, axis, [(i, i + 1) for i in range(n - 1)])
        idx = jax.lax.axis_index(axis)
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        ext = jnp.concatenate([left_halo, x], axis=1)
        return fir_valid(ext, hj)

    shard = jax.shard_map(local, mesh=mesh,
                          in_specs=Pspec(None, axis),
                          out_specs=Pspec(None, axis))
    return jax.jit(shard)
