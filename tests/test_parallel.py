"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetra_tpu.core import taps
from tetra_tpu.core.fir import fir_valid
from tetra_tpu.parallel import mesh as pmesh
from tetra_tpu.rx import demod as demod_mod

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

RNG = np.random.default_rng(3)


def test_halo_fir_matches_unsharded():
    mesh = pmesh.make_mesh(8, "t")
    h = taps.root_raised_cosine(65, 0.35, 18000, 36000)
    fir = pmesh.halo_fir(mesh, h)
    x = RNG.standard_normal((4, 128 * 8)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "t")))
    y = np.asarray(fir(xs))
    # unsharded reference: zero history + valid conv
    ext = np.concatenate([np.zeros((4, 64), np.float32), x], axis=1)
    want = np.asarray(fir_valid(jnp.asarray(ext), jnp.asarray(h)))
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_sharded_demod_matches_single_device():
    mesh = pmesh.make_mesh(8, "ch")
    C, T = 16, 512
    iq = (RNG.standard_normal((C, T))
          + 1j * RNG.standard_normal((C, T))).astype(np.complex64) * 0.5
    # unsharded
    state0 = demod_mod.demod_init(C)
    _, outs_ref = demod_mod.demod_block(state0, jnp.asarray(iq))
    # sharded
    state = pmesh.sharded_demod_init(mesh, C)
    step = pmesh.sharded_demod_step(mesh, T)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("ch"))
    xr = jax.device_put(jnp.asarray(iq.real.astype(np.float32)), sh)
    xi = jax.device_put(jnp.asarray(iq.imag.astype(np.float32)), sh)
    _, outs = step(state, xr, xi)
    np.testing.assert_array_equal(np.asarray(outs["dibits"]),
                                  np.asarray(outs_ref["dibits"]))
    np.testing.assert_array_equal(np.asarray(outs["valid"]),
                                  np.asarray(outs_ref["valid"]))
