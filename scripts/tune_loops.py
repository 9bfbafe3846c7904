"""Sweep chunked-loop gain scalings and report the quality-probe metrics.

Each configuration runs in a fresh subprocess (jit caches bake the module
constants in at trace time).  Config string: "costas,mm" multiplicative
scales on (_COSTAS_ALPHA/_COSTAS_BETA) and (_MM_MU_GAIN/_MM_OMEGA_GAIN),
or "freeze_costas" / "freeze_mm" for loop-contribution decomposition.

Usage: python scripts/tune_loops.py [cfg ...]   (default: a standard grid)
"""

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, os.environ["TETRA_REPO"])
from tetra_tpu.rx import demod_fast as DF

cfg = os.environ["TETRA_TUNE"]
if cfg == "freeze_costas":
    DF._COSTAS_ALPHA = 0.0; DF._COSTAS_BETA = 0.0
elif cfg == "freeze_mm":
    DF._MM_MU_GAIN = 0.0; DF._MM_OMEGA_GAIN = 0.0
elif cfg == "freeze_both":
    DF._COSTAS_ALPHA = 0.0; DF._COSTAS_BETA = 0.0
    DF._MM_MU_GAIN = 0.0; DF._MM_OMEGA_GAIN = 0.0
else:
    parts = [float(v) for v in cfg.split(",")]
    if len(parts) == 2:
        cs, mu_s = parts
        om_s = mu_s
    else:
        cs, mu_s, om_s = parts
    DF._COSTAS_ALPHA *= cs; DF._COSTAS_BETA *= cs
    DF._MM_MU_GAIN *= mu_s; DF._MM_OMEGA_GAIN *= om_s

from scipy.signal import resample_poly
from tetra_tpu import params as P
from tetra_tpu.tx.channel import channel
from tetra_tpu.tx.modulator import modulate

rng = np.random.default_rng(9)
bits = rng.integers(0, 2, (1, 120_000)).astype(np.uint8)

def run(iq, skip=30_000):
    T = iq.shape[1] // DF.K_SAMP * DF.K_SAMP
    iq = iq[:, :T]
    state = DF.demod_init(1)
    state, outs = DF.demod_block(state, iq)
    dist = np.asarray(outs["dist"])[0]
    valid = np.asarray(outs["valid"])[0]
    d = dist[valid]
    return float(d[skip:].mean())

iq = np.asarray(modulate(jnp.asarray(bits)))
res = {"cfg": cfg}
res["clean"] = round(run(iq), 4)
iq4 = np.asarray(modulate(jnp.asarray(bits), sps=4))
res["mu_half"] = round(run(iq4[:, 1::2]), 4)
off = resample_poly(iq[0], 10_000, 10_001)[None, :]
res["ppm100"] = round(run(off.astype(np.complex64)), 4)
op = np.asarray(channel(jnp.asarray(iq), jax.random.key(2), snr_db=20.0,
                        cfo_hz=600.0, sample_rate=P.SAMPLE_RATE))
res["op_20db_600hz"] = round(run(op, skip=40_000), 4)
print(json.dumps(res))
"""


def main():
    cfgs = sys.argv[1:] or [
        "1,1", "0.5,1", "0.25,1", "1,0.5", "1,0.25",
        "0.5,0.5", "0.25,0.25", "0.125,0.125",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cfg in cfgs:
        env = dict(os.environ, TETRA_TUNE=cfg, TETRA_REPO=repo)
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                             capture_output=True, text=True, timeout=1800)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if not line:
            print(json.dumps({"cfg": cfg, "error": out.stderr[-300:]}))
        else:
            print(line)


if __name__ == "__main__":
    main()
