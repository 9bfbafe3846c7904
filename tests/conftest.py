"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware per SURVEY.md section 4
(the driver separately dry-runs the multichip path; benches run on real TPU).

NOTE: this environment bakes an `axon` TPU PJRT plugin into every interpreter
via sitecustomize (PYTHONPATH=/root/.axon_site), which imports jax at startup
and latches JAX_PLATFORMS from the env.  Setting the env var here is too
late - use jax.config.update instead, which cleanly selects the CPU backend
and avoids touching the (single, shared) TPU tunnel from test runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
