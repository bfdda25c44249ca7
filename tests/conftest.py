"""Test harness config: run everything on a virtual 8-device CPU mesh.

The reference had no tests (SURVEY.md §4); this suite is the replacement.
Forcing 8 host-platform devices exercises the mesh / pjit / collective code
paths without TPU hardware (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

# Hard override: the session environment may point JAX at a real TPU
# platform (e.g. JAX_PLATFORMS=axon via a tunnel) AND pre-import jax from a
# sitecustomize, so env vars alone are too late — go through jax.config.
# Unit tests must run on the virtual 8-device CPU platform regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup on purpose)

jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 numerics against torch; XLA's "default" matmul
# precision is allowed to downcast (bf16-scale error), so force full fp32.
jax.config.update("jax_default_matmul_precision", "highest")
