"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests exercise
`jax.sharding.Mesh` semantics on forced host devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel), which would run every eager test op over the wire. Tests always use the
# local CPU backend with 8 virtual devices.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize registers its PJRT plugin at interpreter startup and the
# env var alone does not win against it; the config update does.
jax.config.update("jax_platforms", "cpu")
# Allow float64 in tests: exactness oracles (dense KKT, closed-form GP algebra)
# compare in f64; production code paths pin explicit float32 dtypes regardless.
jax.config.update("jax_enable_x64", True)
