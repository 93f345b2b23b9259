"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); this framework tests every
math component against closed forms and every network against shape/dtype/
finiteness contracts. Distribution tests use XLA's host-platform device
virtualization so mesh/pjit/ZeRO paths are exercised without TPU hardware.

Note: this environment pre-imports jax (TPU tunnel), so env vars alone are
too late — the platform is forced via jax.config before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # override the ambient axon/TPU tunnel
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
