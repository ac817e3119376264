"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-device sharding is validated
on XLA's host-platform device simulation (tests/test_parallel.py), per the
reference test strategy's TPU-native extension (SURVEY.md section 4).

A sitecustomize may have registered a hardware PJRT plugin (and forced
JAX_PLATFORMS) before this file runs, so we both fix the env AND update the
jax config — the latter wins as long as no backend has been initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
