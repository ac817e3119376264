"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-device sharding is validated on
XLA's host-platform device simulation, per the reference test strategy's
TPU-native extension (SURVEY.md section 4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
