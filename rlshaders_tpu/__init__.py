"""rlshaders_tpu — a TPU-native physically-based shading + rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the rlShaders
Arnold plugin (reference: /root/reference): GGX microfacet BRDF/BSDF with VNDF
importance sampling, the Disney principled BRDF, and Burley normalized-diffusion
BSSRDF skin shading — plus the full renderer stack the reference delegated to
the Arnold SDK host (scene parsing, BVH ray tracing, light sampling with MIS,
a wavefront path-tracing integrator, EXR I/O, and a golden-image testsuite).

Design: everything inside the render loop is pure, batched, jit-compiled JAX
operating on SoA buffers; hot kernels are fused Pallas TPU kernels; multi-chip
scaling is data-parallel sharding of the path/pixel batch over a
`jax.sharding.Mesh` (see `rlshaders_tpu.parallel`).
"""

import os as _os

# The fused render programs embed Pallas trace kernels inside larger jitted
# stages; Mosaic's compile-time scoped-vmem ACCOUNTING (not actual VMEM use —
# ray/output blocks stream per grid step) rejects those embeddings at the
# default 16MB. Raise the limit before the TPU backend initializes; harmless
# on CPU. Appended (not overwritten) so user-provided flags survive.
_flags = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "xla_tpu_scoped_vmem_limit_kib" not in _flags:
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _flags + " --xla_tpu_scoped_vmem_limit_kib=131072"
    ).strip()

# Persistent XLA compilation cache — ALL platforms, including the axon TPU
# tunnel. Round 2 disabled it on TPU after measuring "slower + keys differ
# across processes"; round 4 ran the cause down (tools/cache_key_probe.py,
# tools/hlo_ctx_diff.py): the Pallas/Mosaic kernel payloads embed the
# PYTHON CALL STACK as MLIR locations, so the serialized module — and hence
# the cache key — changed with any difference in calling context (even the
# line numbers of the driver script). jax_traceback_in_locations_limit=0
# strips frame locations from lowered modules, making keys deterministic
# across processes; transport of the ~112 MB fused-tile executable over the
# tunnel costs seconds at the measured 60-80 MB/s (docs/perf.md), vs the
# 650-750 s recompile it replaces.
# jax 0.9 does not read env vars for these knobs; set through jax.config.
# Opt out by setting JAX_COMPILATION_CACHE_DIR="" explicitly.
import jax as _jax

_jax.config.update("jax_traceback_in_locations_limit", 0)
_cache = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
if _cache:
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
del _jax, _cache, _os, _flags

__version__ = "0.1.0"
