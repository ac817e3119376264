"""Per-component cache-key hashes for the real _j_tile program, WITHOUT
compiling: monkeypatch the backend compile away and trigger the cache-key
path with jax._src.cache_key DEBUG logging. Run in two processes and diff
the component hash chains to find which key component breaks cross-process
(the module TEXT is identical — tools/hlo_diff.py).

Usage: python tools/cache_key_probe.py
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, logging
sys.path.insert(0, %(here)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
import rlshaders_tpu
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/axon_cache_real")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

from jax._src import compiler as _comp

class _Stop(Exception):
    pass

_orig = _comp.backend_compile_and_load

def _no_compile(backend, computation, *a, **k):
    from jax._src.lib.mlir import ir
    name = ir.StringAttr(
        computation.operation.attributes["sym_name"]).value
    if "_j_tile" in name:
        raise _Stop("stop-before-compile")
    return _orig(backend, computation, *a, **k)

_comp.backend_compile_and_load = _no_compile

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.core import rng
import rlshaders_tpu.integrator.camera as cammod

scene = buildmod.build('/root/reference/testsuite/mtoa/0004/data/disney.ass')
accel = tracemod.build(scene.geometry)
r = wavefront.TileRenderer(scene, accel, aa_samples=3)
key = rng.stream(100)
cam = cammod.generate(scene.camera, rng.fold(key, 77), 3,
                      scene.options.filter_width, 256, 256)
tr = min(8192 * r.conf.n_sub, cam.origin.shape[0])
try:
    if os.environ.get("RLS_PROBE_RENDER", "0") == "1":
        wavefront.render(scene, accel, tile_pixels=8192, aa_samples=3)
    else:
        wavefront._j_tile(
            r.sc, r.static, r.conf,
            cam.origin, cam.direction, cam.pixel,
            jnp.zeros((1,), jnp.int32), key, tile_rays=tr)
except Exception as e:
    print("stopped:", type(e).__name__, str(e)[:120], flush=True)
"""


def main():
    logs = []
    for i in range(2):
        p = subprocess.run([sys.executable, "-c", CHILD % {"here": HERE}],
                           capture_output=True, text=True, timeout=1200)
        lines = [l.split("cache_key:", 1)[-1].strip()
                 for l in (p.stdout + p.stderr).splitlines()
                 if "hash after serializing" in l or "MISS for 'jit__j_tile'"
                 in l or l.startswith("stopped")]
        # dedup consecutive (two log handlers emit each line twice)
        ded = [l for j, l in enumerate(lines) if j == 0 or l != lines[j - 1]]
        logs.append(ded)
        print(f"--- run {i}: {len(ded)} lines, rc={p.returncode}")
    a, b = logs
    n = max(len(a), len(b))
    for i in range(n):
        la = a[i] if i < len(a) else "<missing>"
        lb = b[i] if i < len(b) else "<missing>"
        marker = "  " if la == lb else "**"
        print(f"{marker} {la[:160]}")
        if la != lb:
            print(f"{marker} {lb[:160]}")


if __name__ == "__main__":
    main()
