"""Capture the exact _j_tile module text AT COMPILE TIME in two different
process contexts (direct _j_tile call vs full wavefront.render) and diff —
identifies what context-dependent content leaks into the traced module and
breaks the persistent-cache key across processes.

Usage: python tools/hlo_ctx_diff.py
"""
import difflib
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
sys.path.insert(0, %(here)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
import rlshaders_tpu
import jax
import jax.numpy as jnp
import numpy as np

from jax._src import compiler as _comp

class _Stop(Exception):
    pass

_orig = _comp.backend_compile_and_load

def _cap(backend, computation, *a, **k):
    from jax._src.lib.mlir import ir
    name = ir.StringAttr(
        computation.operation.attributes["sym_name"]).value
    if "_j_tile" in name:
        open(%(out)r, "w").write(str(computation))
        raise _Stop("captured")
    return _orig(backend, computation, *a, **k)

_comp.backend_compile_and_load = _cap

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.core import rng
import rlshaders_tpu.integrator.camera as cammod

scene = buildmod.build('/root/reference/testsuite/mtoa/0004/data/disney.ass')
accel = tracemod.build(scene.geometry)
try:
    if %(render)d:
        wavefront.render(scene, accel, tile_pixels=8192, aa_samples=3)
    else:
        r = wavefront.TileRenderer(scene, accel, aa_samples=3)
        key = rng.stream(100)
        cam = cammod.generate(scene.camera, rng.fold(key, 77), 3,
                              scene.options.filter_width, 256, 256)
        tr = min(8192 * r.conf.n_sub, cam.origin.shape[0])
        wavefront._j_tile(
            r.sc, r.static, r.conf,
            cam.origin, cam.direction, cam.pixel,
            jnp.zeros((1,), jnp.int32), key, tile_rays=tr)
except Exception as e:
    print("stopped:", type(e).__name__, str(e)[:120], flush=True)
"""


def run(render, out):
    code = CHILD % {"here": HERE, "out": out, "render": render}
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200)
    ok = os.path.exists(out)
    print(f"render={render}: rc={p.returncode} captured={ok} "
          f"size={os.path.getsize(out)/1e6 if ok else 0:.1f}MB")
    if not ok:
        print(p.stderr[-2000:])
    return ok


def main():
    t = tempfile.gettempdir()
    pa = os.path.join(t, "hlo_ctx_direct.txt")
    pb = os.path.join(t, "hlo_ctx_render.txt")
    if not (run(0, pa) and run(1, pb)):
        return
    a = open(pa).read().splitlines()
    b = open(pb).read().splitlines()
    if a == b:
        print("IDENTICAL — context difference is not in the module text")
        return
    shown = 0
    for line in difflib.unified_diff(a, b, lineterm="", n=0):
        if line.startswith(("---", "+++")):
            continue
        print(line[:300])
        shown += 1
        if shown > 80:
            break
    print(f"(total diff lines shown {shown})")


if __name__ == "__main__":
    main()
