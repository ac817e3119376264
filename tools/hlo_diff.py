"""Find the cross-process nondeterminism in the lowered _j_tile module.

The TPU persistent compile cache misses across processes for the fused tile
program (key mismatch) while toy programs hit — so something in the traced
module text differs run-to-run. This lowers the exact `cli test` program in
N child processes, writes each StableHLO text, and prints the first
differing lines.

Usage: python tools/hlo_diff.py [--runs 2]
"""
import argparse
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

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.core import rng

scene = buildmod.build('/root/reference/testsuite/mtoa/0004/data/disney.ass')
accel = tracemod.build(scene.geometry)
r = wavefront.TileRenderer(scene, accel, aa_samples=3)
# mirror render(): frame rays -> one tile's args
import rlshaders_tpu.integrator.camera as cammod
key = rng.stream(100)
cam = cammod.generate(scene.camera, rng.fold(key, 77), 3,
                      scene.options.filter_width, 256, 256)
n = cam.origin.shape[0]
tr = min(8192 * r.conf.n_sub, n)
lowered = wavefront._j_tile.lower(
    r.sc, r.static, r.conf,
    cam.origin, cam.direction, cam.pixel,
    jnp.zeros((1,), jnp.int32), key, tile_rays=tr)
open(%(out)r, "w").write(lowered.as_text())
print("wrote", %(out)r)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    paths = []
    for i in range(args.runs):
        out = os.path.join(tempfile.gettempdir(), f"hlo_run{i}.txt")
        code = CHILD % {"here": HERE, "out": out}
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1200)
        if p.returncode != 0:
            print(p.stderr[-3000:])
            return
        paths.append(out)
        print(f"run {i}: {os.path.getsize(out)/1e6:.1f} MB text")
    a = open(paths[0]).read().splitlines()
    b = open(paths[1]).read().splitlines()
    if a == b:
        print("IDENTICAL module text — nondeterminism is elsewhere "
              "(compile options? custom call backend config?)")
        return
    n_shown = 0
    for line in difflib.unified_diff(a, b, lineterm="", n=1):
        if line.startswith(("---", "+++", "@@")):
            continue
        if line.startswith(("-", "+")):
            print(line[:400])
            n_shown += 1
            if n_shown > 60:
                break


if __name__ == "__main__":
    main()
