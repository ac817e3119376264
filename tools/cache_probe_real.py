"""Measure the TPU persistent compile cache on the REAL fused tile program.

Round-2 disabled the cache on TPU after one measurement ("slower than
recompiling"); that predates the 0.54 GB program shrink, and the toy probe
(tools/cache_probe.py) now shows cross-process cache key HITS on this
backend. This probe runs the actual case-0004 render program (the exact
shape class `cli test` uses: aa3, tile_pixels=8192) in two child processes
sharing a cache dir, and prints per-phase timings:

  p1: build+trace-build, first render (compile + serialize + run), 2nd render
  p2: same, where the first render should be a cache LOAD + run

Usage: python tools/cache_probe_real.py [--cache DIR] [--scene PATH]
"""
import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, logging
sys.path.insert(0, %(here)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""  # neutralize repo default
import rlshaders_tpu  # LIBTPU flags
import jax
import numpy as np
jax.config.update("jax_compilation_cache_dir", %(cache)r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.scene import build as buildmod

t0 = time.perf_counter()
scene = buildmod.build(%(scene)r)
accel = tracemod.build(scene.geometry)
t1 = time.perf_counter()
print(f"PHASE build {t1-t0:.1f}s", flush=True)
out = wavefront.render(scene, accel, tile_pixels=8192, aa_samples=3)
np.asarray(out["RGBA"])
t2 = time.perf_counter()
print(f"PHASE first-render {t2-t1:.1f}s", flush=True)
out = wavefront.render(scene, accel, tile_pixels=8192, aa_samples=3)
np.asarray(out["RGBA"])
t3 = time.perf_counter()
print(f"PHASE second-render {t3-t2:.1f}s", flush=True)
"""


def run_child(cache, scene, tag, timeout):
    code = CHILD % {"here": HERE, "cache": cache, "scene": scene}
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout)
    dt = time.perf_counter() - t0
    print(f"--- {tag}: wall {dt:.1f}s rc={p.returncode}")
    for line in (p.stdout + p.stderr).splitlines():
        low = line.lower()
        if line.startswith("PHASE") or "cache hit" in low or \
           "cache miss" in low or "not writing" in low or "error" in low:
            print("   ", line[:240], flush=True)
    if p.returncode != 0:
        print(p.stderr[-2000:])
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/axon_cache_real")
    ap.add_argument(
        "--scene",
        default="/root/reference/testsuite/mtoa/0004/data/disney.ass")
    ap.add_argument("--skip-p1", action="store_true")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    os.makedirs(args.cache, exist_ok=True)
    if not args.skip_p1:
        run_child(args.cache, args.scene, "process 1 (cold)", args.timeout)
        entries = os.listdir(args.cache)
        total = sum(os.path.getsize(os.path.join(args.cache, e))
                    for e in entries)
        print(f"cache after p1: {len(entries)} files, {total/1e6:.1f} MB",
              flush=True)
    run_child(args.cache, args.scene, "process 2 (warm?)", args.timeout)


if __name__ == "__main__":
    main()
