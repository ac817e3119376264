"""Diagnose the TPU (axon) persistent compile cache: do cache keys match
across processes, does a disk hit actually load, and what does serialize/
deserialize cost vs recompile?

Round-2 disabled the cache on TPU after measuring renders slower with it
on and noting "cache keys differ across processes" — this probe pins down
WHY (key mismatch vs transport cost), because a working cache would cut
the 650-750s per-process compile of the fused tile program to seconds.

Runs the same jitted program in two child processes sharing a fresh cache
dir with jax_explain_cache_misses logging, then prints both logs' cache
lines and timings.

Usage: python tools/cache_probe.py [--size big]
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, logging
sys.path.insert(0, %(here)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""  # neutralize repo default
import rlshaders_tpu  # LIBTPU flags
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", %(cache)r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_explain_cache_misses", True)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

n = %(n)d
x = jnp.ones((n, n), jnp.float32)

def f(x):
    for i in range(12):
        x = jnp.tanh(x @ x) * 0.5 + jnp.float32(i) * 1e-6
    return x.sum()

t0 = time.perf_counter()
fn = jax.jit(f)
v = float(fn(x))
t1 = time.perf_counter()
print(f"CHILD first-call {t1-t0:.2f}s value {v:.4f}", flush=True)
"""


def run_child(cache, n, tag):
    code = CHILD % {"here": HERE, "cache": cache, "n": n}
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200)
    dt = time.perf_counter() - t0
    print(f"--- {tag}: wall {dt:.2f}s rc={p.returncode}")
    for line in (p.stdout + p.stderr).splitlines():
        low = line.lower()
        if ("cache" in low and "jax" in low) or line.startswith("CHILD"):
            print("   ", line[:300])
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    cache = tempfile.mkdtemp(prefix="axon_cache_probe_")
    print("cache dir:", cache)
    run_child(cache, args.n, "process 1 (cold, writes)")
    entries = os.listdir(cache)
    total = sum(os.path.getsize(os.path.join(cache, e)) for e in entries)
    print(f"cache entries after p1: {len(entries)} files, {total/1e6:.1f} MB")
    run_child(cache, args.n, "process 2 (should READ)")
    if not args.keep:
        import shutil
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
