"""Compile-only HBM probe for the fused tile program.

Lowers `_j_tile` for a real testsuite scene at the given tile size and AA,
compiles (AOT — no execution), and prints the TPU memory analysis plus the
largest padded temps from the optimized HLO. Fast signal for layout work:
no render needed.

Usage: python tools/memprobe.py [--scene .../disney.ass] [--tile 8192] [--aa 3]
       [--hlo out.hlo]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--scene", default="/root/reference/testsuite/mtoa/0004/data/disney.ass")
p.add_argument("--tile", type=int, default=8192)
p.add_argument("--aa", type=int, default=3)
p.add_argument("--hlo", default=None, help="also dump optimized HLO text here")
args = p.parse_args()

import jax
import numpy as np

import rlshaders_tpu  # noqa: F401
from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import camera as cameramod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.core import rng
from rlshaders_tpu.scene import build as buildmod

scene = buildmod.build(args.scene)
accel = tracemod.build(scene.geometry)
tr = wavefront.TileRenderer(scene, accel, aa_samples=args.aa)
n_rays = args.tile * args.aa * args.aa
key = rng.stream(0)
o = np.zeros((n_rays, 3), np.float32)
d = np.tile(np.array([0, 0, 1], np.float32), (n_rays, 1))

jitted = wavefront._j_tile
pixel = np.zeros((n_rays,), np.int32)
start1 = np.zeros((1,), np.int32)  # (1,) — rank-0 params land in S(6)
lowered = jitted.lower(
    tr.sc, tr.static, tr.conf, o, d, pixel, start1, key, tile_rays=n_rays
)
print(f"lowered; compiling tile={args.tile} aa={args.aa} n_rays={n_rays} ...",
      flush=True)
import time
t0 = time.time()
compiled = lowered.compile()
print(f"compiled in {time.time() - t0:.1f}s", flush=True)

ma = compiled.memory_analysis()
if ma is not None:
    for f in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, f, None)
        if v is not None:
            print(f"{f}: {v/1e9:.3f} GB" if v > 1e7 else f"{f}: {v/1e6:.2f} MB")

try:
    txt = compiled.as_text()
except Exception as e:  # noqa: BLE001
    txt = ""
    print("no compiled HLO text:", e)

if txt:
    if args.hlo:
        with open(args.hlo, "w") as f:
            f.write(txt)
        print("wrote", args.hlo, len(txt), "chars")
    # rank>=3 buffers with a small minor dim = the padding pathology
    pat = re.compile(r"f32\[([0-9,]+)\]\{([0-9,]+)[^}]*\}")
    from collections import Counter
    worst = Counter()
    for m in pat.finditer(txt):
        dims = [int(x) for x in m.group(1).split(",")]
        if len(dims) < 2:
            continue
        minor_order = [int(x) for x in m.group(2).split(",")]
        phys = [dims[i] for i in minor_order]  # minor..major
        pad = 1.0
        if len(phys) >= 1:
            pad *= np.ceil(phys[0] / 128) * 128 / phys[0]
        if len(phys) >= 2:
            pad *= np.ceil(phys[1] / 8) * 8 / phys[1]
        size = np.prod(dims) * 4 * pad
        if pad > 2.0 and size > 50e6:
            worst[(m.group(0).split("{")[0], f"pad{pad:.0f}x")] += 1
    for (shape, pad), cnt in worst.most_common(20):
        print(f"  {shape} {pad} x{cnt}")
