"""Fidelity analysis: render a testsuite case and localize error vs golden.

Usage: python tools/analyze_case.py 0004 [--res 256] [--aa 3] [--platform cpu]

Writes out/analysis_<case>/{test,ref,diff,absdiff}.exr plus a text report of
signed mean error per image region, top error rows/cols, and per-material-ish
segmentation (by luminance bands of the reference).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case")
p.add_argument("--res", type=int, default=256)
p.add_argument("--aa", type=int, default=3)
p.add_argument("--platform", default=None)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--suite", default="/root/reference/testsuite")
args = p.parse_args()

if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize registers its TPU plugin at python startup and
    # ignores later env edits; pop its trigger AND update jax.config below
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.utils.watermark import watermark_mask

case_dir = os.path.join(args.suite, "mtoa", args.case)
data = os.path.join(case_dir, "data")
scene_path = os.path.join(data, [f for f in os.listdir(data) if f.endswith(".ass")][0])

scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)
out = wavefront.render(
    scene, accel, seed=args.seed, aa_samples=args.aa,
    xres=args.res, yres=args.res, tile_pixels=8192,
)
test = np.asarray(out["RGBA"], np.float32)
ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))

if test.shape != ref.shape:
    f = ref.shape[0] // test.shape[0]
    ref = ref[: test.shape[0] * f, : test.shape[1] * f].reshape(
        test.shape[0], f, test.shape[1], f, 3).mean((1, 3))

wm = watermark_mask(args.suite)
if wm is not None and wm.shape == ref.shape[:2]:
    wm_mask = wm
else:
    wm_mask = np.zeros(ref.shape[:2], bool)

diff = test - ref
valid = ~wm_mask
rmse_full = float(np.sqrt((diff ** 2).mean()))
rmse_mask = float(np.sqrt((diff[valid] ** 2).mean()))

outdir = os.path.join("out", f"analysis_{args.case}")
os.makedirs(outdir, exist_ok=True)
exr.write_rgb(os.path.join(outdir, "test.exr"), test)
exr.write_rgb(os.path.join(outdir, "ref.exr"), ref)
exr.write_rgb(os.path.join(outdir, "diff.exr"), diff * 10 + 0.5)
exr.write_rgb(os.path.join(outdir, "absdiff.exr"), np.abs(diff) * 10)

print(f"case {args.case}: rmse full={rmse_full:.5f} masked={rmse_mask:.5f}")
print(f"mean signed error RGB: {diff[valid].mean(0)}")

h, w = diff.shape[:2]
print("\n-- signed mean error, 8x8 region grid (luma, x1000) --")
gh, gw = h // 8, w // 8
for gy in range(8):
    row = []
    for gx in range(8):
        d = diff[gy * gh:(gy + 1) * gh, gx * gw:(gx + 1) * gw]
        m = wm_mask[gy * gh:(gy + 1) * gh, gx * gw:(gx + 1) * gw]
        v = d[~m].mean() if (~m).any() else 0.0
        row.append(f"{v * 1000:+7.1f}")
    print(" ".join(row))

print("\n-- rms error, 8x8 region grid (x1000) --")
for gy in range(8):
    row = []
    for gx in range(8):
        d = diff[gy * gh:(gy + 1) * gh, gx * gw:(gx + 1) * gw]
        m = wm_mask[gy * gh:(gy + 1) * gh, gx * gw:(gx + 1) * gw]
        v = np.sqrt((d[~m] ** 2).mean()) if (~m).any() else 0.0
        row.append(f"{v * 1000:7.1f}")
    print(" ".join(row))

print("\n-- ref luminance bands: mean signed err / rms err / pixel count --")
luma = ref @ np.array([0.2126, 0.7152, 0.0722], np.float32)
bands = [(0, .05), (.05, .15), (.15, .3), (.3, .5), (.5, .75), (.75, 1.), (1., 99.)]
for lo, hi in bands:
    sel = (luma >= lo) & (luma < hi) & valid
    if sel.sum() == 0:
        continue
    d = diff[sel]
    print(f"  [{lo:4.2f},{hi:4.2f}) n={sel.sum():6d}  "
          f"mean={d.mean():+.4f}  rgb=({d.mean(0)[0]:+.4f},{d.mean(0)[1]:+.4f},"
          f"{d.mean(0)[2]:+.4f})  rms={np.sqrt((d**2).mean()):.4f}")
