"""Mid-res converged-lite TPU canary gate (VERDICT r4 #4).

Renders all 10 testsuite cases at 128x128 (AA 2, a few passes), compares
against the box-downsampled golden with the watermark mask, and FAILS
(exit 1) if any case's masked RMSE exceeds its gate. Gates are set from a
calibration run (tools/tpu_canary_bounds.json, --calibrate rewrites it) at
min(2x measured, measured + 0.008): tight enough that a +0.01 RMSE
regression fails, loose enough that pass-to-pass MC jitter does not.

Downsampling note: comparing our 128 render against a box-downsampled 256
golden halves the golden's own MC noise contribution, so the 128-tier
floors sit BELOW the full-res ones — which is what makes this tier more
bias-sensitive per unit chip time than a full-res fast render.

Usage:
  python tools/tpu_canary.py                # gate (driver/CI mode)
  python tools/tpu_canary.py --calibrate    # measure + write bounds
  python tools/tpu_canary.py --cases 0004,0009 --passes 4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--cases", default="0001,0002,0003,0004,0005,0006,0007,"
                                  "0008,0009,0010")
p.add_argument("--passes", type=int, default=4)
p.add_argument("--calibrate", action="store_true")
p.add_argument("--platform", default=None)
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
    if args.platform == "cpu":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

import rlshaders_tpu  # noqa: F401

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.utils import watermark

SUITE = "/root/reference/testsuite"
BOUNDS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tpu_canary_bounds.json")
RES = 128


def downsample2(img):
    h, w = img.shape[:2]
    return img[: h // 2 * 2, : w // 2 * 2].reshape(
        h // 2, 2, w // 2, 2, -1).mean((1, 3)).squeeze()


def run_case(case):
    case_dir = os.path.join(SUITE, "mtoa", case)
    data = os.path.join(case_dir, "data")
    scene_path = os.path.join(
        data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
    scene = buildmod.build(scene_path)
    accel = tracemod.build(scene.geometry)
    ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))
    wm = watermark.pinned_mask()
    ref2 = downsample2(ref)
    wm2 = downsample2(wm.astype(np.float32)[..., None]) > 0.0
    acc = None
    t0 = time.time()
    for s in range(args.passes):
        out = wavefront.render(scene, accel, seed=4000 + s, aa_samples=2,
                               xres=RES, yres=RES, tile_pixels=8192)
        img = np.asarray(out["RGBA"], np.float32)
        acc = img if acc is None else acc + img
    img = acc / args.passes
    d = (img - ref2)[~wm2]
    rmse = float(np.sqrt((d ** 2).mean()))
    return rmse, time.time() - t0


def main():
    bounds = {}
    if os.path.exists(BOUNDS_PATH):
        with open(BOUNDS_PATH) as f:
            bounds = json.load(f)
    measured = {}
    failed = []
    for case in args.cases.split(","):
        rmse, dt = run_case(case)
        measured[case] = round(rmse, 5)
        gate = bounds.get(case)
        if gate is not None and not args.calibrate:
            ok = rmse <= gate
            if not ok:
                failed.append(case)
            print(f"{case}: rmse {rmse:.5f} gate {gate:.5f} "
                  f"{'OK' if ok else 'FAIL'} ({dt:.0f}s)", flush=True)
        else:
            print(f"{case}: rmse {rmse:.5f} (no gate) ({dt:.0f}s)",
                  flush=True)
    if args.calibrate:
        gates = {c: round(min(2 * v, v + 0.008), 5)
                 for c, v in measured.items()}
        merged = dict(bounds)
        merged.update(gates)
        with open(BOUNDS_PATH, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote gates to {BOUNDS_PATH}: {gates}")
        return 0
    if failed:
        print(f"CANARY FAIL: {failed}")
        return 1
    print("canary OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
