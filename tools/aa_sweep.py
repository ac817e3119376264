"""AA-escalation convergence study: masked RMSE vs sampling budget.

Renders a testsuite case at increasing AA (the light/GI budgets scale with
AA^2 alongside) and reports masked RMSE vs the golden plus a bias/noise
split — extrapolating the converged floor: RMSE^2 ~= bias^2 + c/AA^2 +
golden_noise^2. If the floor sits above the 0.005 gate, the remaining work
is bias; if below, it is sampling budget (and frame time).

Usage: python tools/aa_sweep.py 0004 --aa 3 6 9 [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--aa", type=int, nargs="+", default=[3, 6])
p.add_argument("--platform", default=None)
p.add_argument("--seeds", type=int, default=1,
               help="extra seeds at the lowest AA for a noise estimate")
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
if os.environ.get("JAX_PLATFORMS") == "cpu":
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

case_dir = f"/root/reference/testsuite/mtoa/{args.case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)
ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))
wm = watermark_mask("/root/reference/testsuite")
valid = ~wm if (wm is not None and wm.shape == ref.shape[:2]) else np.ones(
    ref.shape[:2], bool)


def score(img):
    d = img - ref
    return float(np.sqrt((d[valid] ** 2).mean())), d[valid].mean()


imgs = {}
for aa in args.aa:
    t0 = time.time()
    out = wavefront.render(scene, accel, seed=0, aa_samples=aa,
                           tile_pixels=8192)
    img = np.asarray(out["RGBA"], np.float32)
    imgs[aa] = img
    np.save(f"out/aasweep_{args.case}_aa{aa}.npy", img)
    rmse, bias = score(img)
    print(f"aa={aa:2d}: masked rmse {rmse:.5f}  mean bias {bias:+.5f}  "
          f"({time.time()-t0:.0f}s)", flush=True)

aa0 = args.aa[0]
for s in range(1, args.seeds + 1):
    out = wavefront.render(scene, accel, seed=100 + s, aa_samples=aa0,
                           tile_pixels=8192)
    img2 = np.asarray(out["RGBA"], np.float32)
    d = (img2 - imgs[aa0])[valid]
    print(f"seed noise at aa={aa0}: render-to-render rms "
          f"{np.sqrt((d**2).mean()):.5f} (per-image ~/sqrt2)", flush=True)

if len(args.aa) >= 2:
    a1, a2 = args.aa[0], args.aa[-1]
    r1, _ = score(imgs[a1])
    r2, _ = score(imgs[a2])
    # rmse^2 = floor^2 + c/aa^2
    n1, n2 = 1.0 / a1**2, 1.0 / a2**2
    c = (r1**2 - r2**2) / max(n1 - n2, 1e-12)
    floor2 = r2**2 - c * n2
    print(f"extrapolated converged floor: "
          f"{np.sqrt(max(floor2, 0.0)):.5f} (gate 0.005)")
