"""Localize the shared-scene tone residual by component fitting.

Light transport is linear in emitted radiance (per-light sampling columns,
no power-weighted light selection), so the beauty pass decomposes exactly:

    beauty = C_quads + C_sky

rendered as (sky zeroed) and (quads zeroed) with the same seed. Fitting the
golden as  G ~= a*C_quads + b*C_sky  per material region then separates
"everything is globally X% off" (a ~= b != 1) from "the sky/quad energy
semantics are off" (a != b), which image-level bias cannot.

Usage: python tools/fit_components.py [case] [--aa N]
Writes out/comp_{quads,sky}_<case>.npy and prints the per-region fit.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--aa", type=int, default=3)
p.add_argument("--passes", type=int, default=4)
p.add_argument("--platform", default=None)
p.add_argument("--skip-render", action="store_true",
               help="reuse existing out/comp_*.npy")
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax.numpy as jnp

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.utils.watermark import watermark_mask

case = args.case
case_dir = f"/root/reference/testsuite/mtoa/{case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)
ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))

wm = watermark_mask("/root/reference/testsuite")
valid = ~wm if (wm is not None and wm.shape == ref.shape[:2]) else np.ones(
    ref.shape[:2], bool)


def render_variant(tag, scene_v):
    # passes/aa are part of the cache name so --skip-render can never mix
    # images accumulated at different sampling configs (ADVICE r4)
    path = f"out/comp_{tag}_{case}_p{args.passes}aa{args.aa}.npy"
    if args.skip_render and os.path.exists(path):
        return np.load(path)
    t0 = time.time()
    acc = None
    for s in range(args.passes):
        out = wavefront.render(scene_v, accel, seed=1000 + s,
                               aa_samples=args.aa, tile_pixels=8192)
        img = np.asarray(out["RGBA"], np.float32)
        acc = img if acc is None else acc + img
    img = acc / args.passes
    np.save(path, img)
    print(f"[{tag}] rendered {args.passes} passes in {time.time()-t0:.0f}s",
          flush=True)
    return img


from dataclasses import replace as dc_replace  # noqa: E402

sky_off = dc_replace(scene, sky=scene.sky._replace(
    radiance=scene.sky.radiance * 0.0))
quads_off = dc_replace(
    scene,
    quad_lights=scene.quad_lights._replace(
        radiance=scene.quad_lights.radiance * 0.0),
    disk_lights=scene.disk_lights._replace(
        radiance=scene.disk_lights.radiance * 0.0),
)

cq = render_variant("quads", sky_off)      # quad/disk lights only
cs = render_variant("sky", quads_off)      # skydome only

total = cq + cs
d = total - ref
print(f"\nlinearity check vs out/test_{case}.exr (if present):")
tpath = f"out/test_{case}.exr"
if os.path.exists(tpath):
    t = exr.read_rgb(tpath)
    print(f"  |quads+sky - full| mean {np.abs(total - t).mean():.5f}")
print(f"full-frame rmse of (quads+sky) vs golden: "
      f"{np.sqrt((d[valid]**2).mean()):.5f}")

midp = f"out/matid_{case}.npy"
mat = np.load(midp) if os.path.exists(midp) else None
names = list(getattr(scene, "material_names", []))


def fit(mask, label):
    q = cq[mask].ravel()
    s = cs[mask].ravel()
    g = ref[mask].ravel()
    A = np.stack([q, s], 1)
    (a, b), *_ = np.linalg.lstsq(A, g, rcond=None)
    resid = g - (a * q + b * s)
    d0 = g - (q + s)
    print(f"  {label:26s} a(quads)={a:+.4f} b(sky)={b:+.4f} "
          f"rmse {np.sqrt((d0**2).mean()):.5f} -> {np.sqrt((resid**2).mean()):.5f} "
          f"share(sky) {s.mean()/max(g.mean(),1e-9):.3f}")


print("\nper-region least-squares  golden ~= a*C_quads + b*C_sky:")
fit(valid, "ALL")
if mat is not None and mat.shape == ref.shape[:2]:
    for mid in sorted(set(mat.ravel())):
        m = (mat == mid) & valid
        if m.sum() < 100:
            continue
        nm = names[mid] if 0 <= mid < len(names) else str(mid)
        fit(m, nm)
