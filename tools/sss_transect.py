"""EXACT-convolution oracle for the skin diffusion-decay case (0010).

On a FLAT single plane the BSSRDF estimator's expectation reduces to the
2D convolution

    exitance(x) = albedo * \\int_{|x'-x| < rmax} E(x') R(|x'-x|) dA'

with E the quad-light irradiance (computable by dense numeric integration,
no MC noise) and R the truncated Burley profile — every probe-march detail
(axis MIS, chain length, termination) drops out on flat geometry. Comparing

    exact    (this tool, numeric integration)
    golden   (testsuite/mtoa/0010/ref/ref.exr)
    ours     (out/conv_0010.exr, the 48-pass converged render)

along a transect through the slab decides WHO is wrong about the measured
dim-tail deficit (ours -61%% relative vs golden at lum 0.005-0.02,
docs/fidelity.md round-3).

Usage: python tools/sss_transect.py [--case 0010] [--row r0 r1 ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--case", default="0010")
p.add_argument("--grid", type=int, default=8, help="sqrt points per tri")
p.add_argument("--lgrid", type=int, default=24, help="sqrt points per light")
p.add_argument("--ours", default=None)
args = p.parse_args()

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax

jax.config.update("jax_platforms", "cpu")

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod

case_dir = f"/root/reference/testsuite/mtoa/{args.case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
g = scene.geometry
accel = tracemod.build(g)

vis = np.asarray(g.visibility)
real = ~((vis == 0) & (np.abs(np.asarray(g.e1)).max(1) == 0)
         & (np.abs(np.asarray(g.e2)).max(1) == 0))
v0 = np.asarray(g.v0)[real]
e1 = np.asarray(g.e1)[real]
e2 = np.asarray(g.e2)[real]
n0 = np.asarray(g.n0)[real]
T = v0.shape[0]
print(f"{T} real tris", flush=True)

mats = scene.materials
mid0 = int(np.asarray(g.mat_id)[0])
albedo = np.asarray(mats.sss_color)[mid0] * float(
    np.asarray(mats.sss_weight)[mid0])
dist = np.asarray(mats.sss_dist)[mid0]
d = dist.astype(np.float64)
rmax = 3.0 * d.max()
print("albedo", albedo, "dist", dist, "rmax", rmax, flush=True)

# ---- area points on the slab (per-triangle barycentric grid)
q = args.grid
bu, bv = np.meshgrid(
    (np.arange(q) + 0.5) / q, (np.arange(q) + 0.5) / q, indexing="ij")
bu, bv = bu.ravel(), bv.ravel()
keep = bu + bv < 1.0
bu2, bv2 = 1.0 - bu[~keep], 1.0 - bv[~keep]  # mirror into the triangle
bu = np.concatenate([bu[keep], bu2])
bv = np.concatenate([bv[keep], bv2])
npts = bu.shape[0]
pts = (v0[:, None, :] + bu[None, :, None] * e1[:, None, :]
       + bv[None, :, None] * e2[:, None, :]).reshape(-1, 3)
tri_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
dA = np.repeat(tri_area / npts, npts)
nrm = np.repeat(n0, npts, axis=0)
nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

# ---- quad-light irradiance at every area point (dense, deterministic)
ql = scene.quad_lights
E = np.zeros((pts.shape[0], 3))
lg = args.lgrid
lu, lv = np.meshgrid(
    (np.arange(lg) + 0.5) / lg, (np.arange(lg) + 0.5) / lg, indexing="ij")
lu, lv = lu.ravel(), lv.ravel()
for li in range(np.asarray(ql.valid).shape[0]):
    if not bool(np.asarray(ql.valid)[li]):
        continue
    verts = np.asarray(ql.verts)[li]
    ln = np.asarray(ql.normal)[li]
    area = float(np.asarray(ql.area)[li])
    rad = np.asarray(ql.radiance)[li]
    le1, le2 = verts[1] - verts[0], verts[3] - verts[0]
    lp = verts[0][None] + lu[:, None] * le1[None] + lv[:, None] * le2[None]
    dAl = area / lp.shape[0]
    for i0 in range(0, pts.shape[0], 4096):
        sl = slice(i0, min(i0 + 4096, pts.shape[0]))
        tov = lp[None, :, :] - pts[sl, None, :]
        d2 = np.maximum((tov * tov).sum(-1), 1e-12)
        w = tov / np.sqrt(d2)[..., None]
        cos_s = np.maximum((w * nrm[sl, None, :]).sum(-1), 0.0)
        cos_l = np.abs((w * ln[None, None, :]).sum(-1))
        E[sl] += rad[None, :] * (
            (cos_s * cos_l / d2).sum(-1) * dAl)[:, None]
print("E range", E.min(), E.max(), flush=True)


def burley_R(r):
    rr = np.maximum(r, 1e-9)[:, None]
    return (np.exp(-rr / d[None]) + np.exp(-rr / (3 * d[None]))) / (
        8 * np.pi * d[None] * rr)


def exact_exitance(x):
    r = np.linalg.norm(pts - x[None], axis=1)
    m = r < rmax
    return (burley_R(r[m]) * E[m] * dA[m][:, None]).sum(0) * albedo


# ---- transect: center camera rays through the slab's long axis
rays = cammod.generate(scene.camera, jax.random.PRNGKey(0), 1,
                       xres=256, yres=256)
o = np.asarray(rays.origin)
dirs = np.asarray(rays.direction)
ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))
ours = exr.read_rgb(args.ours or f"out/conv_{args.case}.npy".replace(
    ".npy", ".exr"))

# find slab rows: use matid>=0 mask from a quick trace of row centers
print(f"{'pix':>9s} {'exact':>8s} {'golden':>8s} {'ours':>8s} "
      f"{'gold/ex':>8s} {'ours/ex':>8s}", flush=True)
h = tracemod.nearest(accel, g, rays.origin, rays.direction, vis_mask=1)
tri = np.asarray(h.tri).reshape(256, 256)
t = np.asarray(h.t).reshape(256, 256)
hit = tri >= 0
rows = [96, 128, 160, 190]
for y in rows:
    xs = np.where(hit[y])[0]
    if len(xs) == 0:
        continue
    for x in xs[:: max(len(xs) // 8, 1)]:
        flat = y * 256 + x
        px = o[flat] + dirs[flat] * t[y, x]
        ex = exact_exitance(px).mean()
        gv = ref[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2].mean()
        ov = ours[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2].mean()
        print(f"({y:3d},{x:3d}) {ex:8.4f} {gv:8.4f} {ov:8.4f} "
              f"{gv / max(ex, 1e-6):8.3f} {ov / max(ex, 1e-6):8.3f}",
              flush=True)
