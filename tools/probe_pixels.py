"""Pixel probe: trace center rays at chosen pixels and print the full direct-
lighting breakdown at the hit (surface attrs, per-light geometry/occlusion/
Oren-Nayar response). CPU-friendly (tiny batches, no fused render program).

Usage: python tools/probe_pixels.py 0004 52,131 54,140 100,150
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.core import vec3
from rlshaders_tpu.core.vec3 import v3
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod

case = sys.argv[1]
pix = [tuple(int(x) for x in a.split(",")) for a in sys.argv[2:]]

case_dir = f"/root/reference/testsuite/mtoa/{case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)
ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))

xres = yres = ref.shape[0]
rays = cammod.generate(scene.camera, jax.random.PRNGKey(0), 1,
                      xres=xres, yres=yres)
idx = np.array([y * xres + x for (y, x) in pix])
o = np.asarray(rays.origin)[idx]
d = np.asarray(rays.direction)[idx]
t, tri, u, v = [np.asarray(a) for a in tracemod.nearest(
    accel, scene.geometry, jnp.asarray(o), jnp.asarray(d), vis_mask=1)]

g = scene.geometry
p = o + d * t[:, None]
n0 = np.asarray(g.n0)[tri]
n1 = np.asarray(g.n1)[tri]
n2 = np.asarray(g.n2)[tri]
ns = (1 - u - v)[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
matid = np.asarray(g.mat_id)[tri]

ql = scene.quad_lights
qverts = np.asarray(ql.verts)       # (L, 4, 3)
qrad = np.asarray(ql.radiance)
qnorm = np.asarray(ql.normal)

print(f"{'pix':>10s} {'mat':>4s} {'t':>7s}  N               ref_rgb        ours(see render)")
for i, (y, x) in enumerate(pix):
    print(f"({y:3d},{x:3d}) {matid[i]:4d} {t[i]:7.3f}  "
          f"[{ns[i][0]:+.2f} {ns[i][1]:+.2f} {ns[i][2]:+.2f}]  "
          f"ref={ref[y, x].round(3)}")
    # per-light: centroid direction, cos_i, occlusion of Nc=16 samples
    for li in range(qverts.shape[0]):
        c = qverts[li].mean(0)
        wi = c - p[i]
        dist = np.linalg.norm(wi)
        wi /= dist
        cos_i = float((wi * ns[i]).sum())
        # occlusion over a 4x4 grid on the quad
        us, vs_ = np.meshgrid(np.linspace(.1, .9, 4), np.linspace(.1, .9, 4))
        pts = (qverts[li][0][None] + (qverts[li][1] - qverts[li][0])[None] *
               us.ravel()[:, None] + (qverts[li][3] - qverts[li][0])[None] *
               vs_.ravel()[:, None])
        wo_s = pts - p[i][None]
        dd = np.linalg.norm(wo_s, axis=-1)
        wo_s /= dd[:, None]
        occ = np.asarray(tracemod.occluded(
            accel, scene.geometry,
            jnp.asarray(np.repeat(p[i][None], 16, 0) + wo_s * 1e-3),
            jnp.asarray(wo_s), jnp.asarray(dd - 2e-3), vis_mask=4,
            exclude_tri=jnp.asarray(np.full(16, tri[i], np.int32))))
        vis_frac = 1.0 - occ.mean()
        print(f"    quad{li}: dist {dist:6.2f} cos_i {cos_i:+.3f} "
              f"vis {vis_frac:.2f} rad {qrad[li].round(1)}")
