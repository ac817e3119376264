"""Per-material error segmentation for a testsuite case.

Traces one center ray per pixel to get a material-id map, then reports
signed mean / RMSE of (test - ref) per material.  Usage:
    python tools/matseg.py 0004 [test.npy|test.exr]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import rlshaders_tpu  # noqa: F401, E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rlshaders_tpu.accel import trace as tracemod  # noqa: E402
from rlshaders_tpu.integrator import camera as cammod  # noqa: E402
from rlshaders_tpu.io import exr  # noqa: E402
from rlshaders_tpu.scene import build as buildmod  # noqa: E402
from rlshaders_tpu.utils.watermark import watermark_mask  # noqa: E402

case = sys.argv[1]
test_path = sys.argv[2] if len(sys.argv) > 2 else None

case_dir = f"/root/reference/testsuite/mtoa/{case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)

ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))
if test_path is None:
    test_path = f"out/conv_{case}.npy"
test = np.load(test_path) if test_path.endswith(".npy") else exr.read_rgb(test_path)

xres = yres = ref.shape[0]
rays = cammod.generate(scene.camera, jax.random.PRNGKey(0), 1,
                       xres=xres, yres=yres)
hit = tracemod.nearest(accel, scene.geometry, rays.origin, rays.direction,
                       vis_mask=1)
tri = np.asarray(hit.tri)
matid = np.where(tri >= 0, np.asarray(scene.geometry.mat_id)[np.maximum(tri, 0)], -1)
matid = matid.reshape(yres, xres)
np.save(f"out/matid_{case}.npy", matid)

wm = watermark_mask("/root/reference/testsuite")
valid = ~wm if (wm is not None and wm.shape == ref.shape[:2]) else np.ones(ref.shape[:2], bool)
d = test - ref
names = list(getattr(scene, "material_names", []))
print(f"{'material':28s} {'n':>7s} {'meanR':>8s} {'meanG':>8s} {'meanB':>8s} {'rmse':>8s} {'refluma':>8s}")
tot = 0.0
for mid in sorted(set(matid.ravel())):
    m = (matid == mid) & valid
    if m.sum() == 0:
        continue
    nm = names[mid] if 0 <= mid < len(names) else ("<miss>" if mid < 0 else str(mid))
    mm = d[m].mean(0)
    r = float(np.sqrt((d[m] ** 2).mean()))
    print(f"{nm[:28]:28s} {m.sum():7d} {mm[0]:+8.4f} {mm[1]:+8.4f} {mm[2]:+8.4f} {r:8.4f} {ref[m].mean():8.4f}")
    tot += (d[m] ** 2).sum()
print(f"total rmse {np.sqrt((d[valid]**2).mean()):.5f}")
