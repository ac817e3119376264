"""Standalone trace-kernel benchmark: nearest + occluded on real testsuite
geometry with (a) coherent camera rays and (b) incoherent cosine rays.

Usage: python tools/bench_trace.py [case] [--rays N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--rays", type=int, default=73728)
p.add_argument("--platform", default=None)
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.scene import build as buildmod

case_dir = f"/root/reference/testsuite/mtoa/{args.case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)
n = args.rays

key = jax.random.PRNGKey(0)
aa = 1
while 256 * 256 * aa * aa < n:
    aa += 1
rays = cammod.generate(scene.camera, key, aa, xres=256, yres=256)
o = jnp.asarray(rays.origin[:n])
d = jnp.asarray(rays.direction[:n])

# incoherent set: cosine hemisphere dirs from the camera-hit points
hit = tracemod.nearest(accel, scene.geometry, o, d, vis_mask=1)
t = np.asarray(hit.t)
ok = np.asarray(hit.tri) >= 0
po = np.asarray(o) + np.asarray(d) * t[:, None]
u = jax.random.uniform(key, (n, 2))
z = jnp.sqrt(1.0 - u[:, 0])
r = jnp.sqrt(u[:, 0])
phi = 2 * np.pi * u[:, 1]
d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
o2 = jnp.asarray(po) + 1e-3 * d2


def bench(tag, fn):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)  # host fetch
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:28s} {n/dt/1e6:8.2f} Mrays/s   ({dt*1e3:.1f} ms)",
          flush=True)


tmax = jnp.full((n,), 1e30)
bench("nearest/coherent", lambda: tracemod.nearest(
    accel, scene.geometry, o, d, vis_mask=1))
bench("nearest/incoherent", lambda: tracemod.nearest(
    accel, scene.geometry, o2, d2, vis_mask=0xFF))
bench("occluded/coherent", lambda: tracemod.occluded(
    accel, scene.geometry, o, d, tmax, vis_mask=0xFF))
bench("occluded/incoherent", lambda: tracemod.occluded(
    accel, scene.geometry, o2, d2, tmax, vis_mask=0xFF))
print(f"tris={scene.geometry.v0.shape[0]}")
