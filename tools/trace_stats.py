"""Trace-kernel work profile: per-block walk iterations and pair-test counts
(RLS_TRACE_STATS=1 instrumentation in ops/intersect_pallas.py) on real
testsuite geometry, for coherent camera rays and incoherent cosine rays.

Usage: python tools/trace_stats.py [case] [--rays N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["RLS_TRACE_STATS"] = "1"

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--rays", type=int, default=73728)
args = p.parse_args()

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.ops import intersect_pallas as ip
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

hit = tracemod.nearest(accel, scene.geometry, o, d, vis_mask=1)
t = np.asarray(hit.t)
po = np.asarray(o) + np.asarray(d) * t[:, None]
u = jax.random.uniform(key, (n, 2))
z = jnp.sqrt(1.0 - u[:, 0])
r = jnp.sqrt(u[:, 0])
phi = 2 * np.pi * u[:, 1]
d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
o2 = jnp.asarray(po) + 1e-3 * d2

C = accel.packed.n_clusters
print(f"tris={scene.geometry.v0.shape[0]} clusters={C} "
      f"TRI_BLOCK={ip.TRI_BLOCK} RAY_BLOCK={ip.RAY_BLOCK}")


def stats(tag, oo, dd, vm):
    tt, tri, su, sv = ip.intersect(accel.packed, oo, dd, vis_mask=vm)
    # with RLS_TRACE_STATS=1, u carries the block's iteration count and v the
    # pair-test count; values are per-lane copies of the block scalar
    it = np.asarray(su)[::ip.RAY_BLOCK]
    pc = np.asarray(sv)[::ip.RAY_BLOCK]
    # NB: the per-lane copies got unsorted back to caller order, so per-lane
    # stats (not per-block) are what we read; use full arrays instead
    it = np.asarray(su)
    pc = np.asarray(sv)
    print(f"{tag:22s} iters/blk mean {it.mean():7.1f} p50 "
          f"{np.percentile(it, 50):6.0f} p95 {np.percentile(it, 95):6.0f} "
          f"max {it.max():6.0f} | pairtests mean {pc.mean():7.1f} "
          f"p95 {np.percentile(pc, 95):6.0f} (of {C})")


stats("nearest/coherent", o, d, 1)
stats("nearest/incoherent", o2, d2, 0xFF)
