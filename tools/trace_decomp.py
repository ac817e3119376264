"""Decompose nearest-query time: ray-sort + block-meta prepass vs the Pallas
walk, and the per-iteration cost curve (bound clamped to K clusters).

Usage: python tools/trace_decomp.py [case] [--rays N]
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
packed = accel.packed
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

t_max = jnp.full((n,), 1e30)
exclude = jnp.full((n,), -1, jnp.int32)


@jax.jit
def prepass_only(o, d, t_max, exclude):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max, exclude = t_max[perm], exclude[perm]
    t_max = jnp.minimum(t_max, ip._scene_exit_t(packed, o, d))
    rays, ex, r0, rp = ip._pad_rays(o, d, t_max, exclude)
    meta, cand, cproj = ip._block_meta(packed, rays, packed.n_clusters)
    return meta.sum(), cand.sum(), cproj.sum(), perm.sum()


@jax.jit
def sort_only(o, d):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    inv = jnp.argsort(perm)
    return perm.sum() + inv.sum()


def bench(tag, fn):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:32s} {dt*1e3:8.1f} ms   ({n/dt/1e6:.2f} Mrays/s)",
          flush=True)


for tag, oo, dd in (("coh", o, d), ("inc", o2, d2)):
    bench(f"{tag}/sorts-only(2x argsort)", partial(sort_only, oo, dd))
    bench(f"{tag}/prepass(sort+meta+cand)",
          partial(prepass_only, oo, dd, t_max, exclude))
    bench(f"{tag}/full nearest", lambda oo=oo, dd=dd: ip.intersect(
        packed, oo, dd, vis_mask=0xFF))
    bench(f"{tag}/full occluded", lambda oo=oo, dd=dd: ip.occluded(
        packed, oo, dd, t_max, vis_mask=0xFF))
