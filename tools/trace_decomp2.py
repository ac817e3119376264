"""Stage-isolated trace-query decomposition on the real TPU.

Two measurement rules learned the hard way (docs/perf.md):
  * the tunnel charges ~30 ms latency PER FETCHED OUTPUT — every probe
    returns ONE scalar and the null probe measures the floor;
  * plain `.sum()` checksums are DCE-bait (the sum of a gathered/sorted
    array folds back to the source's sum) — probes reduce with an
    INDEX-WEIGHTED dot so element order is pinned.

Usage: python tools/trace_decomp2.py [case] [--rays N]
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--rays", type=int, default=262144)
p.add_argument("--reps", type=int, default=8)
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
c = packed.n_clusters

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
r_ = jnp.sqrt(u[:, 0])
phi = 2 * np.pi * u[:, 1]
d2 = jnp.stack([r_ * jnp.cos(phi), r_ * jnp.sin(phi), z], -1)
o2 = jnp.asarray(po) + 1e-3 * d2

t_max0 = jnp.full((n,), 1e30)
exclude0 = jnp.full((n,), -1, jnp.int32)
W = jnp.asarray(np.random.RandomState(1).rand(n).astype(np.float32))


def ck(x, w=None):
    xf = x.astype(jnp.float32).reshape(-1)
    if w is None or w.shape[0] != xf.shape[0]:
        w = jax.lax.iota(jnp.float32, xf.shape[0]) * 1e-6 + 1.0
    return (xf * w).sum()


def prep(o, d, t_max, exclude):
    perm, ox, oy, oz, dx, dy, dz, tmx, ex = ip._sort_rays(
        packed, o, d, t_max, exclude)
    tmx = jnp.minimum(tmx, ip._scene_exit_t(packed, ox, oy, oz, dx, dy, dz))
    rays8, r0, rp = ip._pad_rays8(ox, oy, oz, dx, dy, dz, tmx, ex)
    meta, cand, cproj = ip._block_meta(packed, rays8, c)
    return perm, rays8, meta, cand, cproj


@jax.jit
def j_null(o):
    return o[0, 0] + 1.0


@jax.jit
def j_sort(o, d, t_max, exclude):
    out = ip._sort_rays(packed, o, d, t_max, exclude)
    return sum(ck(x, W) for x in out)


@jax.jit
def j_prep(o, d, t_max, exclude):
    perm, rays8, meta, cand, cproj = prep(o, d, t_max, exclude)
    return ck(perm, W) + ck(rays8) + ck(meta) + ck(cand) + ck(cproj)


@jax.jit
def j_walk(rays8, meta, cand, cproj):
    nb = rays8.shape[0]
    cp = cand.shape[1]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    kernel = partial(ip._nearest_kernel, t_eps=1e-4)
    t, tri, uu, vv = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ip.RAY_BLOCK, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, ip.RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, ip.RAY_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, ip.RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, ip.RAY_BLOCK), jnp.float32),
        ],
        interpret=ip._interpret(),
    )(
        jnp.full((1, 1), 0xFF, jnp.int32), cand, cproj, meta, rays8,
        packed.geoT, packed.intT,
    )
    return ck(t) + ck(tri) + ck(uu) + ck(vv)


@jax.jit
def j_full(o, d, t_max, exclude):
    t, tri, uu, vv = ip._intersect(packed, o, d, t_max, exclude,
                                   vis_mask=0xFF, t_eps=1e-4)
    return ck(t, W) + ck(tri, W) + ck(uu, W) + ck(vv, W)


@jax.jit
def j_full_occ(o, d, t_max, exclude):
    b = ip._occluded(packed, o, d, t_max, exclude, vis_mask=0xFF, t_eps=1e-4)
    return ck(b, W)


def bench(tag, fn, reps=args.reps):
    out = fn()
    np.asarray(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:28s} {best*1e3:8.1f} ms   ({n/best/1e6:.2f} Mrays/s)",
          flush=True)


print(f"knobs: RAY_BLOCK={ip.RAY_BLOCK} TRI_BLOCK={ip.TRI_BLOCK} "
      f"UNROLL={ip.UNROLL} META_CHUNK={ip.META_CHUNK} clusters={c}",
      flush=True)
bench("null (latency floor)", partial(j_null, o))
for tag, oo, dd in (("coh", o, d), ("inc", o2, d2)):
    perm_, rays8_, meta, cand, cproj = jax.tree_util.tree_map(
        jnp.asarray, prep(oo, dd, t_max0, exclude0))
    bench(f"{tag}/sort (10-operand)", partial(j_sort, oo, dd, t_max0, exclude0))
    bench(f"{tag}/prep all", partial(j_prep, oo, dd, t_max0, exclude0))
    bench(f"{tag}/pallas walk only", partial(j_walk, rays8_, meta, cand, cproj))
    bench(f"{tag}/full nearest", partial(j_full, oo, dd, t_max0, exclude0))
    bench(f"{tag}/full occluded", partial(j_full_occ, oo, dd, t_max0, exclude0))
    cnt = np.asarray(meta[:, 0])
    print(f"  blocks={meta.shape[0]} mean_cand={cnt.mean():.1f} "
          f"p90={np.percentile(cnt,90):.0f} max={cnt.max():.0f}", flush=True)
print("done", flush=True)
