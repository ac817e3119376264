"""Stage-isolated nearest-query decomposition with SCALAR-reduced outputs
(the tunnel fetch costs ~35 ms latency + ~10 MB/s bandwidth — any timing
that returns a big array to host measures the tunnel, not the chip).

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
args = p.parse_args()

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

t_max0 = jnp.full((n,), 1e30)
exclude0 = jnp.full((n,), -1, jnp.int32)
c = packed.n_clusters


def prep(o, d, t_max, exclude):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max, exclude = t_max[perm], exclude[perm]
    t_max = jnp.minimum(t_max, ip._scene_exit_t(packed, o, d))
    rays, ex, r0, rp = ip._pad_rays(o, d, t_max, exclude)
    meta, cand, cproj = ip._block_meta(packed, rays, c)
    return rays, ex, meta, cand, cproj


# Every bench fn returns ONE f32 scalar: the tunnel charges ~33 ms latency
# PER FETCHED OUTPUT, so multi-output returns inflated the earlier numbers
# (prep with 5 outputs measured ~112 ms of pure fetch latency).
@jax.jit
def j_sort(o, d):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    return o[perm].sum() + d[perm].sum()


@jax.jit
def j_null(o):
    return o[0, 0] + 1.0


@jax.jit
def j_survive(rays):
    # the chunked per-ray slab OR-reduce only (no sort/compact)
    nb = rays.shape[0]
    cmin = packed.cl_min[:c]
    cmax = packed.cl_max[:c]

    def chunk_survive(rchunk):
        oc = rchunk[:, 0:3, :]
        dc = rchunk[:, 3:6, :]
        tmx = rchunk[:, 6, :]
        inv = ip._inv(dc)
        tn = None
        tf = None
        for a in range(3):
            t0 = (cmin[None, None, :, a] - oc[:, a, :, None]) * inv[:, a, :, None]
            t1 = (cmax[None, None, :, a] - oc[:, a, :, None]) * inv[:, a, :, None]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        ok = ((tf >= jnp.maximum(tn, 0.0))
              & (tn <= tmx[:, :, None]) & (tmx[:, :, None] > 0.0))
        return jnp.any(ok, axis=1)

    gpad = (-nb) % ip.META_CHUNK
    rpad = jnp.pad(rays, ((0, gpad), (0, 0), (0, 0)))
    groups = rpad.reshape(-1, ip.META_CHUNK, 7, ip.RAY_BLOCK)
    survive = jax.lax.map(chunk_survive, groups).reshape(-1, c)[:nb]
    return survive.sum()


@jax.jit
def j_compact(survive_f, oct_id):
    # the sort/compact stage only, fed a precomputed survive mask
    survive = survive_f > 0.5
    projc = packed.oct_projid[oct_id]
    keyf = jnp.where(survive, projc, ip.BIG)
    ids = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :], keyf.shape)
    cproj, cand = jax.lax.sort((keyf, ids), dimension=1, num_keys=1)
    return cand.sum().astype(jnp.float32) + cproj.sum()


@jax.jit
def j_prep(o, d, t_max, exclude):
    rays, ex, meta, cand, cproj = prep(o, d, t_max, exclude)
    return (rays.sum() + ex.sum().astype(jnp.float32) + meta.sum()
            + cand.sum().astype(jnp.float32) + cproj.sum())


def run_pallas(rays, ex, meta, cand, cproj):
    n_blocks = rays.shape[0]
    cp = cand.shape[1]
    kernel = partial(ip._nearest_kernel, n_clusters=c, t_eps=1e-4)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 7, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ip.RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, ip.RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, ip.RAY_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, ip.RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, ip.RAY_BLOCK), jnp.float32),
        ],
        interpret=ip._interpret(),
    )(
        jnp.full((1, 1), 0xFF, jnp.int32), cand, cproj, meta, rays, ex,
        packed.comp, packed.vis, packed.orig,
    )


@jax.jit
def j_walk(rays, ex, meta, cand, cproj):
    t, tri, u, v = run_pallas(rays, ex, meta, cand, cproj)
    return t.sum() + tri.sum().astype(jnp.float32)


@jax.jit
def j_full(o, d, t_max, exclude):
    t, tri, u, v = ip._intersect(packed, o, d, t_max, exclude,
                                 vis_mask=0xFF, t_eps=1e-4)
    return (t.sum() + tri.sum().astype(jnp.float32) + u.sum() + v.sum())


@jax.jit
def j_full_occ(o, d, t_max, exclude):
    b = ip._occluded(packed, o, d, t_max, exclude, vis_mask=0xFF, t_eps=1e-4)
    return b.sum().astype(jnp.float32)


def bench(tag, fn, reps=8):
    out = fn()
    jax.tree_util.tree_map(np.asarray, out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:28s} {best*1e3:8.1f} ms   ({n/best/1e6:.2f} Mrays/s)",
          flush=True)


print(f"knobs: RAY_BLOCK={ip.RAY_BLOCK} TRI_BLOCK={ip.TRI_BLOCK} "
      f"UNROLL={ip.UNROLL} META_CHUNK={ip.META_CHUNK} clusters={c}",
      flush=True)
bench("null (latency floor)", partial(j_null, o))
for tag, oo, dd in (("coh", o, d), ("inc", o2, d2)):
    rays_, ex_, meta, cand, cproj = jax.tree_util.tree_map(
        jnp.asarray, prep(oo, dd, t_max0, exclude0))
    nb_ = rays_.shape[0]
    d_sum = np.asarray(rays_[:, 3:6, :]).sum(axis=2)
    bits = (d_sum > 0.0).astype(np.int32)
    oct_id_ = jnp.asarray(bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2])
    surv_f = jnp.asarray(
        (np.random.RandomState(0).rand(nb_, c) < 0.15).astype(np.float32))
    bench(f"{tag}/survive only", partial(j_survive, rays_))
    bench(f"{tag}/compact(sort) only", partial(j_compact, surv_f, oct_id_))
    bench(f"{tag}/sort+gather", partial(j_sort, oo, dd))
    bench(f"{tag}/prep(sort+meta+cand)", partial(j_prep, oo, dd, t_max0, exclude0))
    bench(f"{tag}/pallas walk only", partial(j_walk, rays_, ex_, meta, cand, cproj))
    bench(f"{tag}/full nearest", partial(j_full, oo, dd, t_max0, exclude0))
    bench(f"{tag}/full occluded", partial(j_full_occ, oo, dd, t_max0, exclude0))
    cnt = np.asarray(meta[:, 0])
    print(f"  blocks={meta.shape[0]} mean_cand={cnt.mean():.1f} "
          f"p90={np.percentile(cnt,90):.0f} max={cnt.max():.0f}", flush=True)
