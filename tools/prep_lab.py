"""Prep/epilogue stage decomposition with DCE-PROOF weighted checksums.

trace_decomp2's scalar `.sum()` probes were foldable: the sum of a gathered
array equals the sum of its source, and the sum of a permutation of iota is
a constant — XLA deleted the very stages being timed. Every probe here
reduces with an INDEX-WEIGHTED dot against a random vector, which pins the
order of elements and defeats algebraic folding.

Also A/Bs the known alternatives:
  * inverse permutation: argsort(perm) vs scatter(iota)
  * ray reorder: argsort+gather vs one multi-operand lax.sort
  * epilogue un-permute: gather-by-inverse vs scatter-by-perm

Usage: python tools/prep_lab.py [case] [--rays N] [--reps K]
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
    """DCE-proof checksum: index-weighted dot."""
    xf = x.astype(jnp.float32).reshape(-1)
    if w is None or w.shape[0] != xf.shape[0]:
        w = jax.lax.iota(jnp.float32, xf.shape[0]) * 1e-6 + 1.0
    return (xf * w).sum()


@jax.jit
def j_null(o):
    return o[0, 0] + 1.0


@jax.jit
def j_key(o, d):
    return ck(ip._ray_sort_key(packed, o, d), W)


@jax.jit
def j_argsort(o, d):
    return ck(jnp.argsort(ip._ray_sort_key(packed, o, d)), W)


@jax.jit
def j_sort_gather(o, d, t_max, exclude):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    return (ck(o[perm], W) + ck(d[perm], W) + ck(t_max[perm], W)
            + ck(exclude[perm], W))


@jax.jit
def j_sort_multiop(o, d, t_max, exclude):
    # one 9-operand lax.sort instead of argsort + 4 gathers
    k = ip._ray_sort_key(packed, o, d)
    ops = (k, jnp.arange(n, dtype=jnp.int32), o[:, 0], o[:, 1], o[:, 2],
           d[:, 0], d[:, 1], d[:, 2], t_max,
           exclude.astype(jnp.float32))
    out = jax.lax.sort(ops, num_keys=1)
    return sum(ck(x, W) for x in out[1:])


@jax.jit
def j_pad(o, d, t_max, exclude):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max, exclude = t_max[perm], exclude[perm]
    t_max = jnp.minimum(t_max, ip._scene_exit_t(packed, o, d))
    rays, ex, r0, rp = ip._pad_rays(o, d, t_max, exclude)
    return ck(rays) + ck(ex)


@jax.jit
def j_meta(rays):
    meta, cand, cproj = ip._block_meta(packed, rays, c)
    return ck(meta) + ck(cand) + ck(cproj)


@jax.jit
def j_meta_nosort(rays):
    # survive + octant only, no compaction sort: isolates the lax.sort cost
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
    return ck(survive)


@jax.jit
def j_prep_all(o, d, t_max, exclude):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max, exclude = t_max[perm], exclude[perm]
    t_max = jnp.minimum(t_max, ip._scene_exit_t(packed, o, d))
    rays, ex, r0, rp = ip._pad_rays(o, d, t_max, exclude)
    meta, cand, cproj = ip._block_meta(packed, rays, c)
    return ck(rays) + ck(ex) + ck(meta) + ck(cand) + ck(cproj)


@jax.jit
def j_inv_argsort(perm):
    return ck(jnp.argsort(perm), W)


@jax.jit
def j_inv_scatter(perm):
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return ck(inv, W)


@jax.jit
def j_epi_gather(perm, tk, trik, uk, vk, t_max):
    # production epilogue: inverse argsort + 4 gathers + miss fixup
    inv = jnp.argsort(perm)
    flat = lambda a: a.reshape(-1)[:n][inv]
    t, tri, uu, vv = flat(tk), flat(trik), flat(uk), flat(vk)
    t = jnp.where(tri >= 0, t, jnp.minimum(t_max, ip.BIG))
    return ck(t, W) + ck(tri, W) + ck(uu, W) + ck(vv, W)


@jax.jit
def j_epi_scatter(perm, tk, trik, uk, vk, t_max):
    # scatter-by-perm instead of gather-by-inverse (no second sort)
    def unperm(a):
        return jnp.zeros((n,), a.dtype).at[perm].set(a.reshape(-1)[:n])
    t, tri = unperm(tk), unperm(trik)
    uu, vv = unperm(uk), unperm(vk)
    t = jnp.where(tri >= 0, t, jnp.minimum(t_max, ip.BIG))
    return ck(t, W) + ck(tri, W) + ck(uu, W) + ck(vv, W)


@jax.jit
def j_full(o, d, t_max, exclude):
    t, tri, uu, vv = ip._intersect(packed, o, d, t_max, exclude,
                                   vis_mask=0xFF, t_eps=1e-4)
    return ck(t, W) + ck(tri, W) + ck(uu, W) + ck(vv, W)


def bench(tag, fn, reps=args.reps):
    out = fn()
    np.asarray(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:28s} {best*1e3:8.1f} ms", flush=True)


print(f"n={n} clusters={c}", flush=True)
bench("null (latency floor)", partial(j_null, o))
for tag, oo, dd in (("coh", o, d), ("inc", o2, d2)):
    # fixed inputs for the epilogue probes
    perm_ = jnp.argsort(ip._ray_sort_key(packed, oo, dd))
    os_, ds_ = oo[perm_], dd[perm_]
    tm_ = jnp.minimum(t_max0[perm_], ip._scene_exit_t(packed, os_, ds_))
    rays_, ex_, r0, rp = ip._pad_rays(os_, ds_, tm_, exclude0[perm_])
    nb_ = rays_.shape[0]
    tk = jnp.asarray(np.random.RandomState(2).rand(nb_, 1, ip.RAY_BLOCK)
                     .astype(np.float32))
    trik = jnp.asarray(np.random.RandomState(3).randint(
        -1, 1000, (nb_, 1, ip.RAY_BLOCK)).astype(np.int32))
    rays_, ex_, perm_, tk, trik = jax.tree_util.tree_map(
        jnp.asarray, (rays_, ex_, perm_, tk, trik))

    bench(f"{tag}/key only", partial(j_key, oo, dd))
    bench(f"{tag}/argsort", partial(j_argsort, oo, dd))
    bench(f"{tag}/argsort+4 gathers", partial(j_sort_gather, oo, dd, t_max0, exclude0))
    bench(f"{tag}/9-operand sort", partial(j_sort_multiop, oo, dd, t_max0, exclude0))
    bench(f"{tag}/..+exit+pad", partial(j_pad, oo, dd, t_max0, exclude0))
    bench(f"{tag}/meta survive only", partial(j_meta_nosort, rays_))
    bench(f"{tag}/meta+compact", partial(j_meta, rays_))
    bench(f"{tag}/prep ALL", partial(j_prep_all, oo, dd, t_max0, exclude0))
    bench(f"{tag}/inv: argsort", partial(j_inv_argsort, perm_))
    bench(f"{tag}/inv: scatter", partial(j_inv_scatter, perm_))
    bench(f"{tag}/epilogue gather", partial(j_epi_gather, perm_, tk, trik, tk, tk, t_max0))
    bench(f"{tag}/epilogue scatter", partial(j_epi_scatter, perm_, tk, trik, tk, tk, t_max0))
    bench(f"{tag}/FULL nearest", partial(j_full, oo, dd, t_max0, exclude0))
print("done", flush=True)
