"""Nearest-walk kernel variant lab (real TPU, real scene data).

Round-3 diagnosis (docs/perf.md + trace_decomp2): the production walk is
~0.54 us/candidate vs ~0.17 us of pure pair-test VPU work. The overhead is
LOAD BANDWIDTH from layout padding: comp slabs are (TB, 9) f32 and vis/orig
(TB, 1) int32, whose minor dims pad to 128 lanes in VMEM — every candidate
reads ~256 KB for ~6 KB useful.

Variant T ("transposed") fixes the layout: cluster geometry is stored as 16
consecutive sublane ROWS x TB tri LANES (v0/e1/e2 xyz in rows 0..8), ints as
8 rows (vis, orig, opaque), so a candidate slab load is (16+8, TB) = 12 KB
dense. The pair tile becomes (R rays-on-sublanes, TB tris-on-lanes); running
state is the FULL (R, TB) tile (min-t per slot + winner list-index), reduced
across lanes only every UNROLL candidates (t_worst refresh for the
front-to-back early break) and once at the end (winner extraction, packed
w*128+slot so slot/winner can't mix across tie lanes). Hit attributes
(orig/u/v) are recomputed OUTSIDE the kernel from the winner index with
dense gathers — the kernel only returns (t, packed winner).

Usage: python tools/kernel_lab.py [case] [--rays N] [--reps K]
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
c = packed.n_clusters
TB = ip.TRI_BLOCK
R = ip.RAY_BLOCK
UNROLL = ip.UNROLL

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


# ---------------------------------------------------------------- transposed
# storage built from the packed scene (host-side, one-time)
comp_np = np.asarray(packed.comp)            # (C*TB, 9)
geoT = np.zeros((c * 16, TB), np.float32)    # rows: 16 per cluster, 0..8 used
intT = np.zeros((c * 8, TB), np.int32)       # rows: vis, orig, opaque
for ci in range(c):
    blk = comp_np[ci * TB:(ci + 1) * TB]     # (TB, 9)
    geoT[ci * 16:ci * 16 + 9] = blk.T
    intT[ci * 8 + 0] = np.asarray(packed.vis)[ci * TB:(ci + 1) * TB, 0]
    intT[ci * 8 + 1] = np.asarray(packed.orig)[ci * TB:(ci + 1) * TB, 0]
    intT[ci * 8 + 2] = np.asarray(packed.opaque)[ci * TB:(ci + 1) * TB, 0]
geoT = jnp.asarray(geoT)
intT = jnp.asarray(intT)


def prep(o, d, t_max, exclude):
    perm = jnp.argsort(ip._ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max, exclude = t_max[perm], exclude[perm]
    t_max = jnp.minimum(t_max, ip._scene_exit_t(packed, o, d))
    rays, ex, r0, rp = ip._pad_rays(o, d, t_max, exclude)
    meta, cand, cproj = ip._block_meta(packed, rays, c)
    return rays, ex, meta, cand, cproj


def rays_transposed(rays, ex):
    """(nb, 7, R) + (nb, 1, R) -> (nb, R, 8) with col 7 = bitcast exclude."""
    nb = rays.shape[0]
    rT = jnp.swapaxes(rays, 1, 2)                        # (nb, R, 7)
    exf = jax.lax.bitcast_convert_type(ex, jnp.float32)  # (nb, 1, R)
    return jnp.concatenate([rT, jnp.swapaxes(exf, 1, 2)], axis=2)


def _tmath_kernel(
    vismask_ref,  # (1, 1) SMEM int32
    cand_ref,     # (8, Cp) SMEM int32
    cproj_ref,    # (8, Cp) SMEM f32
    meta_ref,     # (8, 128) SMEM f32
    raysT_ref,    # (1, R, 8) VMEM f32 (col 7 = bitcast exclude)
    geo_ref,      # (C*16, TB) VMEM f32
    int_ref,      # (C*8, TB) VMEM int32
    t_out,        # (1, 1, R) f32  — best t per ray
    w_out,        # (1, 1, R) int32 — packed winner: list_index*TB + slot, -1 miss
    *,
    t_eps: float,
):
    ox = raysT_ref[0, :, 0:1]
    oy = raysT_ref[0, :, 1:2]
    oz = raysT_ref[0, :, 2:3]
    dx = raysT_ref[0, :, 3:4]
    dy = raysT_ref[0, :, 4:5]
    dz = raysT_ref[0, :, 5:6]
    tmax = raysT_ref[0, :, 6:7]                      # (R, 1)
    exclude = pltpu.bitcast(raysT_ref[0, :, 7:8], jnp.int32)
    vism = vismask_ref[0, 0]

    row = pl.program_id(0) % 8
    bound = meta_ref[row, 0].astype(jnp.int32)
    pure = meta_ref[row, 2] > 0.5
    proj_o = meta_ref[row, 3]
    cap = cproj_ref.shape[1] - 1

    t0 = jnp.minimum(tmax, ip.BIG)                   # (R, 1)
    t_tile0 = jnp.broadcast_to(t0, (R, TB))

    def cond(state):
        li, t_tile, w_tile, t_worst = state
        more = li < bound
        not_past = jnp.logical_or(
            jnp.logical_not(pure),
            cproj_ref[row, jnp.minimum(li, cap)] - proj_o < t_worst,
        )
        return jnp.logical_and(more, not_past)

    def pair_test(li_k, ci, t_tile, w_tile):
        g = geo_ref[pl.ds(ci * 16, 16), :]           # (16, TB)
        it = int_ref[pl.ds(ci * 8, 8), :]            # (8, TB)
        v0x, v0y, v0z = g[0:1, :], g[1:2, :], g[2:3, :]
        e1x, e1y, e1z = g[3:4, :], g[4:5, :], g[5:6, :]
        e2x, e2y, e2z = g[6:7, :], g[7:8, :], g[8:9, :]
        vis, orig = it[0:1, :], it[1:2, :]
        # Moller-Trumbore, (R, TB) pair tile
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        uu = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > t_eps)
            & ((vis & vism) != 0)
            & (orig != exclude)
        )
        tm = jnp.where(ok, tt, ip.BIG)
        better = tm < t_tile
        t_tile = jnp.where(better, tm, t_tile)
        w_tile = jnp.where(better, li_k, w_tile)
        return t_tile, w_tile

    def cluster_step(state):
        li, t_tile, w_tile, t_worst = state
        for k in range(UNROLL):
            ci = cand_ref[row, jnp.minimum(li + k, cap)]
            t_tile, w_tile = pair_test(li + k, ci, t_tile, w_tile)
        # t_worst refresh once per UNROLL candidates (lane-reduce amortized)
        t_worst = jnp.max(jnp.min(t_tile, axis=1))
        return li + UNROLL, t_tile, w_tile, t_worst

    init = (
        jnp.int32(0),
        t_tile0,
        jnp.full((R, TB), -1, jnp.int32),
        jnp.max(t0),
    )
    _, t_tile, w_tile, _ = jax.lax.while_loop(cond, cluster_step, init)

    t_best = jnp.min(t_tile, axis=1, keepdims=True)          # (R, 1)
    sel = (t_tile <= t_best) & (w_tile >= 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (R, TB), 1)
    packed_w = jnp.max(jnp.where(sel, w_tile * TB + slot, -1), axis=1,
                       keepdims=True)                        # (R, 1)
    t_out[0] = t_best.reshape(1, R)
    w_out[0] = packed_w.reshape(1, R)


def run_tmath(raysT, meta, cand, cproj):
    nb = raysT.shape[0]
    cp = cand.shape[1]
    kernel = partial(_tmath_kernel, t_eps=1e-4)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, R), jnp.int32),
        ],
        interpret=ip._interpret(),
    )(
        jnp.full((1, 1), 0xFF, jnp.int32), cand, cproj, meta, raysT,
        geoT, intT,
    )


def fixup(t, w, cand, rays):
    """Recover (tri, u, v) from packed winners with dense gathers + one
    re-evaluated MT per ray."""
    nb, _, _ = t.shape
    tf = t.reshape(-1)
    wf = w.reshape(-1)
    block = jnp.arange(tf.shape[0], dtype=jnp.int32) // R
    li = jnp.maximum(wf // TB, 0)
    slot = jnp.maximum(wf % TB, 0)
    ci = cand[block, li]
    pidx = ci * TB + slot                              # packed tri index
    # ONE row gather + channel slices (the texel-tap lesson, docs/perf.md):
    # the first fixup draft did 10 two-level gathers and cost +75 ms alone
    crow = packed.comp[pidx]                           # (M, 9) row gather
    comps = [crow[:, k] for k in range(9)]
    orig = packed.orig[pidx, 0]
    ox = rays[:, 0, :].reshape(-1)
    oy = rays[:, 1, :].reshape(-1)
    oz = rays[:, 2, :].reshape(-1)
    dx = rays[:, 3, :].reshape(-1)
    dy = rays[:, 4, :].reshape(-1)
    dz = rays[:, 5, :].reshape(-1)
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = comps
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    uu = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv
    miss = wf < 0
    return (jnp.where(miss, -1, orig),
            jnp.where(miss, 0.0, uu), jnp.where(miss, 0.0, vv))


# ------------------------------------------------------------------ variants
def run_v0(rays, ex, meta, cand, cproj):
    nb = rays.shape[0]
    cp = cand.shape[1]
    kernel = partial(ip._nearest_kernel, n_clusters=c, t_eps=1e-4)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 7, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, R), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, R), jnp.float32),
        ],
        interpret=ip._interpret(),
    )(
        jnp.full((1, 1), 0xFF, jnp.int32), cand, cproj, meta, rays, ex,
        packed.comp, packed.vis, packed.orig,
    )


@jax.jit
def j_v0(rays, ex, meta, cand, cproj):
    t, tri, u, v = run_v0(rays, ex, meta, cand, cproj)
    return t.sum() + tri.sum().astype(jnp.float32)


@jax.jit
def j_t_kernel_only(raysT, meta, cand, cproj):
    t, w = run_tmath(raysT, meta, cand, cproj)
    return t.sum() + w.sum().astype(jnp.float32)


@jax.jit
def j_t_full(raysT, rays, meta, cand, cproj):
    t, w = run_tmath(raysT, meta, cand, cproj)
    tri, uu, vv = fixup(t, w, cand, rays)
    return (t.sum() + tri.sum().astype(jnp.float32) + uu.sum() + vv.sum())


def bench(tag, fn, reps):
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


print(f"knobs: R={R} TB={TB} UNROLL={UNROLL} clusters={c}", flush=True)
for tag, oo, dd in (("coh", o, d), ("inc", o2, d2)):
    rays_, ex_, meta, cand, cproj = jax.tree_util.tree_map(
        jnp.asarray, prep(oo, dd, t_max0, exclude0))
    raysT_ = jax.jit(rays_transposed)(rays_, ex_)

    # correctness: transposed variant must agree with production
    t0_, tri0, u0, v0_ = [np.asarray(x) for x in
                          run_v0(rays_, ex_, meta, cand, cproj)]
    tT, wT = run_tmath(raysT_, meta, cand, cproj)
    triT, uT, vT = jax.jit(fixup)(tT, wT, cand, rays_)
    tT, triT, uT, vT = [np.asarray(x) for x in (tT, triT, uT, vT)]
    hit0 = tri0.reshape(-1) >= 0
    hitT = np.asarray(triT) >= 0
    agree = (hit0 == hitT).mean()
    tdiff = np.abs(t0_.reshape(-1)[hit0 & hitT] - tT.reshape(-1)[hit0 & hitT])
    same_tri = (tri0.reshape(-1)[hit0 & hitT] == triT[hit0 & hitT]).mean()
    print(f"{tag}: hit agree {agree:.6f}  max|dt| "
          f"{tdiff.max() if tdiff.size else 0:.2e}  same tri {same_tri:.6f}",
          flush=True)

    cnt = np.asarray(meta[:, 0])
    print(f"  blocks={meta.shape[0]} mean_cand={cnt.mean():.1f} "
          f"p90={np.percentile(cnt, 90):.0f} max={cnt.max():.0f}", flush=True)
    bench(f"{tag}/v0 production walk", partial(j_v0, rays_, ex_, meta, cand, cproj), args.reps)
    bench(f"{tag}/T kernel only", partial(j_t_kernel_only, raysT_, meta, cand, cproj), args.reps)
    bench(f"{tag}/T kernel+fixup", partial(j_t_full, raysT_, rays_, meta, cand, cproj), args.reps)
print("done", flush=True)
