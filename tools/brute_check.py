"""Estimator validation: independent brute-force patch estimates vs the
wavefront renderer on a DETEXTURED copy of a testsuite scene.

Splits the fidelity residual decisively: if brute == wavefront but both
differ from the golden, the gap is Arnold-host semantics; if brute !=
wavefront, the wavefront estimator itself is biased.

The brute estimator is straight-line code sharing only the scene tables,
camera ray generator and BSDF evals with the renderer — no wavefront
machinery, no MIS (pure NEE for quads + cosine family for sky/GI, which is
unbiased because lights are not scene geometry here):

    L = f_cos-NEE(quads) + E_cos[ sky | 1-bounce( NEE(quads) + sky-NEE ) ]

Usage: python tools/brute_check.py 0004 --paths 256 [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--paths", type=int, default=256, help="paths per pixel")
p.add_argument("--platform", default="cpu")
p.add_argument("--skip-wavefront", action="store_true")
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize forces the TPU plugin whenever this is set,
    # ignoring JAX_PLATFORMS
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize registers its PJRT plugin at python startup;
    # the config update wins as long as no backend has initialized yet
    jax.config.update("jax_platforms", "cpu")

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.bsdf import disney, orennayar
from rlshaders_tpu.core.vec3 import v3
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod

case_dir = f"/root/reference/testsuite/mtoa/{args.case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)

# ---- detexture: constant colors only, so brute needs no texture sampling
mats = scene.materials
M = np.asarray(mats.kd).shape[0]
neg1 = jnp.full((M,), -1, jnp.int32)
zero = jnp.zeros((M,), jnp.int32)
mats = mats._replace(
    kd_tex=neg1, ks_tex=neg1, bump_tex=neg1,
    kd_proj=zero, ks_proj=zero, bump_proj=zero,
    bump_height=jnp.zeros((M,)),
)
from dataclasses import replace as dc_replace  # noqa: E402
scene = dc_replace(scene, materials=mats)
accel = tracemod.build(scene.geometry)

names = list(scene.material_names)
print("materials:", names, flush=True)

# ---- wavefront render of the detextured scene
wf_path = f"out/brute_wf_{args.case}.npy"
if args.skip_wavefront and os.path.exists(wf_path):
    wf = np.load(wf_path)
else:
    out = wavefront.render(scene, accel, seed=0, aa_samples=3,
                           tile_pixels=8192)
    wf = np.asarray(out["RGBA"], np.float32)
    np.save(wf_path, wf)
    print("wavefront render done", flush=True)

# ---- pick patches: largest uniform-material 8x8 squares
matid = np.load(f"out/matid_{args.case}.npy")
H = matid.shape[0]
patches = {}
for mid in sorted(set(matid.ravel())):
    if mid < 0:
        continue
    nm = names[mid] if 0 <= mid < len(names) else str(mid)
    best = None
    for y in range(8, H - 16, 4):
        for x in range(8, H - 16, 4):
            blk = matid[y:y + 8, x:x + 8]
            if np.all(blk == mid):
                c = abs(y - H // 2) + abs(x - H // 2)
                if best is None or c < best[0]:
                    best = (c, y, x)
    if best:
        patches[nm] = (best[1], best[2])
print("patches:", patches, flush=True)

# ---- brute estimator ---------------------------------------------------
g = scene.geometry
mat_np = {f: np.asarray(getattr(scene.materials, f))
          for f in scene.materials._fields}
qv = np.asarray(scene.quad_lights.verts)     # (L, 4, 3)
qn = np.asarray(scene.quad_lights.normal)    # (L, 3)
qa = np.asarray(scene.quad_lights.area)      # (L,)
qr = np.asarray(scene.quad_lights.radiance)  # (L, 3)
qvalid = np.asarray(scene.quad_lights.valid)
sky_rad = np.asarray(scene.sky.radiance) if scene.sky.exists else np.zeros(3)
VIS_SHADOW = buildmod.VIS_SHADOW
VIS_DIFFUSE = 4  # AI_RAY_DIFFUSE bit position per build.py visibility packing
EPS = 1e-3

rng_np = np.random.default_rng(7)


def frame(n):
    """Arbitrary ONB about n: (t, b, n), vectorized."""
    a = np.where(np.abs(n[:, 2:3]) < 0.9, np.array([[0.0, 0.0, 1.0]]),
                 np.array([[1.0, 0.0, 0.0]]))
    t = np.cross(a, n)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    b = np.cross(n, t)
    return t, b


def to_local(t, b, n, w):
    return np.stack([(w * t).sum(1), (w * b).sum(1), (w * n).sum(1)], 1)


def occluded_np(o, d, tmax):
    return np.asarray(tracemod.occluded(
        accel, g, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(tmax, jnp.float32), vis_mask=VIS_SHADOW))


def nearest_np(o, d, vis):
    h = tracemod.nearest(accel, g, jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32), vis_mask=vis)
    return (np.asarray(h.t), np.asarray(h.tri),
            np.asarray(h.u), np.asarray(h.v))


def f_cos_local(mid_arr, wo_l, wi_l):
    """f*cos for the diffuse lobe of material rows mid_arr (N,)."""
    n = mid_arr.shape[0]
    mt = mat_np["mtype"][mid_arr]
    kd_color = mat_np["kd_color"][mid_arr] * mat_np["kd"][mid_arr][:, None]
    out = np.zeros((n, 3), np.float32)
    # Disney
    from rlshaders_tpu.models.dispatch import MAT_DISNEY
    is_d = mt == MAT_DISNEY
    if is_d.any():
        pr = disney.make_params(
            base_color=v3(jnp.asarray(mat_np["kd_color"][mid_arr[is_d]])),
            roughness=jnp.asarray(mat_np["spec_roughness"][mid_arr[is_d]]),
            metallic=jnp.asarray(mat_np["metallic"][mid_arr[is_d]]),
            specular=jnp.asarray(mat_np["specular"][mid_arr[is_d]]),
            specular_tint=jnp.asarray(mat_np["specular_tint"][mid_arr[is_d]]),
            anisotropic=jnp.asarray(mat_np["spec_aniso"][mid_arr[is_d]]),
            sheen=jnp.asarray(mat_np["sheen"][mid_arr[is_d]]),
            sheen_tint=jnp.asarray(mat_np["sheen_tint"][mid_arr[is_d]]),
            clearcoat=jnp.asarray(mat_np["clearcoat"][mid_arr[is_d]]),
            clearcoat_gloss=jnp.asarray(
                mat_np["clearcoat_gloss"][mid_arr[is_d]]),
            subsurface=jnp.asarray(mat_np["subsurface"][mid_arr[is_d]]),
        )
        fc = disney.eval_diffuse_cos(
            pr, v3(jnp.asarray(wo_l[is_d])), v3(jnp.asarray(wi_l[is_d])))
        out[is_d] = np.asarray(fc.aos())
    # standard / others: Oren-Nayar (sigma = diffuse_roughness mapping)
    st = ~is_d
    if st.any():
        on = orennayar.make_params(
            jnp.asarray(mat_np["diffuse_roughness"][mid_arr[st]]))
        fc = orennayar.eval_brdf(
            on, v3(jnp.asarray(wo_l[st])), v3(jnp.asarray(wi_l[st])))
        out[st] = kd_color[st] * np.asarray(fc)[:, None]
    return out


def direct_quads(p, ns, wo, mid_arr, nl=4):
    """NEE over every quad light: area sampling, pdf 1/area."""
    n = p.shape[0]
    t, b = frame(ns)
    acc = np.zeros((n, 3), np.float32)
    for li in range(qv.shape[0]):
        if not qvalid[li]:
            continue
        v0, v1, v2, v3_ = qv[li]
        e1, e2 = v1 - v0, v3_ - v0
        for _ in range(nl):
            u1 = rng_np.random(n).astype(np.float32)
            u2 = rng_np.random(n).astype(np.float32)
            lp = v0[None] + u1[:, None] * e1[None] + u2[:, None] * e2[None]
            tov = lp - p
            d2 = np.maximum((tov * tov).sum(1), 1e-12)
            dist = np.sqrt(d2)
            wi = tov / dist[:, None]
            cos_l = np.abs((wi * qn[li][None]).sum(1))
            cos_s = (wi * ns).sum(1)
            ok = cos_s > 0
            wi_l = to_local(t, b, ns, wi)
            wo_l = to_local(t, b, ns, wo)
            fc = f_cos_local(mid_arr, wo_l, wi_l)
            geom = cos_l / d2 * qa[li]
            sh = occluded_np(p + wi * EPS, wi, dist - 2 * EPS)
            w = np.where(ok & ~sh, geom, 0.0)
            acc += fc * (qr[li][None] * w[:, None]) / nl
    return acc


def run_patch(nm, yx, n_paths):
    y0, x0 = yx
    pix = np.array([(y, x) for y in range(y0, y0 + 8)
                    for x in range(x0, x0 + 8)])
    total = np.zeros((len(pix), 3), np.float64)
    rounds = n_paths
    for r in range(rounds):
        key = jax.random.PRNGKey(1000 + r)
        rays = cammod.generate(scene.camera, key, 1, xres=256, yres=256)
        flat = pix[:, 0] * 256 + pix[:, 1]
        o = np.asarray(rays.origin)[flat]
        d = np.asarray(rays.direction)[flat]
        t, tri, u, v = nearest_np(o, d, 1)
        hit = tri >= 0
        tri_c = np.maximum(tri, 0)
        p = o + d * t[:, None]
        w_ = 1.0 - u - v
        n0 = np.asarray(g.n0)[tri_c]
        n1 = np.asarray(g.n1)[tri_c]
        n2 = np.asarray(g.n2)[tri_c]
        ns = w_[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
        ns /= np.maximum(np.linalg.norm(ns, axis=1, keepdims=True), 1e-12)
        wo = -d
        flip = (ns * wo).sum(1) < 0
        ns[flip] = -ns[flip]
        mid_arr = np.asarray(g.mat_id)[tri_c]

        lsum = direct_quads(p, ns, wo, mid_arr, nl=2)

        # cosine family: sky pickup + 1-bounce GI
        t_, b_ = frame(ns)
        u1 = rng_np.random(len(pix)).astype(np.float32)
        u2 = rng_np.random(len(pix)).astype(np.float32)
        rr = np.sqrt(u1)
        ph = 2 * np.pi * u2
        wl = np.stack([rr * np.cos(ph), rr * np.sin(ph),
                       np.sqrt(np.maximum(1 - u1, 0.0))], 1)
        wi = wl[:, 0:1] * t_ + wl[:, 1:2] * b_ + wl[:, 2:3] * ns
        wo_l = to_local(t_, b_, ns, wo)
        fc = f_cos_local(mid_arr, wo_l, wl)
        pdf = np.maximum(wl[:, 2], 1e-6) / np.pi
        t2, tri2, uu2, vv2 = nearest_np(p + wi * EPS, wi, 0xFF)
        miss = tri2 < 0
        contrib = np.zeros((len(pix), 3), np.float32)
        contrib[miss] = sky_rad[None]
        h2 = ~miss
        if h2.any():
            tri2c = np.maximum(tri2[h2], 0)
            p2 = (p + wi * EPS)[h2] + wi[h2] * t2[h2][:, None]
            w2 = 1.0 - uu2[h2] - vv2[h2]
            ns2 = (w2[:, None] * np.asarray(g.n0)[tri2c]
                   + uu2[h2][:, None] * np.asarray(g.n1)[tri2c]
                   + vv2[h2][:, None] * np.asarray(g.n2)[tri2c])
            ns2 /= np.maximum(np.linalg.norm(ns2, axis=1, keepdims=True),
                              1e-12)
            wo2 = -wi[h2]
            flip2 = (ns2 * wo2).sum(1) < 0
            ns2[flip2] = -ns2[flip2]
            mid2 = np.asarray(g.mat_id)[tri2c]
            l2 = direct_quads(p2, ns2, wo2, mid2, nl=2)
            # sky NEE at the bounce: cosine sample again
            t2_, b2_ = frame(ns2)
            v1_ = rng_np.random(h2.sum()).astype(np.float32)
            v2_ = rng_np.random(h2.sum()).astype(np.float32)
            rr2 = np.sqrt(v1_)
            ph2 = 2 * np.pi * v2_
            wl2 = np.stack([rr2 * np.cos(ph2), rr2 * np.sin(ph2),
                            np.sqrt(np.maximum(1 - v1_, 0.0))], 1)
            wis = wl2[:, 0:1] * t2_ + wl2[:, 1:2] * b2_ + wl2[:, 2:3] * ns2
            ts, tris, _, _ = nearest_np(p2 + wis * EPS, wis, 0xFF)
            sky_vis = tris < 0
            wo2_l = to_local(t2_, b2_, ns2, wo2)
            fc2 = f_cos_local(mid2, wo2_l, wl2)
            pdf2 = np.maximum(wl2[:, 2], 1e-6) / np.pi
            lsky2 = np.where(sky_vis[:, None], sky_rad[None], 0.0)
            out2 = l2 + fc2 * lsky2 / pdf2[:, None]
            contrib[h2] = out2
        lsum += fc * contrib / pdf[:, None]
        lsum[~hit] = sky_rad[None] if scene.sky.visible_to_camera else 0.0
        total += lsum
    mean = (total / rounds).reshape(8, 8, 3)
    wf_patch = wf[y0:y0 + 8, x0:x0 + 8]
    print(f"{nm:26s} brute {mean.mean((0, 1)).round(4)}  "
          f"wavefront {wf_patch.mean((0, 1)).round(4)}  "
          f"ratio {(wf_patch.mean((0, 1)) / np.maximum(mean.mean((0, 1)), 1e-9)).round(4)}",
          flush=True)


for nm, yx in patches.items():
    run_patch(nm, yx, args.paths)
