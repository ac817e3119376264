"""Per-emitter estimator isolation on the DETEXTURED testsuite scene.

Renders the scene with exactly one emitter alive (each quad light, then the
skydome) and compares per-material patch means against an independent
brute-force NEE estimate of the same patches — localizing wavefront
estimator bias to a specific light/geometry configuration.

Two phases (separate processes — JAX platform is fixed per process):
  python tools/isolate_light.py 0004 --render            # TPU: save npys
  python tools/isolate_light.py 0004 --brute --paths 96  # CPU: compare
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--render", action="store_true")
p.add_argument("--brute", action="store_true")
p.add_argument("--paths", type=int, default=96)
p.add_argument("--only", default=None, help="run a single variant tag (quad0/quad1/quad2/skyonly)")
p.add_argument("--platform", default=None)
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
if args.brute and not args.platform:
    os.environ["JAX_PLATFORMS"] = "cpu"
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize forces the TPU plugin whenever this is set,
    # ignoring JAX_PLATFORMS
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from dataclasses import replace as dc_replace  # noqa: E402

import numpy as np  # noqa: E402

import rlshaders_tpu  # noqa: F401, E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize registers its PJRT plugin at python startup;
    # the config update wins as long as no backend has initialized yet
    jax.config.update("jax_platforms", "cpu")

from rlshaders_tpu.accel import trace as tracemod  # noqa: E402
from rlshaders_tpu.scene import build as buildmod  # noqa: E402

case = args.case
case_dir = f"/root/reference/testsuite/mtoa/{case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])


def detextured():
    scene = buildmod.build(scene_path)
    mats = scene.materials
    M = np.asarray(mats.kd).shape[0]
    neg1 = jnp.full((M,), -1, jnp.int32)
    zero = jnp.zeros((M,), jnp.int32)
    mats = mats._replace(
        kd_tex=neg1, ks_tex=neg1, bump_tex=neg1,
        kd_proj=zero, ks_proj=zero, bump_proj=zero,
        bump_height=jnp.zeros((M,)),
    )
    return dc_replace(scene, materials=mats)


def variants(scene):
    """(tag, scene) for each single-emitter configuration."""
    nq = np.asarray(scene.quad_lights.radiance).shape[0]
    out = []
    for li in range(nq):
        if not bool(np.asarray(scene.quad_lights.valid)[li]):
            continue
        mask = np.zeros((nq, 1), np.float32)
        mask[li] = 1.0
        sc = dc_replace(
            scene,
            quad_lights=scene.quad_lights._replace(
                radiance=scene.quad_lights.radiance * jnp.asarray(mask)),
            sky=scene.sky._replace(radiance=scene.sky.radiance * 0.0),
        )
        out.append((f"quad{li}", sc))
    sc = dc_replace(
        scene,
        quad_lights=scene.quad_lights._replace(
            radiance=scene.quad_lights.radiance * 0.0),
    )
    out.append(("skyonly", sc))
    return out


if args.render:
    from rlshaders_tpu.integrator import wavefront
    import time
    scene = detextured()
    accel = tracemod.build(scene.geometry)
    for tag, sc in variants(scene):
        t0 = time.time()
        out = wavefront.render(sc, accel, seed=0, aa_samples=3,
                               tile_pixels=8192)
        img = np.asarray(out["RGBA"], np.float32)
        np.save(f"out/iso_{tag}_{case}.npy", img)
        print(f"[{tag}] {time.time()-t0:.0f}s mean {img.mean():.4f}",
              flush=True)
    sys.exit(0)

# ---- brute phase ---------------------------------------------------------
import importlib.util  # noqa: E402

# reuse brute_check's estimator by importing it with rendering disabled is
# messy; inline a light-subset variant instead.
from rlshaders_tpu.bsdf import disney, orennayar  # noqa: E402
from rlshaders_tpu.core.vec3 import v3  # noqa: E402
from rlshaders_tpu.integrator import camera as cammod  # noqa: E402

scene0 = detextured()
accel = tracemod.build(scene0.geometry)
g = scene0.geometry
names = list(scene0.material_names)
matid = np.load(f"out/matid_{case}.npy")
H = matid.shape[0]
patches = {}
for mid in sorted(set(matid.ravel())):
    if mid < 0:
        continue
    nm = names[mid] if 0 <= mid < len(names) else str(mid)
    best = None
    for y in range(8, H - 16, 4):
        for x in range(8, H - 16, 4):
            if np.all(matid[y:y + 8, x:x + 8] == mid):
                c = abs(y - H // 2) + abs(x - H // 2)
                if best is None or c < best[0]:
                    best = (c, y, x)
    if best:
        patches[nm] = (best[1], best[2])

mat_np = {f: np.asarray(getattr(scene0.materials, f))
          for f in scene0.materials._fields}
VIS_SHADOW = buildmod.VIS_SHADOW
EPS = 1e-3
rng_np = np.random.default_rng(11)


def frame(n):
    a = np.where(np.abs(n[:, 2:3]) < 0.9, np.array([[0.0, 0.0, 1.0]]),
                 np.array([[1.0, 0.0, 0.0]]))
    t = np.cross(a, n)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    return t, np.cross(n, t)


def to_local(t, b, n, w):
    return np.stack([(w * t).sum(1), (w * b).sum(1), (w * n).sum(1)], 1)


def occluded_np(o, d, tmax, extri=None):
    ex = None if extri is None else jnp.asarray(extri, jnp.int32)
    return np.asarray(tracemod.occluded(
        accel, g, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(tmax, jnp.float32), vis_mask=VIS_SHADOW,
        exclude_tri=ex))


def nearest_np(o, d, vis):
    h = tracemod.nearest(accel, g, jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32), vis_mask=vis)
    return (np.asarray(h.t), np.asarray(h.tri),
            np.asarray(h.u), np.asarray(h.v))


def f_cos_local(mid_arr, wo_l, wi_l):
    n = mid_arr.shape[0]
    mt = mat_np["mtype"][mid_arr]
    kd_color = mat_np["kd_color"][mid_arr] * mat_np["kd"][mid_arr][:, None]
    out = np.zeros((n, 3), np.float32)
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
    st = ~is_d
    if st.any():
        on = orennayar.make_params(
            jnp.asarray(mat_np["diffuse_roughness"][mid_arr[st]]))
        fc = orennayar.eval_brdf(
            on, v3(jnp.asarray(wo_l[st])), v3(jnp.asarray(wi_l[st])))
        out[st] = kd_color[st] * np.asarray(fc)[:, None]
    return out


def direct_quads(sc, p, ns, wo, mid_arr, nl=2, extri=None):
    qv = np.asarray(sc.quad_lights.verts)
    qn = np.asarray(sc.quad_lights.normal)
    qa = np.asarray(sc.quad_lights.area)
    qr = np.asarray(sc.quad_lights.radiance)
    qvalid = np.asarray(sc.quad_lights.valid)
    n = p.shape[0]
    t, b = frame(ns)
    acc = np.zeros((n, 3), np.float32)
    for li in range(qv.shape[0]):
        if not qvalid[li] or qr[li].max() <= 0:
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
            sh = occluded_np(p + wi * EPS, wi, dist - 2 * EPS, extri)
            w = np.where(ok & ~sh, geom, 0.0)
            acc += fc * (qr[li][None] * w[:, None]) / nl
    return acc


def run_patch(sc, sky_rad, yx, n_paths):
    y0, x0 = yx
    pix = np.array([(y, x) for y in range(y0, y0 + 8)
                    for x in range(x0, x0 + 8)])
    total = np.zeros((len(pix), 3), np.float64)
    for r in range(n_paths):
        key = jax.random.PRNGKey(4000 + r)
        rays = cammod.generate(sc.camera, key, 1, xres=256, yres=256)
        flat = pix[:, 0] * 256 + pix[:, 1]
        o = np.asarray(rays.origin)[flat]
        d = np.asarray(rays.direction)[flat]
        t, tri, u, v = nearest_np(o, d, 1)
        tri_c = np.maximum(tri, 0)
        p = o + d * t[:, None]
        w_ = 1.0 - u - v
        ns = (w_[:, None] * np.asarray(g.n0)[tri_c]
              + u[:, None] * np.asarray(g.n1)[tri_c]
              + v[:, None] * np.asarray(g.n2)[tri_c])
        ns /= np.maximum(np.linalg.norm(ns, axis=1, keepdims=True), 1e-12)
        wo = -d
        flip = (ns * wo).sum(1) < 0
        ns[flip] = -ns[flip]
        mid_arr = np.asarray(g.mat_id)[tri_c]

        lsum = direct_quads(sc, p, ns, wo, mid_arr, nl=2,
                            extri=np.maximum(tri, -1))

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
            l2 = direct_quads(sc, p2, ns2, wo2, mid2, nl=2,
                              extri=np.maximum(tri2[h2], -1))
            t2_, b2_ = frame(ns2)
            v1_ = rng_np.random(int(h2.sum())).astype(np.float32)
            v2_ = rng_np.random(int(h2.sum())).astype(np.float32)
            rr2 = np.sqrt(v1_)
            ph2 = 2 * np.pi * v2_
            wl2 = np.stack([rr2 * np.cos(ph2), rr2 * np.sin(ph2),
                            np.sqrt(np.maximum(1 - v1_, 0.0))], 1)
            wis = (wl2[:, 0:1] * t2_ + wl2[:, 1:2] * b2_
                   + wl2[:, 2:3] * ns2)
            ts, tris, _, _ = nearest_np(p2 + wis * EPS, wis, 0xFF)
            wo2_l = to_local(t2_, b2_, ns2, wo2)
            fc2 = f_cos_local(mid2, wo2_l, wl2)
            lsky2 = np.where((tris < 0)[:, None], sky_rad[None], 0.0)
            contrib[h2] = l2 + fc2 * lsky2 / np.maximum(
                wl2[:, 2:3] / np.pi, 1e-6)
        lsum += fc * contrib / pdf[:, None]
        total += lsum
    return (total / n_paths).reshape(8, 8, 3)


scene = detextured()
for tag, sc in variants(scene):
    if args.only and tag != args.only:
        continue
    wfp = f"out/iso_{tag}_{case}.npy"
    if not os.path.exists(wfp):
        print(f"[{tag}] missing {wfp} — run --render first")
        continue
    wf = np.load(wfp)
    sky_rad = (np.asarray(sc.sky.radiance)
               if sc.sky.exists else np.zeros(3))
    print(f"== {tag} ==", flush=True)
    for nm, yx in patches.items():
        mean = run_patch(sc, sky_rad, yx, args.paths)
        wfm = wf[yx[0]:yx[0] + 8, yx[1]:yx[1] + 8].mean((0, 1))
        bm = mean.mean((0, 1))
        print(f"  {nm:24s} brute {bm.round(4)}  wf {wfm.round(4)}  "
              f"ratio {(wfm / np.maximum(bm, 1e-6)).round(4)}", flush=True)
