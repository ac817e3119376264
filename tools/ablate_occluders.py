"""Occluder-ablation ladder for the quad1->ball estimator deficit.

The detextured 0004 under quad1 only shows the ball ~14% darker in the
wavefront than the brute oracle, while minimal sphere scenes (no occluders)
close to ~1%. This renders the quad1-only scene with occluder groups
removed (visibility zeroed) so the trigger geometry can be identified:

    full / no-backdrop / no-plinth / no-floor / ball-only

Phase 1 (TPU): python tools/ablate_occluders.py 0004 --render
Phase 2 (CPU): python tools/ablate_occluders.py 0004 --brute --paths 64
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--render", action="store_true")
p.add_argument("--brute", action="store_true")
p.add_argument("--paths", type=int, default=64)
p.add_argument("--only", default=None)
args = p.parse_args()
if args.brute:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from dataclasses import replace as dc_replace  # noqa: E402

import numpy as np  # noqa: E402

import rlshaders_tpu  # noqa: F401, E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from rlshaders_tpu.accel import trace as tracemod  # noqa: E402
from rlshaders_tpu.scene import build as buildmod  # noqa: E402

case = args.case
case_dir = f"/root/reference/testsuite/mtoa/{case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])


def base_scene():
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
    scene = dc_replace(scene, materials=mats)
    nq = np.asarray(scene.quad_lights.radiance).shape[0]
    mask = np.zeros((nq, 1), np.float32)
    mask[1] = 1.0  # quad1: the warm left light
    return dc_replace(
        scene,
        quad_lights=scene.quad_lights._replace(
            radiance=scene.quad_lights.radiance * jnp.asarray(mask)),
        sky=scene.sky._replace(radiance=scene.sky.radiance * 0.0),
    )


def drop_materials(scene, names_to_drop):
    """Zero the visibility of every triangle whose material name is in
    names_to_drop (removes them from camera, shadow and GI rays alike)."""
    names = list(scene.material_names)
    ids = [names.index(n) for n in names_to_drop if n in names]
    g = scene.geometry
    vis = np.asarray(g.visibility).copy()
    matid = np.asarray(g.mat_id)
    for i in ids:
        vis[matid == i] = 0
    return dc_replace(scene, geometry=g._replace(
        visibility=jnp.asarray(vis)))


VARIANTS = [
    ("full", []),
    ("nobackdrop", ["aiStandard2SG"]),
    ("noplinth", ["aiStandard3SG"]),
    ("nofloor", ["diffusePlaneSG"]),
    ("ballonly", ["aiStandard2SG", "aiStandard3SG", "diffusePlaneSG",
                  "aiStandard1SG"]),
]

if args.render:
    import time

    from rlshaders_tpu.integrator import wavefront
    scene0 = base_scene()
    accel = tracemod.build(scene0.geometry)
    for tag, drops in VARIANTS:
        if args.only and tag != args.only:
            continue
        sc = drop_materials(scene0, drops)
        t0 = time.time()
        out = wavefront.render(sc, accel, seed=0, aa_samples=3,
                               tile_pixels=8192)
        np.save(f"out/abl_{tag}_{case}.npy",
                np.asarray(out["RGBA"], np.float32))
        print(f"[{tag}] {time.time()-t0:.0f}s", flush=True)
    sys.exit(0)

# ---- brute phase: ball patch only -----------------------------------------
from rlshaders_tpu.bsdf import disney  # noqa: E402
from rlshaders_tpu.core.vec3 import v3  # noqa: E402
from rlshaders_tpu.integrator import camera as cammod  # noqa: E402

scene0 = base_scene()
names = list(scene0.material_names)
ball_mid = names.index("testShadingGroup")
matid = np.load(f"out/matid_{case}.npy")
H = matid.shape[0]
best = None
for y in range(8, H - 16, 4):
    for x in range(8, H - 16, 4):
        if np.all(matid[y:y + 8, x:x + 8] == ball_mid):
            c = abs(y - H // 2) + abs(x - H // 2)
            if best is None or c < best[0]:
                best = (c, y, x)
_, y0, x0 = best
pix = np.array([(y, x) for y in range(y0, y0 + 8)
                for x in range(x0, x0 + 8)])
flat = pix[:, 0] * 256 + pix[:, 1]
EPS = 1e-3
VIS_SHADOW = buildmod.VIS_SHADOW
rng_np = np.random.default_rng(17)

base = np.asarray(scene0.materials.kd_color)[ball_mid]  # gamma'd base


def run_variant(tag, drops):
    sc = drop_materials(scene0, drops)
    accel = tracemod.build(sc.geometry)
    g = sc.geometry
    qv = np.asarray(sc.quad_lights.verts)[1]
    qn = np.asarray(sc.quad_lights.normal)[1]
    qa = float(np.asarray(sc.quad_lights.area)[1])
    qr = np.asarray(sc.quad_lights.radiance)[1]

    def occl(o, d, tmax, ex):
        return np.asarray(tracemod.occluded(
            accel, g, jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32), jnp.asarray(tmax, jnp.float32),
            vis_mask=VIS_SHADOW, exclude_tri=jnp.asarray(ex, jnp.int32)))

    def near(o, d, vis=0xFF):
        h = tracemod.nearest(accel, g, jnp.asarray(o, jnp.float32),
                             jnp.asarray(d, jnp.float32), vis_mask=vis)
        return (np.asarray(h.t), np.asarray(h.tri),
                np.asarray(h.u), np.asarray(h.v))

    def nrm(tri, u, v):
        tc = np.maximum(tri, 0)
        w = 1.0 - u - v
        ns = (w[:, None] * np.asarray(g.n0)[tc]
              + u[:, None] * np.asarray(g.n1)[tc]
              + v[:, None] * np.asarray(g.n2)[tc])
        return ns / np.maximum(
            np.linalg.norm(ns, axis=1, keepdims=True), 1e-12)

    def onb(ns):
        a = np.where(np.abs(ns[:, 2:3]) < 0.9,
                     np.array([[0.0, 0.0, 1.0]]), np.array([[1.0, 0.0, 0.0]]))
        t = np.cross(a, ns)
        t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
        return t, np.cross(ns, t)

    def fcos_ball(mid_arr, wo_w, wi_w, ns):
        t, b = onb(ns)
        wo_l = np.stack([(wo_w*t).sum(1), (wo_w*b).sum(1), (wo_w*ns).sum(1)], 1)
        wi_l = np.stack([(wi_w*t).sum(1), (wi_w*b).sum(1), (wi_w*ns).sum(1)], 1)
        kd = (np.asarray(scene0.materials.kd_color)[mid_arr]
              * np.asarray(scene0.materials.kd)[mid_arr][:, None])
        is_ball = mid_arr == ball_mid
        out = np.zeros((mid_arr.shape[0], 3), np.float32)
        if is_ball.any():
            pr = disney.make_params(base_color=v3(jnp.asarray(
                np.broadcast_to(base, (int(is_ball.sum()), 3)).copy())))
            fc = disney.eval_diffuse_cos(
                pr, v3(jnp.asarray(wo_l[is_ball])),
                v3(jnp.asarray(wi_l[is_ball])))
            out[is_ball] = np.asarray(fc.aos())
        rest = ~is_ball
        if rest.any():
            cos = np.maximum(wi_l[rest, 2], 0.0)
            out[rest] = kd[rest] / np.pi * cos[:, None]
        return out

    def nee(p_, ns, wo_w, mid_arr, ex, nl=2):
        e1, e2 = qv[1] - qv[0], qv[3] - qv[0]
        acc = np.zeros((p_.shape[0], 3), np.float32)
        for _ in range(nl):
            u1 = rng_np.random(p_.shape[0]).astype(np.float32)
            u2 = rng_np.random(p_.shape[0]).astype(np.float32)
            lp = qv[0][None] + u1[:, None] * e1[None] + u2[:, None] * e2[None]
            tov = lp - p_
            d2 = np.maximum((tov * tov).sum(1), 1e-12)
            dist = np.sqrt(d2)
            wi = tov / dist[:, None]
            cos_lt = -(wi * qn[None]).sum(1)
            ok = cos_lt > 1e-6
            sh = occl(p_ + wi * EPS, wi, dist - 2 * EPS, ex)
            geom = np.where(ok & ~sh, np.abs(cos_lt) / d2 * qa, 0.0)
            fc = fcos_ball(mid_arr, wo_w, wi, ns)
            acc += fc * (qr[None] * geom[:, None]) / nl
        return acc

    total = np.zeros((64, 3))
    R = args.paths
    for r in range(R):
        rays = cammod.generate(sc.camera, jax.random.PRNGKey(6000 + r), 1,
                               xres=256, yres=256)
        o = np.asarray(rays.origin)[flat]
        d = np.asarray(rays.direction)[flat]
        t, tri, u, v = near(o, d, vis=1)
        p_ = o + d * t[:, None]
        ns = nrm(tri, u, v)
        fl = (ns * -d).sum(1) < 0
        ns[fl] = -ns[fl]
        mid_arr = np.asarray(g.mat_id)[np.maximum(tri, 0)]
        val = nee(p_, ns, -d, mid_arr, np.maximum(tri, -1))
        # GI (1 bounce)
        tb, bb = onb(ns)
        u1 = rng_np.random(64).astype(np.float32)
        u2 = rng_np.random(64).astype(np.float32)
        rr = np.sqrt(u1)
        ph = 2 * np.pi * u2
        wl = np.stack([rr * np.cos(ph), rr * np.sin(ph),
                       np.sqrt(np.maximum(1 - u1, 0))], 1)
        wi = wl[:, 0:1] * tb + wl[:, 1:2] * bb + wl[:, 2:3] * ns
        fc_cam = fcos_ball(mid_arr, -d, wi, ns)
        pdf = np.maximum(wl[:, 2], 1e-6) / np.pi
        t2, tri2, uu2, vv2 = near(p_ + wi * EPS, wi)
        h2 = tri2 >= 0
        gi = np.zeros((64, 3), np.float32)
        if h2.any():
            p2 = (p_ + wi * EPS)[h2] + wi[h2] * t2[h2][:, None]
            ns2 = nrm(tri2[h2], uu2[h2], vv2[h2])
            f2 = (ns2 * -wi[h2]).sum(1) < 0
            ns2[f2] = -ns2[f2]
            mid2 = np.asarray(g.mat_id)[np.maximum(tri2[h2], 0)]
            gi[h2] = nee(p2, ns2, -wi[h2], mid2, np.maximum(tri2[h2], -1))
        val = val + fc_cam * gi / pdf[:, None]
        total += val
    brute = (total / R)
    wf = np.load(f"out/abl_{tag}_{case}.npy")
    wfm = wf[y0:y0 + 8, x0:x0 + 8].reshape(64, 3)
    bm = brute.mean(0)
    wm = wfm.mean(0)
    print(f"{tag:12s} brute {bm.round(5)}  wf {wm.round(5)}  "
          f"ratio {(wm / np.maximum(bm, 1e-9)).round(4)}", flush=True)


for tag, drops in VARIANTS:
    if args.only and tag != args.only:
        continue
    if not os.path.exists(f"out/abl_{tag}_{case}.npy"):
        print(f"{tag}: missing render")
        continue
    run_variant(tag, drops)
