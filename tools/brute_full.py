"""FULL-LOBE estimator validation: an independent brute-force path tracer
carrying every `standard`-shader lobe (diffuse + Beckmann/GGX specular with
the per-ray caustic gates) vs the wavefront renderer on a DETEXTURED copy
of a testsuite scene.

Extends tools/brute_check.py (diffuse-only) so the plinth glossy / logo /
grazing-specular residuals can be localized: if brute == wavefront on a
patch but both differ from the golden, the gap is Arnold-host semantics;
if brute != wavefront, the wavefront estimator itself is biased.

Estimator (unbiased, no MIS needed — quad lights are not scene geometry,
so BSDF rays can never hit them; the sky is collected ONLY by lobe
samples, never by NEE):

    L(x, lobe_in) = NEE_quads(diffuse resp + specular resp)     [full weight]
                  + E_spec [ sky*w_s | is_std * L(x', glossy) ]  [depth-gated]
                  + E_cos  [ sky*w_d | is_std * L(x', diffuse) ] [depth-gated]

with the wavefront's exact transport semantics (integrator/wavefront.py
_secondary_indirect_t / _lobe_family_full):
  - specular response (direct AND families) is OFF on diffuse rays
    (standard's enable_glossy_caustics off — dispatch.gather diffuse_ray),
  - glossy families never spawn from diffuse rays,
  - deeper SURFACE radiance counts only when the spawning hit's material
    is `standard` (the rl* plugins integrate indirect at camera hits only,
    rlGgx.cpp:307-323); sky pickup on the lobe sample always counts,
  - depth gates rd < GI_diffuse_depth, rg < GI_glossy_depth,
    rt < GI_total_depth; exhausted lobes keep a 1-sample sky pickup
    (expectation-identical to the wavefront's full-weight sky column at
    depth-exhausted hits, commit 30e1e40),
  - per-light affect_diffuse/specular * weight factors, sky w_d/w_s.

The BSDF evals/samplers are the renderer's own (models/dispatch.py) — the
INTEGRATOR wiring is what differs, which is exactly the part under test.
SSS lanes are disabled in BOTH renderers (the standard-Ksss semantics are
calibrated separately, docs/fidelity.md).

Usage: python tools/brute_full.py 0004 --paths 512 [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("case", nargs="?", default="0004")
p.add_argument("--paths", type=int, default=512, help="paths per pixel")
p.add_argument("--platform", default="cpu")
p.add_argument("--nee", type=int, default=2, help="NEE samples per quad")
p.add_argument("--skip-wavefront", action="store_true")
p.add_argument("--patch", default=None,
               help="material-name filter (comma list)")
args = p.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.core import frame as framemod
from rlshaders_tpu.core import vec3
from rlshaders_tpu.core.vec3 import V3, v3
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.models import dispatch
from rlshaders_tpu.scene import build as buildmod

case_dir = f"/root/reference/testsuite/mtoa/{args.case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)

# ---- detexture + de-SSS: constant colors, no bump, no Ksss lanes
mats = scene.materials
M = np.asarray(mats.kd).shape[0]
neg1 = jnp.full((M,), -1, jnp.int32)
zero = jnp.zeros((M,), jnp.int32)
mats = mats._replace(
    kd_tex=neg1, ks_tex=neg1, bump_tex=neg1,
    kd_proj=zero, ks_proj=zero, bump_proj=zero,
    bump_height=jnp.zeros((M,)),
    sss_weight=jnp.zeros((M,)),
)
from dataclasses import replace as dc_replace  # noqa: E402
scene = dc_replace(scene, materials=mats)
accel = tracemod.build(scene.geometry)
static = wavefront.SceneStatic.of(scene)
opt = scene.options
GD, GG, GT = opt.gi_diffuse_depth, opt.gi_glossy_depth, opt.gi_total_depth
print(f"gates: diffuse {GD} glossy {GG} total {GT}; "
      f"quad_w_d {static.quad_w_d} quad_w_s {static.quad_w_s} "
      f"sky w_d {static.sky_w_d} w_s {static.sky_w_s}", flush=True)
assert not np.any(np.abs(np.asarray(mats.emission)).sum(-1) > 1e-6), \
    "oracle carries no emission term"

names = list(scene.material_names)
print("materials:", names, flush=True)

# ---- wavefront render of the same detextured+Ksss-less scene
os.makedirs("out", exist_ok=True)
wf_path = f"out/brutefull_wf_{args.case}.npy"
if args.skip_wavefront and os.path.exists(wf_path):
    wf = np.load(wf_path)
else:
    out = wavefront.render(scene, accel, seed=0, aa_samples=3,
                           tile_pixels=8192)
    wf = np.asarray(out["RGBA"], np.float32)
    np.save(wf_path, wf)
    print("wavefront render done", flush=True)

# ---- patches: largest uniform-material 8x8 squares (needs matid map)
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
if args.patch:
    keep = set(args.patch.split(","))
    patches = {k: v for k, v in patches.items() if k in keep}
print("patches:", patches, flush=True)

# ---- brute estimator ----------------------------------------------------
g = scene.geometry
qv = np.asarray(scene.quad_lights.verts)
qn = np.asarray(scene.quad_lights.normal)
qa = np.asarray(scene.quad_lights.area)
qr = np.asarray(scene.quad_lights.radiance)
sky_rad = (np.asarray(scene.sky.radiance, np.float32)
           if scene.sky.exists else np.zeros(3, np.float32))
VIS_SHADOW = buildmod.VIS_SHADOW
MAT_STANDARD = dispatch.MAT_STANDARD
EPS = 1e-3
rng_np = np.random.default_rng(13)


def occluded_np(o, d, tmax):
    return np.asarray(tracemod.occluded(
        accel, g, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(tmax, jnp.float32), vis_mask=VIS_SHADOW))


def nearest_np(o, d, vis=0xFF):
    h = tracemod.nearest(accel, g, jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32), vis_mask=vis)
    return (np.asarray(h.t), np.asarray(h.tri),
            np.asarray(h.u), np.asarray(h.v))


def surface_at(o, d, t, tri, u, v):
    """(p, ns faceforwarded by ns·d, mid) for hit lanes (tri clamped)."""
    tc = np.maximum(tri, 0)
    pos = o + d * t[:, None]
    w = 1.0 - u - v
    ns = (w[:, None] * np.asarray(g.n0)[tc]
          + u[:, None] * np.asarray(g.n1)[tc]
          + v[:, None] * np.asarray(g.n2)[tc])
    ns /= np.maximum(np.linalg.norm(ns, axis=1, keepdims=True), 1e-12)
    flip = (ns * d).sum(1) > 0
    ns[flip] = -ns[flip]
    return pos, ns, np.asarray(g.mat_id)[tc]


def matg_of(mid, diffuse_ray):
    n = mid.shape[0]
    return dispatch.gather(
        scene.materials, scene.textures, jnp.asarray(mid, jnp.int32),
        jnp.zeros((n, 2), jnp.float32), jnp.ones((n,), bool),
        tex_gamma=static.tex_gamma, diffuse_ray=diffuse_ray,
    )


def _v3np(x: V3):
    return np.stack([np.asarray(x.x), np.asarray(x.y), np.asarray(x.z)], 1)


def nee_quads(pos, ns, wo, matg, fr):
    """Full-weight NEE over every quad light; diffuse + specular response
    (the specular response is already zeroed on diffuse rays by gather)."""
    n = pos.shape[0]
    acc = np.zeros((n, 3), np.float32)
    wo_l = framemod.to_local_v(fr, v3(jnp.asarray(wo, jnp.float32)))
    for li in range(qv.shape[0]):
        if not static.quad_valid[li]:
            continue
        w_d, w_s = static.quad_w_d[li], static.quad_w_s[li]
        if w_d == 0.0 and w_s == 0.0:
            continue
        v0, v1_, v2_, v3_ = qv[li]
        e1, e2 = v1_ - v0, v3_ - v0
        for _ in range(args.nee):
            u1 = rng_np.random(n).astype(np.float32)
            u2 = rng_np.random(n).astype(np.float32)
            lp = v0[None] + u1[:, None] * e1[None] + u2[:, None] * e2[None]
            tov = lp - pos
            d2 = np.maximum((tov * tov).sum(1), 1e-12)
            dist = np.sqrt(d2)
            wi = tov / dist[:, None]
            cos_l = np.abs((wi * qn[li][None]).sum(1))
            cos_s = (wi * ns).sum(1)
            ok = cos_s > 0
            wi_l = framemod.to_local_v(fr, v3(jnp.asarray(wi, jnp.float32)))
            fd, _ = dispatch.eval_diffuse(matg, wo_l, wi_l)
            fs, _ = dispatch.eval_specular(matg, wo_l, wi_l)
            f = _v3np(fd) * w_d + _v3np(fs) * w_s
            geom = cos_l / d2 * qa[li]
            sh = occluded_np(pos + wi * EPS, wi, dist - 2 * EPS)
            w = np.where(ok & ~sh, geom, 0.0).astype(np.float32)
            acc += f * (qr[li][None] * w[:, None]) / args.nee
    return acc


def lobe_sample(matg, fr, wo, lobe):
    """One BSDF sample: (wi_world, weight rgb, ok). Uses the renderer's
    samplers/evals with the wavefront's validity guards (_spawn)."""
    n = wo.shape[0]
    wo_l = framemod.to_local_v(fr, v3(jnp.asarray(wo, jnp.float32)))
    rx = jnp.asarray(rng_np.random(n), jnp.float32)
    ry = jnp.asarray(rng_np.random(n), jnp.float32)
    if lobe == "diffuse":
        wi_l = dispatch.sample_diffuse(matg, wo_l, rx, ry)
        f, pdf = dispatch.eval_diffuse(matg, wo_l, wi_l)
        active = matg.has_diffuse
    else:
        wi_l = dispatch.sample_specular(matg, wo_l, rx, ry)
        f, pdf = dispatch.eval_specular(matg, wo_l, wi_l)
        active = matg.has_spec
    ok = np.asarray(active & (wi_l.z > 1e-5) & (pdf > 1e-9)
                    & (wo_l.z > 1e-4))
    w = _v3np(f) / np.maximum(np.asarray(pdf), 1e-9)[:, None]
    w = np.where(ok[:, None], w, 0.0).astype(np.float32)
    wi_w = framemod.to_world_v(fr, wi_l)
    return _v3np(wi_w), w, ok


def radiance_at(pos, ns, wo, mid, ray_lobe, rr):
    """Outgoing radiance at a batch of surface hits. Pure NumPy control
    flow; depth recursion mirrors wavefront._secondary_indirect_t."""
    rd, rg, rrf, rt = rr
    n = pos.shape[0]
    fr0 = framemod.build_frame_polar(jnp.asarray(ns, jnp.float32))
    fr = framemod.Frame(u=v3(fr0.u), v=v3(fr0.v), n=v3(fr0.n))
    matg = matg_of(mid, diffuse_ray=(ray_lobe == "diffuse"))
    L = nee_quads(pos, ns, wo, matg, fr)
    is_std = np.asarray(matg.mtype) == MAT_STANDARD
    camera = ray_lobe == "camera"

    # ---- specular family (never from diffuse rays; exhausted -> sky-only)
    spec_ok = ray_lobe != "diffuse"
    if spec_ok:
        wi, w, ok = lobe_sample(matg, fr, wo, "specular")
        w = w * static.sky_w_s if static.sky_w_s != 1.0 else w
        t, tri, uu, vv = nearest_np(pos + wi * EPS, wi)
        miss = tri < 0
        L += np.where((ok & miss)[:, None], w * sky_rad[None], 0.0)
        deeper = rg < GG and rt < GT
        take = ok & ~miss & (is_std | camera) if deeper else np.zeros(n, bool)
        if deeper and take.any():
            p2, ns2, mid2 = surface_at(pos[take] + wi[take] * EPS, wi[take],
                                       t[take], tri[take], uu[take], vv[take])
            sub = radiance_at(p2, ns2, -wi[take], mid2, "glossy",
                              (rd, rg + 1, rrf, rt + 1))
            L[take] += w[take] * sub

    # ---- diffuse family (exhausted -> sky-only pickup)
    wi, w, ok = lobe_sample(matg, fr, wo, "diffuse")
    w = w * static.sky_w_d if static.sky_w_d != 1.0 else w
    t, tri, uu, vv = nearest_np(pos + wi * EPS, wi)
    miss = tri < 0
    L += np.where((ok & miss)[:, None], w * sky_rad[None], 0.0)
    deeper = rd < GD and rt < GT
    take = ok & ~miss & (is_std | camera) if deeper else np.zeros(n, bool)
    if deeper and take.any():
        p2, ns2, mid2 = surface_at(pos[take] + wi[take] * EPS, wi[take],
                                   t[take], tri[take], uu[take], vv[take])
        sub = radiance_at(p2, ns2, -wi[take], mid2, "diffuse",
                          (rd + 1, rg, rrf, rt + 1))
        L[take] += w[take] * sub
    return L


def run_patch(nm, yx, n_paths):
    y0, x0 = yx
    pix = np.array([(y, x) for y in range(y0, y0 + 8)
                    for x in range(x0, x0 + 8)])
    flat = pix[:, 0] * 256 + pix[:, 1]
    total = np.zeros((len(pix), 3), np.float64)
    for r in range(n_paths):
        rays = cammod.generate(scene.camera, jax.random.PRNGKey(9000 + r),
                               1, xres=256, yres=256)
        o = np.asarray(rays.origin)[flat]
        d = np.asarray(rays.direction)[flat]
        t, tri, u, v = nearest_np(o, d, 1)
        hit = tri >= 0
        pos, ns, mid = surface_at(o, d, t, tri, u, v)
        lsum = radiance_at(pos, ns, -d, mid, "camera", (0, 0, 0, 0))
        lsum[~hit] = (sky_rad[None] if scene.sky.visible_to_camera
                      else 0.0)
        total += lsum
    mean = (total / n_paths).reshape(8, 8, 3)
    wf_patch = wf[y0:y0 + 8, x0:x0 + 8]
    bm, wm = mean.mean((0, 1)), wf_patch.mean((0, 1))
    print(f"{nm:26s} brute {bm.round(4)}  wavefront {wm.round(4)}  "
          f"ratio {(wm / np.maximum(bm, 1e-9)).round(4)}", flush=True)


for nm, yx in patches.items():
    run_patch(nm, yx, args.paths)
