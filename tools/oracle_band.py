"""Exact direct-lighting oracle on a radial band of the test ball.

For selected ball pixels (radial band, center pinhole rays), computes the
EXACT direct response to the quad lights — dense subdivision of each quad,
per-subsample shadow trace, radiance through the repo's formula-verified
BSDF dispatch (reference parity: rlGgx.h reflection()/rlDisney evalSpecular
verified to 1e-6, docs/fidelity.md) — plus the skydome's direct response by
hemisphere quadrature with occlusion.

Attribution logic (r5): the r4/r5 decomposition shows the teflon ball's
deficit is FRONTAL/dim (wall-reflection content), not silhouette-band. With
direct exact (this oracle), golden - oracle_direct isolates Arnold's
indirect+host-extra, and ours - oracle_direct isolates our indirect — the
ratio attributes the deficit to the indirect-specular estimator vs a direct
semantic.

Usage:
  python tools/oracle_band.py 0001 [--rlo 0.0 --rhi 0.7] [--sub 32]
         [--skysub 24] [--ours out/conv_0001.exr]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.core import frame as framemod
from rlshaders_tpu.core import vec3
from rlshaders_tpu.core.vec3 import V3
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.integrator.wavefront import SceneStatic
from rlshaders_tpu.io import exr
from rlshaders_tpu.models import dispatch
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.utils import watermark

p = argparse.ArgumentParser()
p.add_argument("case")
p.add_argument("--rlo", type=float, default=0.0)
p.add_argument("--rhi", type=float, default=0.7)
p.add_argument("--sub", type=int, default=32)
p.add_argument("--skysub", type=int, default=24)
p.add_argument("--ours", default=None)
args = p.parse_args()

case_dir = f"/root/reference/testsuite/mtoa/{args.case}"
data = os.path.join(case_dir, "data")
scene_path = os.path.join(
    data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
scene = buildmod.build(scene_path)
accel = tracemod.build(scene.geometry)
static = SceneStatic.of(scene)
ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))
wm = watermark.pinned_mask()
ours = None
if args.ours and os.path.exists(args.ours):
    ours = (np.load(args.ours)[..., :3] if args.ours.endswith(".npy")
            else exr.read_rgb(args.ours))

g = scene.geometry
names = list(scene.material_names)
ball_rows = [i for i, nm in enumerate(names)
             if "test" in nm.lower() or "ball" in nm.lower()]
xres = yres = ref.shape[0]
cam = scene.camera._replace(aperture_size=0.0)
rays = cammod.generate(cam, jax.random.PRNGKey(0), 1, xres=xres, yres=yres)
o_all = np.asarray(rays.origin)
d_all = np.asarray(rays.direction)
h = tracemod.nearest(accel, g, rays.origin, rays.direction, vis_mask=1)
t, tri, u, v = [np.asarray(a) for a in (h.t, h.tri, h.u, h.v)]
mat_of_tri = np.asarray(g.mat_id)
on_ball = (tri >= 0) & np.isin(mat_of_tri[np.maximum(tri, 0)], ball_rows)
on_ball &= ~wm.reshape(-1)

iy, ix = np.divmod(np.arange(xres * yres), xres)
ys, xs = iy[on_ball], ix[on_ball]
cy, cx = ys.mean(), xs.mean()
rr = np.sqrt((iy - cy) ** 2 + (ix - cx) ** 2)
rmax = np.percentile(rr[on_ball], 99)
band = on_ball & (rr >= args.rlo * rmax) & (rr < args.rhi * rmax)
idx = np.where(band)[0]
print(f"band px: {len(idx)} (r in [{args.rlo},{args.rhi}] of rmax)")

# hit attributes
tc = np.maximum(tri[idx], 0)
w_ = 1.0 - u[idx] - v[idx]
pos = o_all[idx] + d_all[idx] * t[idx][:, None]
ns = (w_[:, None] * np.asarray(g.n0)[tc] + u[idx][:, None] *
      np.asarray(g.n1)[tc] + v[idx][:, None] * np.asarray(g.n2)[tc])
ns /= np.maximum(np.linalg.norm(ns, axis=1, keepdims=True), 1e-12)
dcam = d_all[idx]
# faceforward by ns.d (the renderer's policy)
flip = (ns * dcam).sum(1) > 0.0
nf = np.where(flip[:, None], -ns, ns)
wo_w = -dcam

# material row at the hits (the same gather + V3 split the renderer uses;
# the test balls are untextured so uv/footprint are inert)
mids = mat_of_tri[tc]
entering = (dcam * ns).sum(1) < 0.0
uv_hit = np.zeros((n_band := len(idx), 2), np.float32)
matg = dispatch.gather(
    scene.materials, scene.textures, jnp.asarray(mids, jnp.int32),
    jnp.asarray(uv_hit), jnp.asarray(entering),
    jnp.asarray(pos, jnp.float32),
    fp=jnp.full((n_band,), 1e-3, jnp.float32),
    fp_uv=jnp.full((n_band,), 1e-3, jnp.float32),
)
matv = dispatch.to_v(matg)
fr = framemod.build_frame_polar_v(vec3.v3(jnp.asarray(nf, jnp.float32)))
wo_l = framemod.to_local_v(fr, vec3.v3(jnp.asarray(wo_w, jnp.float32)))


def eval_lobes(wi_world):
    """f_spec+f_diff (each includes cos) at world wi, per band pixel.
    wi_world is (k*n, 3) in SAMPLE-MAJOR order (rows [s*n, (s+1)*n) =
    sample s), matching vec3.tile's layout."""
    k = wi_world.shape[0] // len(idx)
    matv_k = dispatch.tile_v(matv, k) if k > 1 else matv
    fr_k = framemod.Frame(
        u=vec3.tile(fr.u, k), v=vec3.tile(fr.v, k), n=vec3.tile(fr.n, k),
    ) if k > 1 else fr
    wi_l = framemod.to_local_v(fr_k, vec3.v3(jnp.asarray(wi_world,
                                                         jnp.float32)))
    wo_k = vec3.tile(wo_l, k) if k > 1 else wo_l
    fs, _ = dispatch.eval_specular(matv_k, wo_k, wi_l)
    fd, _ = dispatch.eval_diffuse(matv_k, wo_k, wi_l)
    f = fs + fd
    return np.stack([np.asarray(f.x), np.asarray(f.y), np.asarray(f.z)], 1)


n = len(idx)
direct = np.zeros((n, 3))
ql = scene.quad_lights
qvalid = np.asarray(ql.valid)
for li in range(len(qvalid)):
    if not qvalid[li]:
        continue
    verts = np.asarray(ql.verts[li])          # (4, 3)
    nl = np.asarray(ql.normal[li])
    area = float(np.asarray(ql.area[li]))
    rad = np.asarray(ql.radiance[li]) * float(static.quad_w_s[li])
    S = args.sub
    e_u = verts[1] - verts[0]
    e_v = verts[3] - verts[0]
    dA = area / (S * S)
    acc = np.zeros((n, 3))
    for a in range(S):
        # one row of S subsamples at a time, SAMPLE-MAJOR: (S, n, 3)
        fu = (a + 0.5) / S
        q = (verts[0][None, :] + fu * e_u[None, :]
             + ((np.arange(S) + 0.5) / S)[:, None] * e_v[None, :])  # (S,3)
        seg = q[:, None, :] - pos[None, :, :]                       # (S,n,3)
        dist = np.linalg.norm(seg, axis=2)
        wi = seg / np.maximum(dist[..., None], 1e-9)
        cos_l = np.abs((wi * nl[None, None, :]).sum(2))
        geom = cos_l * dA / np.maximum(dist ** 2, 1e-9)
        f = eval_lobes(wi.reshape(-1, 3)).reshape(S, n, 3)
        # shadow: offset along normal+ray like the renderer
        o_sh = (pos[None, :, :] + nf[None, :, :] * 1e-3
                + wi * 1e-3).reshape(-1, 3)
        blocked = np.asarray(tracemod.occluded(
            accel, g, jnp.asarray(o_sh, jnp.float32),
            jnp.asarray(wi.reshape(-1, 3), jnp.float32),
            jnp.asarray((dist.reshape(-1) - 3e-3), jnp.float32),
            vis_mask=2, exclude_tri=jnp.asarray(
                np.tile(tc, S), jnp.int32),
        )).reshape(S, n)
        acc += ((f * (geom * ~blocked)[..., None]) * rad[None, None, :]
                ).sum(0)
    direct += acc

sky_direct = np.zeros((n, 3))
if scene.sky.exists:
    srad = np.asarray(scene.sky.radiance) * float(static.sky_w_s)
    T = args.skysub
    # hemisphere quadrature around nf per pixel: theta x phi grid
    for a in range(T):
        ct = (a + 0.5) / T           # cos(theta) uniform
        st = np.sqrt(max(0.0, 1 - ct * ct))
        for b in range(2 * T):
            ph = 2 * np.pi * (b + 0.5) / (2 * T)
            # local dir -> world via the same frame
            wl = np.array([st * np.cos(ph), st * np.sin(ph), ct],
                          np.float32)
            wi = (np.asarray(fr.u.aos()) * wl[0]
                  + np.asarray(fr.v.aos()) * wl[1]
                  + np.asarray(fr.n.aos()) * wl[2])
            dw = (1.0 / T) * (np.pi / T)  # d(cos) * dphi
            f = eval_lobes(wi)
            o_sh = pos + nf * 1e-3 + wi * 1e-3
            blocked = np.asarray(tracemod.occluded(
                accel, g, jnp.asarray(o_sh, jnp.float32),
                jnp.asarray(wi, jnp.float32),
                jnp.full((n,), 1e12, jnp.float32),
                vis_mask=2, exclude_tri=jnp.asarray(tc, jnp.int32),
            ))
            sky_direct += f * (dw * ~blocked)[:, None] * srad[None, :]

tot = direct + sky_direct
gold = ref.reshape(-1, 3)[idx]
print(f"oracle quad-direct mean RGB: {direct.mean(0)}")
print(f"oracle sky-direct  mean RGB: {sky_direct.mean(0)}")
print(f"oracle direct total        : {tot.mean(0)}")
print(f"golden band mean           : {gold.mean(0)}")
print(f"golden - oracle (indirect+extra per Arnold): {gold.mean(0)-tot.mean(0)}")
if ours is not None:
    om = ours.reshape(-1, 3)[idx]
    print(f"ours band mean             : {om.mean(0)}")
    print(f"ours - oracle (our indirect): {om.mean(0)-tot.mean(0)}")
    gi_g = gold.mean(0) - tot.mean(0)
    gi_o = om.mean(0) - tot.mean(0)
    print(f"our-indirect / golden-indirect ratio: {gi_o / np.maximum(gi_g, 1e-9)}")
