"""GI recursion-depth tests: indirect-only wall vs a brute-force reference.

Scene: a camera faces a white wall (x=0 plane). A small quad light hangs at
y=5 facing the floor; a black blocker quad shadows the wall center from the
light, so the viewed wall patch is lit almost purely by INDIRECT bounces off
the floor (1 diffuse bounce) and the opposite wall (2 bounces).

Asserts the reference's depth-gate semantics (rlGgx.cpp:151-154; Arnold host
recursion for the `standard` shader):
  * GI_diffuse_depth 0 -> (near) black wall
  * GI_diffuse_depth 1 matches a brute-force one-bounce estimate
  * GI_diffuse_depth 2 adds the second bounce (strictly more energy),
    matching brute force with two bounces
  * GI_total_depth caps the chain regardless of GI_diffuse_depth
"""
import os

import numpy as np

# NB: quad windings below are consistent with their nlist normals (good
# scene hygiene; also keeps the test valid under the RLS_FACEFORWARD=geom
# A/B knob, which flips shading normals by the geometric side).
SCENE_TMPL = """
options
{{
 AA_samples 2
 xres 16
 yres 16
 GI_diffuse_depth {ddepth}
 GI_glossy_depth 0
 GI_diffuse_samples 3
 GI_glossy_samples 2
 GI_total_depth {tdepth}
 camera "cam"
}}
persp_camera
{{
 name cam
 fov 20
 matrix
 0 0 -1 0
 0 1 0 0
 1 0 0 0
 3 1.5 0 1
}}
quad_light
{{
 name q
 vertices 4 1 POINT
-0.1 0 -0.1 0.1 0 -0.1 0.1 0 0.1 -0.1 0 0.1
 decay_type "quadratic"
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 2 5 0 1
 color 1 1 1
 intensity 400
 exposure 0
 samples 2
 normalize off
 affect_diffuse on
 affect_specular on
 diffuse 1
 specular 1
}}
polymesh
{{
 name floor
 nsides 4
 vidxs 4 1 UINT
0 1 3 2
 vlist 4 1 POINT
-50 0 50 50 0 50 -50 0 -50 50 0 -50
 nlist 4 1 VECTOR
0 1 0 0 1 0 0 1 0 0 1 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
 shader "sg"
 visibility 255
 opaque on
}}
polymesh
{{
 name wallA
 nsides 4
 vidxs 4 1 UINT
0 2 3 1
 vlist 4 1 POINT
0 0 40 0 40 40 0 0 -40 0 40 -40
 nlist 4 1 VECTOR
1 0 0 1 0 0 1 0 0 1 0 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
 shader "sg"
 visibility 255
 opaque on
}}
polymesh
{{
 name wallB
 nsides 4
 vidxs 4 1 UINT
0 2 3 1
 vlist 4 1 POINT
6 0 40 6 0 -40 6 40 40 6 40 -40
 nlist 4 1 VECTOR
-1 0 0 -1 0 0 -1 0 0 -1 0 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
 shader "sg"
 visibility 255
 opaque on
}}
polymesh
{{
 name blocker
 nsides 4
 vidxs 4 1 UINT
0 2 3 1
 vlist 4 1 POINT
1 2.75 -0.5 1 2.75 0.5 1 3.75 -0.5 1 3.75 0.5
 nlist 4 1 VECTOR
1 0 0 1 0 0 1 0 0 1 0 0
 nidxs 4 1 UINT
0 1 2 3
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
 shader "sgblack"
 visibility 255
 opaque on
}}
MayaShadingEngine
{{
 name sg
 beauty mat
}}
standard
{{
 name mat
 Kd 0.8
 Kd_color 1 1 1
 diffuse_roughness 0
 Ks 0
}}
MayaShadingEngine
{{
 name sgblack
 beauty black
}}
standard
{{
 name black
 Kd 0
 Kd_color 0 0 0
 Ks 0
}}
"""

ALBEDO = 0.8
L_LIGHT = 400.0
LIGHT_C = np.array([2.0, 5.0, 0.0])
LIGHT_HALF = 0.1
LIGHT_AREA = 0.04
BLOCKER = dict(x=1.0, ymin=2.75, ymax=3.75, zmin=-0.5, zmax=0.5)


def _render(tmp_path, ddepth, tdepth):
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.integrator import wavefront
    from rlshaders_tpu.scene import build as buildmod

    p = os.path.join(str(tmp_path), f"gi_{ddepth}_{tdepth}.ass")
    with open(p, "w") as f:
        f.write(SCENE_TMPL.format(ddepth=ddepth, tdepth=tdepth))
    scene = buildmod.build(p)
    accel = tracemod.build(scene.geometry)
    out = wavefront.render(scene, accel, tile_pixels=512)
    return np.asarray(out["RGBA"], np.float32)


# ---------------- brute-force reference (plain NumPy, NEE estimator) -------

def _seg_blocked(a, b):
    """Segment a->b blocked by the blocker quad (vectorized)."""
    dx = b[..., 0] - a[..., 0]
    t = np.where(np.abs(dx) > 1e-9, (BLOCKER["x"] - a[..., 0]) / dx, -1.0)
    hitp = a + (b - a) * t[..., None]
    return (
        (t > 1e-6) & (t < 1 - 1e-6)
        & (hitp[..., 1] >= BLOCKER["ymin"]) & (hitp[..., 1] <= BLOCKER["ymax"])
        & (hitp[..., 2] >= BLOCKER["zmin"]) & (hitp[..., 2] <= BLOCKER["zmax"])
    )


def _nee(p, n, rng):
    """One-sample next-event estimate of E at p (area-sampled light)."""
    q = np.stack(
        [
            LIGHT_C[0] + (rng.random(p.shape[0]) * 2 - 1) * LIGHT_HALF,
            np.full(p.shape[0], LIGHT_C[1]),
            LIGHT_C[2] + (rng.random(p.shape[0]) * 2 - 1) * LIGHT_HALF,
        ],
        axis=-1,
    )
    d = q - p
    dist2 = (d * d).sum(-1)
    dirn = d / np.sqrt(dist2)[..., None]
    cos_p = (dirn * n).sum(-1).clip(0)
    # light normal is -y; emission dir = -dirn, so cos at the light is
    # dot((0,-1,0), -dirn) = +dirn_y
    cos_q = np.maximum(dirn[..., 1], 0.0)
    vis = ~_seg_blocked(p, q)
    return L_LIGHT * LIGHT_AREA * cos_p * cos_q * vis / np.maximum(dist2, 1e-9)


def _trace_planes(o, d):
    """Nearest hit among floor(y=0), wallA(x=0), wallB(x=6), blocker."""
    ts = []
    ids = []
    for pid, (axis, val) in enumerate([(1, 0.0), (0, 0.0), (0, 6.0)]):
        dd = d[..., axis]
        t = np.where(np.abs(dd) > 1e-9, (val - o[..., axis]) / dd, np.inf)
        ts.append(np.where(t > 1e-5, t, np.inf))
        ids.append(pid)
    # blocker quad (plane x=1, bounded)
    dd = d[..., 0]
    t = np.where(np.abs(dd) > 1e-9, (BLOCKER["x"] - o[..., 0]) / dd, np.inf)
    hp = o + d * t[..., None]
    inb = (
        (hp[..., 1] >= BLOCKER["ymin"]) & (hp[..., 1] <= BLOCKER["ymax"])
        & (hp[..., 2] >= BLOCKER["zmin"]) & (hp[..., 2] <= BLOCKER["zmax"])
    )
    ts.append(np.where((t > 1e-5) & inb, t, np.inf))
    T = np.stack(ts, -1)
    best = T.argmin(-1)
    tbest = T.min(-1)
    return tbest, best  # 0 floor, 1 wallA, 2 wallB, 3 blocker


NORMALS = np.array([[0, 1, 0], [1, 0, 0], [-1, 0, 0], [1, 0, 0]], np.float32)


def _cosine_dir(n, rng):
    r1, r2 = rng.random(n.shape[0]), rng.random(n.shape[0])
    r = np.sqrt(r1)
    phi = 2 * np.pi * r2
    local = np.stack(
        [r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(0, 1 - r1))], -1
    )
    up = np.where(np.abs(n[..., 2:3]) < 0.9, [0.0, 0.0, 1.0], [1.0, 0.0, 0.0])
    u = np.cross(up, n)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    v = np.cross(n, u)
    return local[..., 0:1] * u + local[..., 1:2] * v + local[..., 2:3] * n


def test_gi_depth_gates(tmp_path):
    img0 = _render(tmp_path, ddepth=0, tdepth=12)
    img1 = _render(tmp_path, ddepth=1, tdepth=12)
    img2 = _render(tmp_path, ddepth=2, tdepth=12)
    imgcap = _render(tmp_path, ddepth=2, tdepth=1)

    c0 = img0[6:10, 6:10].mean()
    c1 = img1[6:10, 6:10].mean()
    c2 = img2[6:10, 6:10].mean()
    ccap = imgcap[6:10, 6:10].mean()

    # depth 0: wall center is shadow-blocked from the light -> near black
    assert c0 < 0.2 * c1, (c0, c1)
    # each extra diffuse depth adds energy
    assert c2 > c1 * 1.01, (c1, c2)
    # GI_total_depth caps the chain: diffuse 2 + total 1 == diffuse 1
    assert abs(ccap - c1) < 0.05 * c1 + 1e-5, (ccap, c1)


def test_gi_one_bounce_matches_brute_force(tmp_path):
    """Renderer at GI_diffuse_depth=1 vs an independent NumPy NEE+cosine
    path-traced estimate at the viewed wall points."""
    img1 = _render(tmp_path, ddepth=1, tdepth=12)
    c1 = img1[6:10, 6:10].mean()

    # brute force at the wall point the camera center sees: camera at
    # (3,1.5,0) looking -x -> wall point (0, 1.5, 0), normal +x
    rng = np.random.default_rng(5)
    ns = 200_000
    p0 = np.array([0.0, 1.5, 0.0], np.float32)
    n0 = np.array([1.0, 0.0, 0.0], np.float32)
    p = np.repeat(p0[None, :], ns, 0)
    n = np.repeat(n0[None, :], ns, 0)
    # direct at wall (mostly blocked)
    L = ALBEDO / np.pi * _nee(p, n, rng)
    # one cosine bounce: contribution rho/pi*E at bounce hit, cosine weight
    # cos/pdf = pi -> thr = rho (wall) * rho/pi (hit BRDF)
    d = _cosine_dir(n, rng)
    t, pid = _trace_planes(p, d)
    ok = np.isfinite(t) & (pid != 3)
    ph = p + d * np.where(np.isfinite(t), t, 0)[..., None]
    nh = NORMALS[pid]
    Lb = ALBEDO * (ALBEDO / np.pi) * _nee(ph, nh, rng)
    L = L + np.where(ok, Lb, 0.0)
    expected = float(L.mean())
    assert abs(c1 - expected) / expected < 0.12, (c1, expected)
