"""Probe: Arnold-4 valid-sample MIS renormalization (fidelity r5, probe (a)).

Hypothesis (docs/fidelity.md r4): Arnold's host BSDF-strategy estimators
(AiEvaluateLightSample's BSDF half + AiBRDFIntegrate) divide by the count of
VALID samples — evalSample directions the host did not zero for falling
below the hemisphere (rlGgx.h evalBrdf's AI_V3_ZERO guard) — rather than
the drawn count. That gains energy exactly where VNDF misses are common
(grazing-Fresnel content), with the measured case ordering teflon > gold >
metal > diffuse.

The knob is traced (DeviceScene.mis_renorm, env RLS_MIS_RENORM), so base
and variant share one compiled program; all shared-scene cases share one
shape class, so the compile is paid once.

Usage: python tools/probe_misrenorm.py [--cases 0006,0002,0004] [--passes 3]
Prints per-material signed mean error vs golden for mis_renorm in {0, 1},
plus the ball's radial bands (the r4 dissection localized the deficit to
the grazing/silhouette band).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--cases", default="0006,0002,0004")
p.add_argument("--passes", type=int, default=3)
p.add_argument("--aa", type=int, default=3)
p.add_argument("--variants", default="base,renorm",
               help="comma list; each is +-joined knob names from: "
                    "renorm (valid-sample renormalization), "
                    "nbl (light-side MIS vs 1 BSDF sample), "
                    "nlp (pickup-side MIS vs 1 light sample)")
args = p.parse_args()

KNOBS = {
    "base": {},
    "renorm": {"RLS_MIS_RENORM": "1.0"},
    "nbl": {"RLS_MIS_NB_LIGHT": "0.1111111"},
    "nbl3": {"RLS_MIS_NB_LIGHT": "0.3333333"},
    "nlp": {"RLS_MIS_NL_PICKUP": "0.1111111"},
}


def scene_variant(scene, tag):
    """Table-edit variants (traced: no recompile). skyNNN = dome radiance
    x N.NN — the r5 region-mean inversion implies Arnold's effective dome
    is ~1.15x our color*intensity*2^exposure table on every shared-scene
    region (docs/fidelity.md r5)."""
    import jax.numpy as jnp
    for part in tag.split("+"):
        if part.startswith("sky") and part[3:].isdigit():
            f = float(part[3:]) / 100.0
            scene.sky = scene.sky._replace(radiance=scene.sky.radiance * f)
    return scene

import numpy as np

import rlshaders_tpu  # noqa: F401
import jax

from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import camera as cammod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.io import exr
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.utils import watermark

wm = watermark.pinned_mask()


def ball_bands(mid, names):
    """Radial bands of the test-ball region (the material named *ball* or
    the Disney/GGX test material), innermost to silhouette."""
    ball_rows = [i for i, nm in enumerate(names)
                 if "ball" in nm.lower() or "rl" in nm.lower()
                 or "test" in nm.lower()]  # shared scene: testShadingGroup
    if not ball_rows:
        return None, None
    m = np.isin(mid, ball_rows)
    if m.sum() < 100:
        return None, None
    ys, xs = np.nonzero(m)
    cy, cx = ys.mean(), xs.mean()
    r = np.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
    rmax = np.percentile(r, 99)
    bands = []
    for lo, hi in ((0.0, 0.5), (0.5, 0.8), (0.8, 0.95), (0.95, 1.05)):
        bm = np.zeros_like(m)
        sel = (r >= lo * rmax) & (r < hi * rmax)
        bm[ys[sel], xs[sel]] = True
        bands.append((f"r{lo:.2f}-{hi:.2f}", bm & ~wm))
    return m, bands


for case in args.cases.split(","):
    case_dir = f"/root/reference/testsuite/mtoa/{case}"
    data = os.path.join(case_dir, "data")
    scene_path = os.path.join(
        data, [f for f in os.listdir(data) if f.endswith(".ass")][0])
    scene = buildmod.build(scene_path)
    accel = tracemod.build(scene.geometry)
    ref = exr.read_rgb(os.path.join(case_dir, "ref", "ref.exr"))
    names = list(scene.material_names)

    rays = cammod.generate(scene.camera, jax.random.PRNGKey(0), 1,
                           xres=ref.shape[1], yres=ref.shape[0])
    hit = tracemod.nearest(accel, scene.geometry, rays.origin, rays.direction,
                           vis_mask=1)
    tri = np.asarray(hit.tri)
    mid = np.where(
        tri >= 0, np.asarray(scene.geometry.mat_id)[np.maximum(tri, 0)], -1
    ).reshape(ref.shape[:2])
    ball_m, bands = ball_bands(mid, names)
    print(f"== case {case}  materials: {names}", flush=True)

    base_sky = scene.sky
    for tag in args.variants.split(","):
        for env in ("RLS_MIS_RENORM", "RLS_MIS_NB_LIGHT",
                    "RLS_MIS_NL_PICKUP"):
            os.environ.pop(env, None)
        scene.sky = base_sky
        for part in tag.split("+"):
            if part in KNOBS:
                os.environ.update(KNOBS[part])
        scene = scene_variant(scene, tag)
        t0 = time.time()
        acc = None
        for s in range(args.passes):
            out = wavefront.render(scene, accel, seed=1000 + s,
                                   aa_samples=args.aa, tile_pixels=8192)
            img = np.asarray(out["RGBA"], np.float32)
            acc = img if acc is None else acc + img
        img = acc / args.passes
        np.save(f"out/misre_{case}_{tag}.npy", img)
        d = img - ref
        line = [f"{tag} ({time.time()-t0:.0f}s)"]
        for i, nm in enumerate(names):
            m = (mid == i) & ~wm
            if m.sum() < 100:
                continue
            rel = 100.0 * d[m].mean() / max(ref[m].mean(), 1e-6)
            line.append(
                f"{nm.split('SG')[0][:10]}: {rel:+.2f}%")
        full = np.sqrt((d[~wm] ** 2).mean())
        line.append(f"rmse {full:.5f}")
        print("  ".join(line), flush=True)
        if bands:
            bl = ["   ball bands"]
            for bn, bm in bands:
                if bm.sum() < 30:
                    continue
                rel = 100.0 * d[bm].mean() / max(ref[bm].mean(), 1e-6)
                bl.append(f"{bn}: {rel:+.2f}%")
            print("  ".join(bl), flush=True)
