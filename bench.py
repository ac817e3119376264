"""Benchmark: BSDF throughput + end-to-end render + multi-chip scaling.

Primary metric (the BASELINE.json headline): Disney BSDF eval+sample
throughput on a 1080p material-test grid — the per-sample work rlDisney's
shader_evaluate does per light sample (reference rlDisney.cpp:105-602),
batched over the frame under jit. Measured BOTH with the clearcoat lobe off
(static-specialized fast path) and on (full GTR2+GTR1 mixture); the headline
is the clearcoat-ON number (no self-serving configuration).

Also measured and reported in the same JSON line under "extra":
  * disney_gsps_cc_off      — clearcoat-off variant
  * render_mrays_s          — end-to-end wavefront render of testsuite case
                              0004 (trace+shade+occlude+splat) in Mrays/s
  * render_seconds          — wall time of that render (256x256, AA 3)
  * refract512_mrays_s/_seconds — BASELINE config #2: the rough-refraction
                              glass-sphere scene (scenes/glass_sphere.ass)
                              at 512x512, exercising the full transmission
                              path (TIR + Kt transparent shadows)
  * scaling                 — measured throughput ratios on a virtual CPU
                              mesh (1 vs 2 vs 4 vs 8 devices) for the
                              sharded render pipeline; shape-of-curve only
                              (CPU devices, not chips)

vs_baseline compares the headline against the 2 Gsamples/s v5e-8 target
from BASELINE.md scaled to ONE chip (0.25 Gsamples/s/chip) — a single-chip
share, NOT a demonstrated multi-chip number; the scaling curve is reported
separately and honestly.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The BSDF microbench (the headline) runs with the persistent compile cache
# OFF: executables LOADED from the cache run ~7% slower on the axon backend
# than freshly-compiled ones (measured r4: clearcoat-ON 0.236-0.243 Gs/s
# cached vs 0.253-0.269 fresh). The render/refract CHILD processes keep the
# cache ON: their fused tile programs are cache-insensitive (53.3 vs 53.5 s
# steady, docs/perf.md) but cost ~650-750 s to compile cold — r4's bench
# passed the cache-off env to the children, which then starved inside their
# subprocess budgets compiling (rc=124, all extras null). Honor an explicit
# user override in both directions.
_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_REPO, ".jax_cache")
if any(a in ("--render-bench", "--refract-bench") for a in sys.argv[1:]):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    if os.environ.get("JAX_COMPILATION_CACHE_DIR") == "":
        os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "")

import rlshaders_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS before jax init)
import jax
import jax.numpy as jnp
import numpy as np

from rlshaders_tpu.bsdf import disney
from rlshaders_tpu.core import rng

WIDTH, HEIGHT = 1920, 1080
SPP = 8  # samples per pixel per timed step


def make_scene_batch(clearcoat: float):
    """1080p material-test grid: roughness x metallic over the frame.
    Channel-split (V3) params + view directions — the TPU-hot form."""
    from rlshaders_tpu.core.vec3 import V3

    n = WIDTH * HEIGHT
    x = (jnp.arange(n) % WIDTH).astype(jnp.float32) / WIDTH
    y = (jnp.arange(n) // WIDTH).astype(jnp.float32) / HEIGHT
    params = disney.make_params(
        base_color=V3(0.7 * jnp.ones_like(x), 0.3 + 0.4 * x, 0.2 + 0.6 * y),
        roughness=0.05 + 0.9 * x,
        metallic=y,
        specular=0.8,
        specular_tint=0.3,
        anisotropic=0.3 * x,
        sheen=0.5 * y,
        sheen_tint=0.5,
        clearcoat=clearcoat,
        clearcoat_gloss=0.7,
        subsurface=0.2,
    )
    # Broadcast every rank-0 field to full lane width. Rank-0 jit parameters
    # are placed in HOST memory (S(6)) by XLA:TPU, and on this backend every
    # fusion that reads one pays a host-memory DMA per execution — measured
    # 0.28 s/iter with scalar params vs 0.0091 s/iter lane-broadcast at
    # 512x512 (the entire "clearcoat-on collapse" was this, not the GTR1
    # mixture). Production material tables are per-shading-point anyway.
    params = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,)) if a.ndim == 0 else a, params
    )
    t = 0.3 + 0.5 * y
    st = jnp.sqrt(1.0 - t * t)
    wo = V3(st, jnp.zeros_like(t), t)
    return params, wo


def step(params, wo, key, cc: bool):
    """SPP spec samples + SPP diffuse samples, full eval + pdf + MIS blend.

    lax.scan over the SPP axis with (n,)-wide bodies: the earlier flat
    (SPP*n,) sample-major layout tiled every param field SPP-fold (~1.3 GB
    of broadcast reads per iter at 1080p) and kept both mixture samplers'
    full-width chains live at once — the clearcoat-ON program became
    working-set bound (0.186 Gs/s at 1080p vs 0.46 effective at 512x512
    with identical math). The scan keeps one sample's intermediates live at
    a time; per-sample arithmetic is unchanged."""
    from rlshaders_tpu.core.vec3 import V3

    n = wo.x.shape[0]
    u = jax.random.uniform(key, (SPP, n, 4), dtype=jnp.float32)

    def body(acc, u_s):
        wi_s = disney.sample_specular(params, wo, u_s[:, 0], u_s[:, 1], cc)
        f_s = disney.eval_specular_cos(params, wo, wi_s, cc)
        p_s = disney.pdf_specular(params, wo, wi_s, cc)
        p_sd = disney.pdf_diffuse(params, wo, wi_s)
        w_s = p_s / jnp.maximum(p_s + p_sd, 1e-9)

        wi_d = disney.sample_diffuse(params, wo, u_s[:, 2], u_s[:, 3])
        f_d = disney.eval_diffuse_cos(params, wo, wi_d)
        p_d = disney.pdf_diffuse(params, wo, wi_d)
        p_ds = disney.pdf_specular(params, wo, wi_d, cc)
        w_d = p_d / jnp.maximum(p_d + p_ds, 1e-9)

        est = (
            f_s * (w_s / jnp.maximum(p_s, 1e-9))
            + f_d * (w_d / jnp.maximum(p_d, 1e-9))
        )
        return acc + est, None

    zero = jnp.zeros((n,), jnp.float32)
    acc, _ = jax.lax.scan(body, V3(zero, zero, zero), u)
    return acc * (1.0 / SPP)


def bench_bsdf(clearcoat: float) -> float:
    """Gsamples/s for one clearcoat configuration.

    Timing must fetch a result to host: on the tunneled TPU,
    block_until_ready returns before remote execution completes (measured),
    so device-only timing under-reports by orders of magnitude. The timed
    program therefore reduces the frame to 3 scalars and fetches THOSE —
    forcing all compute to finish while keeping the ~200 MB tunnel transfer
    of the raw frame (which would dominate the measurement; see
    tools/bisect_clearcoat.py) out of the timed region."""
    params, wo = make_scene_batch(clearcoat)
    cc = disney.has_clearcoat(params)

    def reduced(p, w, k):
        out = step(p, w, k, cc)
        return jnp.stack([out.x.sum(), out.y.sum(), out.z.sum()])

    fn = jax.jit(reduced)
    key = rng.stream(0)
    _ = np.asarray(fn(params, wo, key))

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(params, wo, rng.fold(key, i))
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / n_iters
    # each pixel-sample draws TWO full BSDF samples (specular mixture and
    # diffuse), each with eval + both MIS pdfs
    return WIDTH * HEIGHT * SPP * 2 / dt / 1e9


def bench_render():
    """End-to-end wavefront render of testsuite case 0004 at reference
    settings (256x256, AA 3 — the representative shared-scene case; 0001's
    high diffuse-sample budget takes ~12 min/frame and is scored by the
    testsuite harness instead); returns (mrays_s, seconds)."""
    scene_path = "/root/reference/testsuite/mtoa/0004/data/disney.ass"
    if not os.path.exists(scene_path):
        print(json.dumps({"mrays": None, "seconds": None}))
        return
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.integrator import wavefront
    from rlshaders_tpu.scene import build as buildmod

    scene = buildmod.build(scene_path)
    accel = tracemod.build(scene.geometry)
    # warm-up at the SAME shape so compiles land outside the timed region
    np.asarray(wavefront.render(scene, accel, tile_pixels=8192)["RGBA"])
    t0 = time.perf_counter()
    out = wavefront.render(scene, accel, tile_pixels=8192)
    np.asarray(out["RGBA"])  # host fetch: axon completion isn't observable
    dt = time.perf_counter() - t0
    stats = out.get("__stats__", {})
    total = stats.get("nearest_rays", 0) + stats.get("shadow_rays", 0)
    print(json.dumps({"mrays": total / dt / 1e6, "seconds": dt}))


def bench_refract():
    """BASELINE.json config #2: rough-refraction glass sphere with MIS +
    Russian roulette, 512x512 — the end-to-end rlGgx transmission path
    (Walter Eq.41 weights, TIR, Kt transparent shadows;
    reference rlGgx.h:205-246). RR from refraction depth 2
    (RenderConf.rr_refr_start) terminates low-weight glass chains
    unbiasedly, as the config prescribes. The scene's refraction depth is
    3: the 6-deep statically-unrolled program OOM-kills the axon remote
    compile helper and the 4-deep one thrashed >80 min without finishing
    (r5) — RR makes the truncated tail negligible anyway. Same fetch rules as bench_render."""
    os.environ.setdefault("RLS_RR_START", "2")
    scene_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scenes",
        "glass_sphere.ass")
    if not os.path.exists(scene_path):
        print(json.dumps({"mrays": None, "seconds": None}))
        return
    from rlshaders_tpu.accel import trace as tracemod
    from rlshaders_tpu.integrator import wavefront
    from rlshaders_tpu.scene import build as buildmod

    scene = buildmod.build(scene_path)
    accel = tracemod.build(scene.geometry)
    kw = dict(tile_pixels=8192, xres=512, yres=512)
    np.asarray(wavefront.render(scene, accel, **kw)["RGBA"])  # compile
    t0 = time.perf_counter()
    out = wavefront.render(scene, accel, **kw)
    np.asarray(out["RGBA"])
    dt = time.perf_counter() - t0
    stats = out.get("__stats__", {})
    total = stats.get("nearest_rays", 0) + stats.get("shadow_rays", 0)
    print(json.dumps({"mrays": total / dt / 1e6, "seconds": dt}))


def _bench_subprocess(flag: str, budget: int):
    """Run a --<flag> child with a hard timeout so a pathological compile
    can never prevent the headline JSON line from being printed."""
    env = dict(os.environ)
    # Children get the persistent compile cache even though this process
    # runs cache-off (see the header comment): their tile programs are
    # cache-insensitive and compile-dominated.
    env["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=budget, env=env,
        )
        got = json.loads(p.stdout.strip().splitlines()[-1])
        return got["mrays"], got["seconds"]
    except Exception:
        return None, None


def bench_scaling(budget: int = 2400):
    """Virtual-CPU-mesh scaling curve for the sharded render pipeline:
    relative throughput at 1/2/4/8 devices (subprocess so the forced CPU
    platform doesn't disturb this process's TPU backend)."""
    code = r"""
import os, sys, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, %r)
import jax
from rlshaders_tpu.parallel import mesh as pmesh
# 128x128 aa2 (65536 rays): big enough that trace/shade dominates the
# serial pieces (camera gen, unpack, fetch) the 64x64-aa1 curve measured.
# skin=False: the SSS stage's compile cost x4 mesh sizes would eat the
# subprocess budget; SSS-under-shard_map is covered by dryrun_multichip.
# One JSON line per mesh size so a timeout still yields a partial curve;
# 8 runs right after the 1-device normalizer so the most informative point
# survives a mid-curve timeout.
out = {}
for n in (1, 8, 4, 2):
    mesh = pmesh.make_mesh(n)
    scene, accel = pmesh.demo_scene(skin=False)
    kw = dict(tile_pixels=2048, aa_samples=2, xres=128, yres=128)
    r = pmesh.render_sharded(scene, accel, mesh, **kw)  # warm
    t0 = time.perf_counter()
    r = pmesh.render_sharded(scene, accel, mesh, **kw)
    out[str(n)] = time.perf_counter() - t0
    print(json.dumps(out), flush=True)
""" % os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=budget, env=env)
        stdout = p.stdout
    except subprocess.TimeoutExpired as e:  # keep whatever sizes finished
        stdout = e.stdout or ""
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
    except Exception:
        return None
    try:
        times = json.loads(stdout.strip().splitlines()[-1])
        t1 = times["1"]
        return {k: round(t1 / v, 3) for k, v in times.items()}
    except Exception:
        return None


def main():
    """Budget discipline (round-3 postmortem): the r3 bench printed its one
    JSON line only after ALL extras, whose serial subprocess budgets
    (1500+2100+2400 s) exceeded the driver's wall clock — rc=124, NO perf
    record at all. Now the headline line prints IMMEDIATELY after the two
    BSDF microbenches (the BASELINE.json metric) and every extra runs under
    one shared total budget (RLS_BENCH_TOTAL_BUDGET, default 2200 s from
    process start); an extended line with whatever extras landed is
    re-emitted last, so the final JSON line on stdout is always the most
    complete one and exists even if an extra dies."""
    t_start = time.perf_counter()
    # r4 died at rc=124 with a 2200 s budget: it exceeded the driver's wall
    # clock. 1500 s fits with margin now that the children load the warm
    # compile cache (~164 s to first render) instead of compiling cold.
    total_budget = float(os.environ.get("RLS_BENCH_TOTAL_BUDGET", "1500"))

    def remaining():
        return total_budget - (time.perf_counter() - t_start)

    gsps_on = bench_bsdf(clearcoat=0.8)
    gsps_off = bench_bsdf(clearcoat=0.0)
    baseline_per_chip = 2.0 / 8.0  # BASELINE target is a v5e-8 slice
    result = {
        "metric": "disney_bsdf_eval_sample_1080p_clearcoat_on",
        "value": round(gsps_on, 4),
        "unit": "Gsamples/s",
        "vs_baseline": round(gsps_on / baseline_per_chip, 3),
        "extra": {
            "disney_gsps_cc_off": round(gsps_off, 4),
            "render_mrays_s": None,
            "render_seconds": None,
            "refract512_mrays_s": None,
            "refract512_seconds": None,
            "scaling_vs_1dev": None,
            "note": ("vs_baseline is the single-chip share of the "
                     "v5e-8 target; scaling is a CPU-mesh "
                     "shape-of-curve, not chip throughput"),
        },
    }
    print(json.dumps(result), flush=True)  # headline lands NOW

    extra = result["extra"]
    # Extras in descending value-per-second, each capped by what's left of
    # the total budget (minus a 60 s margin for the final print + teardown).
    # The TPU children (render, refract) run first — they load the warm
    # compile cache; the CPU scaling curve runs last and tolerates a
    # mid-curve timeout (partial results kept).
    if os.environ.get("RLS_BENCH_RENDER", "1") == "1" and remaining() > 240:
        mrays, seconds = _bench_subprocess(
            "--render-bench",
            int(min(float(os.environ.get("RLS_BENCH_RENDER_TIMEOUT", "600")),
                    remaining() - 60)))
        extra["render_mrays_s"] = round(mrays, 3) if mrays else None
        extra["render_seconds"] = round(seconds, 2) if seconds else None
        print(json.dumps(result), flush=True)
    if os.environ.get("RLS_BENCH_SCALING", "1") == "1" and remaining() > 180:
        # Scaling runs BEFORE refract: its CPU-mesh programs are cached and
        # cheap, while the refract child pays a long remote compile when the
        # cache is cold (the depth-3 glass program exceeded an 1100 s child
        # budget once) — refract must be the only extra a pathological
        # compile can cost.
        extra["scaling_vs_1dev"] = bench_scaling(
            budget=int(min(float(os.environ.get("RLS_BENCH_SCALING_TIMEOUT",
                                                "600")),
                           remaining() - 60)))
        print(json.dumps(result), flush=True)
    if os.environ.get("RLS_BENCH_REFRACT", "1") == "1" and remaining() > 240:
        refr_mrays, refr_seconds = _bench_subprocess(
            "--refract-bench",
            int(min(float(os.environ.get("RLS_BENCH_REFRACT_TIMEOUT",
                                         "600")),
                    remaining() - 60)))
        extra["refract512_mrays_s"] = (round(refr_mrays, 3)
                                       if refr_mrays else None)
        extra["refract512_seconds"] = (round(refr_seconds, 2)
                                       if refr_seconds else None)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--render-bench":
        bench_render()
    elif len(sys.argv) > 1 and sys.argv[1] == "--refract-bench":
        bench_refract()
    else:
        main()
