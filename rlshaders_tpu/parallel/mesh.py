"""Multi-chip scaling: the REAL render pipeline sharded over a device mesh.

Per SURVEY.md section 2.2 the workload's one natural parallel axis is the
pixel/path batch: `render_sharded` shard_maps the full wavefront pipeline
(trace -> shade -> occlude -> reduce -> indirect families -> on-device
gaussian splat) over a ("dp",) mesh, with each device rendering its own set
of frame tiles and the per-device framebuffer shards combined by a `psum`
over ICI — the framebuffer-assembly collective the survey calls out.

Determinism: the per-tile RNG key is folded from the GLOBAL tile index
(`lax.axis_index("dp") * tiles_per_device + local_tile`), exactly matching
the single-device `wavefront.render` fold — so the sharded render equals the
single-device render to float-accumulation tolerance (tested in
tests/test_parallel.py on the 8-device CPU mesh).

Scene data (materials, light tables, texture stack, cluster arrays) is small
and replicated via closure capture; ray/hit/throughput SoA buffers are
sharded. `shade_step`/`sharded_shade_step` remain as the flagship-BSDF
microbenchmark exercising a second ("dp","sp") mesh axis with a pmean
collective over the sample axis.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..bsdf import disney
from ..core import rng


def make_mesh(n_devices: int | None = None, sp: int = 1) -> Mesh:
    """Build a device mesh: ("dp",) when sp == 1, else ("dp", "sp").

    Raises a clear error when fewer devices exist than requested — callers
    that need a virtual mesh must set
    XLA_FLAGS=--xla_force_host_platform_device_count=N (+ JAX_PLATFORMS=cpu)
    BEFORE jax initializes (see __graft_entry__.dryrun_multichip, which
    re-execs itself to do so).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh({n}) but only {len(devs)} devices visible; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count before jax init"
        )
    devs = devs[:n]
    if sp <= 1:
        return Mesh(np.asarray(devs), ("dp",))
    if n % sp != 0:
        raise ValueError(f"n_devices {n} not divisible by sp {sp}")
    return Mesh(np.asarray(devs).reshape(n // sp, sp), ("dp", "sp"))


def render_sharded(
    scene,
    accel,
    mesh: Mesh,
    seed: int = 0,
    tile_pixels: int = 16384,
    aa_samples: int | None = None,
    xres: int | None = None,
    yres: int | None = None,
):
    """Render the frame with tiles data-parallel over mesh axis "dp".

    Same output dict as wavefront.render: {"RGBA": (H,W,3), aov: ...}.
    """
    from jax import shard_map

    from ..integrator import camera as cameramod
    from ..integrator import splat as splatmod
    from ..integrator import wavefront

    opts = scene.options
    aa = aa_samples or opts.aa_samples
    xres = xres or opts.xres
    yres = yres or opts.yres
    n_pix = xres * yres
    n_sub = aa * aa
    n_rays = n_pix * n_sub
    fw = float(opts.filter_width)

    key = rng.stream(opts.aa_seed + seed)
    cam_rays = cameramod.generate(
        scene.camera, rng.fold(key, 77), aa, opts.filter_width, xres, yres
    )

    tr = wavefront.TileRenderer(scene, accel, aa, xres=xres)
    dp = mesh.shape["dp"]
    tile_rays = min(tile_pixels * n_sub, n_rays)
    n_tiles = math.ceil(n_rays / tile_rays)
    n_tiles_p = math.ceil(n_tiles / dp) * dp
    total = n_tiles_p * tile_rays
    pad = total - n_rays

    def padto(a, cv=0.0):
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width, constant_values=cv)

    origin = padto(cam_rays.origin).reshape(n_tiles_p, tile_rays, 3)
    direction = padto(cam_rays.direction, 1.0).reshape(n_tiles_p, tile_rays, 3)
    pixel = padto(cam_rays.pixel, -1).reshape(n_tiles_p, tile_rays)
    weight = padto(cam_rays.weight).reshape(n_tiles_p, tile_rays)
    sub_xy = padto(cam_rays.sub_xy).reshape(n_tiles_p, tile_rays, 2)
    tiles_per_dev = n_tiles_p // dp

    names_box: list = []

    def body(sc, key, origin, direction, pixel, weight, sub_xy):
        # the device scene arrives as a replicated shard_map operand (not a
        # captured constant) so the same buffers serve every device
        tr.sc = sc
        di = jax.lax.axis_index("dp")
        img = None
        ws = None
        for lt in range(tiles_per_dev):
            gt = di * tiles_per_dev + lt
            rays = cameramod.CameraRays(
                origin[lt], direction[lt], pixel[lt], weight[lt], sub_xy[lt]
            )
            rgb, aovs = tr.render_tile(rays, rng.fold(key, 1000 + gt))
            vals, names = splatmod.pack_aovs(rgb, aovs)
            names_box[:] = names
            im, w = splatmod.splat(vals, rays.pixel, rays.sub_xy, xres, yres, fw)
            img = im if img is None else img + im
            ws = w if ws is None else ws + w
        # framebuffer assembly: sharded partial framebuffers -> full frame
        img = jax.lax.psum(img, "dp")
        ws = jax.lax.psum(ws, "dp")
        return img, ws

    in_dp = P("dp") if "sp" not in mesh.shape else P("dp")
    sc_spec = jax.tree_util.tree_map(lambda _: P(), tr.sc)
    shard = shard_map(
        body,
        mesh=mesh,
        in_specs=(sc_spec, P(), in_dp, in_dp, in_dp, in_dp, in_dp),
        out_specs=(P(), P()),
        check_vma=False,
    )
    sc0 = tr.sc
    try:
        image, wsum = shard(sc0, key, origin, direction, pixel, weight, sub_xy)
    finally:
        tr.sc = sc0
    norm = jnp.maximum(wsum, 1e-12)[:, None]
    planes = splatmod.unpack_aovs(image / norm, names_box)
    out = {
        name: np.asarray(p, np.float32).reshape(yres, xres, 3)
        for name, p in planes.items()
    }
    out["__stats__"] = dict(tr.stats)
    return out


# ---------------------------------------------------------------------------
# Flagship-BSDF microbenchmark over a ("dp", "sp") mesh
# ---------------------------------------------------------------------------

def shade_step(params, wo, key, spp: int):
    """One Disney shading step over a sharded pixel batch: spec+diffuse MIS
    estimate averaged over the (sharded) sample axis."""
    n = wo.shape[0]
    u = jax.random.uniform(key, (n, spp, 4), dtype=jnp.float32)
    pb = disney.expand_sample_axis(params)
    wo_b = wo[:, None, :]

    wi_s = disney.sample_specular(pb, wo_b, u[..., 0], u[..., 1])
    f_s = disney.eval_specular_cos(pb, wo_b, wi_s)
    p_s = disney.pdf_specular(pb, wo_b, wi_s)
    p_sd = disney.pdf_diffuse(pb, wo_b, wi_s)
    w_s = p_s / jnp.maximum(p_s + p_sd, 1e-9)

    wi_d = disney.sample_diffuse(pb, wo_b, u[..., 2], u[..., 3])
    f_d = disney.eval_diffuse_cos(pb, wo_b, wi_d)
    p_d = disney.pdf_diffuse(pb, wo_b, wi_d)
    p_ds = disney.pdf_specular(pb, wo_b, wi_d)
    w_d = p_d / jnp.maximum(p_d + p_ds, 1e-9)

    est = (
        f_s * (w_s / jnp.maximum(p_s, 1e-9))[..., None]
        + f_d * (w_d / jnp.maximum(p_d, 1e-9))[..., None]
    )
    return est.mean(axis=1)


def sharded_shade_step(mesh: Mesh, params, wo, key, spp: int = 8):
    """pjit the shading step: pixels sharded over "dp", the sample axis over
    "sp" (each sp-shard computes spp/|sp| samples and the mean is a pmean)."""
    from jax import shard_map

    sp = mesh.shape.get("sp", 1)
    spp_local = max(spp // sp, 1)

    if "sp" not in mesh.shape:
        def local(params, wo, key):
            return shade_step(params, wo, key[0], spp_local)

        shard = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                jax.tree_util.tree_map(
                    lambda a: P("dp") if jnp.ndim(a) >= 1 else P(), params
                ),
                P("dp"),
                P(),
            ),
            out_specs=P("dp"),
            check_vma=False,
        )
        return shard(params, wo, key[None])

    def local(params, wo, key):
        i = jax.lax.axis_index("sp")
        k = jax.random.fold_in(key[0], i)
        part = shade_step(params, wo, k, spp_local)
        return jax.lax.pmean(part, axis_name="sp")

    shard = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(
                lambda a: P("dp") if jnp.ndim(a) >= 1 else P(), params
            ),
            P("dp"),
            P(),
        ),
        out_specs=P("dp"),
        check_vma=False,
    )
    return shard(params, wo, key[None])


def demo_batch(n: int):
    """A small Disney material batch for smoke/dryrun use."""
    x = jnp.linspace(0.05, 0.95, n)
    params = disney.make_params(
        base_color=jnp.stack(
            [0.8 * jnp.ones_like(x), 0.5 + 0.3 * x, jnp.full_like(x, 0.3)], -1
        ),
        roughness=x,
        metallic=0.5 * x,
        specular=0.8,
        sheen=0.3,
        subsurface=0.1,
    )
    t = 0.4 + 0.5 * x
    st = jnp.sqrt(1.0 - t * t)
    wo = jnp.stack([st, jnp.zeros_like(t), t], -1)
    return params, wo


DEMO_SCENE_ASS = """
options
{
 AA_samples 2
 xres 32
 yres 32
 GI_diffuse_depth 1
 GI_glossy_depth 1
 GI_diffuse_samples 1
 GI_glossy_samples 1
 GI_sss_samples 2
 GI_total_depth 4
 camera "cam"
}
persp_camera
{
 name cam
 fov 45
 matrix
 1 0 0 0
 0 0.7071 -0.7071 0
 0 0.7071 0.7071 0
 0 2.5 2.5 1
}
quad_light
{
 name keylight
 color 1 0.95 0.9
 intensity 40
 decay_type quadratic
 normalize on
 samples 2
 vertices 4 1 POINT
-1 3 1 1 3 1 1 3 -1 -1 3 -1
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
}
skydome_light
{
 name sky
 color 0.4 0.5 0.7
 intensity 0.4
 samples 1
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
}
rlGgx
{
 name mat_ggx
 Kd 0.4
 Kd_color 0.7 0.3 0.2
 Ks 0.6
 Ks_color 1 1 1
 roughness 0.3
 ior 1.5
}
standard
{
 name mat_floor
 Kd 0.8
 Kd_color 0.6 0.6 0.6
}
rlSkin
{
 name mat_skin
 sss_color 0.9 0.6 0.5
 sss_weight 1.0
 sss_scatter_dist 0.3 0.2 0.15
 specular_weight 0.4
 specular_roughness 0.4
 sheen_weight 0.2
 sheen_roughness 0.35
}
polymesh
{
 name cube
 nsides 6 1 UINT
4 4 4 4 4 4
 vidxs 24 1 UINT
0 1 3 2 4 6 7 5 0 4 5 1 2 3 7 6 0 2 6 4 1 5 7 3
 vlist 8 1 POINT
-0.5 0 -0.5 0.5 0 -0.5 -0.5 1 -0.5 0.5 1 -0.5 -0.5 0 0.5 0.5 0 0.5 -0.5 1 0.5 0.5 1 0.5
 shader "mat_ggx"
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
}
polymesh
{
 name blob
 nsides 6 1 UINT
4 4 4 4 4 4
 vidxs 24 1 UINT
0 1 3 2 4 6 7 5 0 4 5 1 2 3 7 6 0 2 6 4 1 5 7 3
 vlist 8 1 POINT
0.9 0 -0.3 1.5 0 -0.3 0.9 0.6 -0.3 1.5 0.6 -0.3 0.9 0 0.3 1.5 0 0.3 0.9 0.6 0.3 1.5 0.6 0.3
 shader "mat_skin"
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
}
polymesh
{
 name floor
 nsides 4
 vidxs 4 1 UINT
0 1 3 2
 vlist 4 1 POINT
-8 0 8 8 0 8 -8 0 -8 8 0 -8
 nlist 4 1 VECTOR
0 1 0 0 1 0 0 1 0 0 1 0
 nidxs 4 1 UINT
0 1 2 3
 shader "mat_floor"
 matrix
 1 0 0 0
 0 1 0 0
 0 0 1 0
 0 0 0 1
}
"""


def demo_scene(skin: bool = True):
    """Build a small self-contained scene (cube + skin blob + floor + quad
    light + sky) for dryruns and multi-device tests; returns (scene, accel).

    skin=True keeps the rlSkin blob so the SSS probe stage (integrator/sss)
    runs under shard_map; skin=False swaps the blob to the floor material for
    scaling sweeps where the SSS compile cost would dominate the budget."""
    import os
    import tempfile

    from ..accel import trace as tracemod
    from ..scene import build as buildmod

    src = DEMO_SCENE_ASS
    if not skin:
        src = src.replace('shader "mat_skin"', 'shader "mat_floor"')
    fd, path = tempfile.mkstemp(suffix=".ass")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(src)
        scene = buildmod.build(path)
    finally:
        os.unlink(path)
    accel = tracemod.build(scene.geometry)
    return scene, accel
