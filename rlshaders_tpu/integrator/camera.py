"""Perspective camera ray generation (persp_camera node equivalent).

Matches the Arnold camera model the testsuite scenes use
(testsuite/data/test_geo.ass:37-63): horizontal fov across the [-1,1] screen
window, row-vector camera-to-world matrix, optional thin-lens depth of field
(focus_distance / aperture_size), gaussian pixel filter via per-sample
weights.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vecmath import normalize
from ..scene.build import Camera


class CameraRays(NamedTuple):
    origin: jnp.ndarray   # (N, 3)
    direction: jnp.ndarray  # (N, 3)
    pixel: jnp.ndarray    # (N,) flat pixel index y*xres+x
    weight: jnp.ndarray   # (N,) legacy per-sample weight (1.0 with splatting)
    sub_xy: jnp.ndarray   # (N, 2) subpixel position in [0,1)^2


def generate(
    cam: Camera,
    key: jax.Array,
    aa_samples: int,
    filter_width: float = 2.0,
    xres: int | None = None,
    yres: int | None = None,
) -> CameraRays:
    """All camera rays for the frame: aa_samples^2 stratified per pixel.
    One compiled program (eager per-op dispatch on the tunneled TPU costs
    ~0.2s each; this used to be ~20 eager ops)."""
    import os as _os

    # RLS_APERTURE_SCALE: DOF calibration knob (Arnold aperture_size units
    # vs our lens-disk radius); RLS_CAM_SHIFT_{X,Y}: sub-pixel raster
    # calibration (pixels). All read HERE (not inside the jit) so env
    # changes retrace — exercised by tools/ calibration sweeps.
    ap_scale = float(_os.environ.get("RLS_APERTURE_SCALE", "1"))
    shx = float(_os.environ.get("RLS_CAM_SHIFT_X", "0"))
    shy = float(_os.environ.get("RLS_CAM_SHIFT_Y", "0"))
    return _j_generate(
        cam.c2w, key, aa_samples=aa_samples,
        fov_deg=float(cam.fov_deg),
        focus_distance=float(cam.focus_distance),
        aperture_size=float(cam.aperture_size) * ap_scale,
        xres=int(xres or cam.xres), yres=int(yres or cam.yres),
        shx=shx, shy=shy,
        sobol=_os.environ.get("RLS_SOBOL_CAM", "0") == "1",
    )


@partial(
    jax.jit,
    static_argnames=(
        "aa_samples", "fov_deg", "focus_distance", "aperture_size",
        "xres", "yres", "shx", "shy", "sobol",
    ),
)
def _j_generate(c2w, key, *, aa_samples, fov_deg, focus_distance,
                aperture_size, xres, yres, shx=0.0, shy=0.0,
                sobol=True) -> CameraRays:
    from types import SimpleNamespace

    cam = SimpleNamespace(
        c2w=c2w, fov_deg=fov_deg, focus_distance=focus_distance,
        aperture_size=aperture_size,
    )
    n_sub = aa_samples * aa_samples
    n = xres * yres * n_sub

    px = jnp.arange(xres * yres, dtype=jnp.int32)
    ix = (px % xres).astype(jnp.float32)
    iy = (px // xres).astype(jnp.float32)

    # per-pixel Owen-Sobol subpixel positions: AA lane a takes sequence
    # point a of the pixel's (0,2) stream — jointly stratified with better
    # 2D discrepancy than an aa x aa jittered grid, and the same stream
    # family the in-shader samplers extend (core/rng.py)
    def _pix_sobol(purpose):
        salt = jax.random.bits(jax.random.fold_in(key, 9), (), jnp.uint32)
        seed = jnp.broadcast_to(
            rng._stream_seed(px, purpose, salt)[:, None],
            (xres * yres, n_sub),
        )
        idx = jnp.broadcast_to(
            jnp.arange(n_sub, dtype=jnp.uint32)[None, :],
            (xres * yres, n_sub),
        )
        return rng.sobol2(idx.reshape(-1), seed.reshape(-1)).reshape(
            xres * yres, n_sub, 2
        )

    # Subpixel positions use the aa x aa stratified grid, NOT a Sobol
    # prefix: aa^2 is not dyadic for odd aa, and the first aa^2 points of a
    # scrambled (0,2) sequence have a per-pixel-random barycenter offset of
    # ~±0.1 px. For CAMERA dims that offset is a spatial shift of the whole
    # pixel's estimate — gradient-proportional structured noise (measured:
    # the smooth-highlight goldens 0003/0008/0009 regressed 14-19% with
    # sobol camera dims while texture-noisy cases improved; 0008's error was
    # 99.99% edge pixels). In-shader integrals keep the Sobol streams: their
    # lanes estimate the SAME integral, where prefix imbalance is ordinary
    # variance, not displacement. RLS_SOBOL_CAM=1 re-enables for A/B.
    if sobol:
        sub_uv = _pix_sobol(1)
        ox = sub_uv[..., 0]
        oy = sub_uv[..., 1]
    else:
        sub = jnp.arange(n_sub, dtype=jnp.float32)
        sx = jnp.mod(sub, aa_samples)
        sy = jnp.floor(sub / aa_samples)
        jitter = jax.random.uniform(key, (xres * yres, n_sub, 2))
        ox = (sx[None, :] + jitter[..., 0]) / aa_samples
        oy = (sy[None, :] + jitter[..., 1]) / aa_samples

    # the gaussian pixel filter is applied by cross-pixel splatting in
    # render() (Arnold filter semantics); samples carry their subpixel
    # position instead of a weight
    w = jnp.ones_like(ox)

    x = (ix[:, None] + ox + shx) / xres * 2.0 - 1.0
    y = 1.0 - (iy[:, None] + oy + shy) / yres * 2.0
    aspect = yres / xres

    tanf = jnp.tan(jnp.deg2rad(cam.fov_deg) * 0.5)
    dir_cam = jnp.stack(
        [x * tanf, y * tanf * aspect, -jnp.ones_like(x)], axis=-1
    )  # (P, S, 3)

    m = cam.c2w
    right, up, back = m[0, :3], m[1, :3], m[2, :3]
    pos = m[3, :3]
    d_world = (
        dir_cam[..., 0:1] * right + dir_cam[..., 1:2] * up + dir_cam[..., 2:3] * back
    )
    d_world = normalize(d_world)

    o = jnp.broadcast_to(pos, d_world.shape)
    if cam.aperture_size > 0.0:
        if sobol:
            u = _pix_sobol(2)  # lens samples: independently-scrambled pad
        else:
            k1, _ = jax.random.split(jax.random.fold_in(key, 7))
            u = jax.random.uniform(k1, (xres * yres, n_sub, 2))
        r = jnp.sqrt(u[..., 0]) * cam.aperture_size
        phi = u[..., 1] * 2.0 * jnp.pi
        lens = (r * jnp.cos(phi))[..., None] * right + (r * jnp.sin(phi))[
            ..., None
        ] * up
        # focal point along the original ray
        cos_axis = -jnp.sum(d_world * back, axis=-1, keepdims=True)
        tf = cam.focus_distance / jnp.maximum(cos_axis, 1e-6)
        focal = o + d_world * tf
        o = o + lens
        d_world = normalize(focal - o)

    pixel = jnp.repeat(px, n_sub)
    return CameraRays(
        origin=o.reshape(n, 3),
        direction=d_world.reshape(n, 3),
        pixel=pixel,
        weight=w.reshape(n),
        sub_xy=jnp.stack([ox, oy], axis=-1).reshape(n, 2),
    )
