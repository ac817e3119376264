"""Multi-chip scaling: data-parallel sharding over a jax.sharding.Mesh.

Per SURVEY.md section 2.2 the workload's one natural parallel axis is the
pixel/path batch; scale-out is `shard_map` of the shading pipeline over a
device mesh with XLA collectives over ICI. We expose:

* `make_mesh(n)` — a ("dp", "sp") mesh: dp shards pixels, sp shards the
  per-pixel sample axis (useful when frames are small but spp is deep).
* `sharded_shade_step(...)` — the flagship Disney shading step pjit-sharded
  over both axes, with the per-device partial framebuffers reduced by a
  `psum` over "sp" — the framebuffer-assembly collective the survey calls
  out (SURVEY.md section 2.2: "psum/all_gather only for framebuffer
  assembly").

Scene data (materials, light tables, texture stack, BVH/cluster arrays) is
small and replicated; ray/hit/throughput SoA buffers are sharded.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bsdf import disney
from ..core import rng


def make_mesh(n_devices: int | None = None, sp: int = 2) -> Mesh:
    """Build a ("dp", "sp") mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    sp = sp if n % sp == 0 and n >= sp else 1
    dp = n // sp
    return Mesh(np.asarray(devs).reshape(dp, sp), ("dp", "sp"))


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
    "sp" (each sp-shard computes spp/|sp| samples and the mean is a psum)."""
    from jax.experimental.shard_map import shard_map

    sp = mesh.shape["sp"]
    spp_local = max(spp // sp, 1)

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
