"""Bisect the clearcoat-ON bench collapse (round-2 finding).

Measured on the real chip with reduced (3-scalar) outputs:
  clearcoat-OFF step: 0.72 Gsamples/s   (~0.046 s/iter at 1080p x 8 spp)
  clearcoat-ON  step: 0.103 Gsamples/s  (~0.32 s/iter) -- ~7x slower.
(An earlier 18x reading via 200 MB raw-frame fetches was a measurement
artifact; bench.py now times the reduced program too.)

The GTR1 sampler itself is a handful of transcendentals (exp/log/sin/cos)
over the same lane count, which back-of-envelope costs ~0.03 s/iter on the
v5e VPU, so the slowdown is NOT arithmetic: suspect the mixture program's
fusion/spill behavior (extra live 132M-lane values around the two-sampler
`where` blend) or a scalarized pattern on this backend. NOTE the axon
tunnel gotcha: np.asarray of a 132M-lane V3 moves ~1.6 GB, so time whole
steps with small outputs, never raw sampler outputs.

Run (each jit compiles ~2-5 min on the remote axon compiler):
    python tools/bisect_clearcoat.py
Prints per-variant s/iter with a SMALL reduced output so the tunnel fetch
stays out of the measurement.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import rlshaders_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from rlshaders_tpu.core import rng

VARIANTS = {
    # full steps (the bench's own programs)
    "step_cc_on": lambda p, w, k: B.step(p, w, k, True),
    "step_cc_off": lambda p, w, k: B.step(p, w, k, False),
}


def reduced(f):
    # collapse the output to 3 scalars so the tunnel fetch is negligible
    def g(p, w, k):
        out = f(p, w, k)
        return jnp.stack([out.x.sum(), out.y.sum(), out.z.sum()])

    return g


def main():
    params, wo = B.make_scene_batch(0.8)
    key = rng.stream(0)
    for name, f in VARIANTS.items():
        fn = jax.jit(reduced(f))
        np.asarray(fn(params, wo, key))
        t0 = time.perf_counter()
        n_it = 5
        for i in range(n_it):
            out = fn(params, wo, rng.fold(key, i))
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n_it
        print(f"{name}: {dt:.4f} s/iter "
              f"({B.WIDTH * B.HEIGHT * B.SPP * 2 / dt / 1e9:.3f} Gsamples/s)")


if __name__ == "__main__":
    main()
