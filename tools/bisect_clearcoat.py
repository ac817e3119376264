"""Bisect harness for the clearcoat-ON bench collapse (RESOLVED).

Root cause (see docs/perf.md "rank-0 params live in host memory"): the
clearcoat-on program referenced 40 rank-0 jit parameters (Python-float
material knobs), which XLA:TPU places in HOST memory (S(6)); each
referencing fusion pays a host-memory DMA per execution on this backend.
Broadcasting the params to (n,) lanes took the clearcoat-ON step from
0.2807 to 0.0091 s/iter at 512x512x8spp — within 7% of clearcoat-off.
bench.py now lane-broadcasts all params; this tool remains as the timing
harness (reduced 3-scalar outputs keep the ~1.6 GB tunnel fetch of raw
sampler outputs out of the measurement — never time raw V3 frame fetches).

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
