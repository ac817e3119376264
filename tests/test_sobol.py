"""Owen-scrambled Sobol (0,2) sampler (core/rng.py).

The renderer keys every camera-level integral's samples on (pixel, purpose)
and indexes them aa*count + k, so one pixel's whole AA^2 x n^2 budget is one
jointly-stratified sequence — the host sampler's 'sample counts multiply'
behaviour (SURVEY §2.3 AiSampler). These tests pin the net properties that
give that variance behaviour.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rlshaders_tpu.core import rng


@pytest.mark.parametrize("seed", [0, 1, 7, 12345, 0xDEADBEEF])
def test_net_property_16(seed):
    """First 16 points: one per 4x4 stratum, one per 16x1 and 1x16 column."""
    pts = np.asarray(rng.sobol2(jnp.arange(16), jnp.full(16, seed, jnp.uint32)))
    assert len({(int(p[0] * 4), int(p[1] * 4)) for p in pts}) == 16
    assert len({int(p[0] * 16) for p in pts}) == 16
    assert len({int(p[1] * 16) for p in pts}) == 16
    assert (pts >= 0).all() and (pts < 1).all()


@pytest.mark.parametrize("block", [0, 1, 5, 8])
def test_aligned_block_is_net(block):
    """Any aligned block of 4 indices is a (0,2,2)-net: one per quadrant.
    This is what makes each AA lane's 4 light samples stratified while the
    pixel's union stays a sequence prefix."""
    idx = jnp.arange(block * 4, block * 4 + 4)
    pts = np.asarray(rng.sobol2(idx, jnp.full(4, 42, jnp.uint32)))
    assert len({(int(p[0] * 2), int(p[1] * 2)) for p in pts}) == 4


def test_seeds_give_distinct_uniform_streams():
    """Different scramble seeds move every point (fresh realization) while
    each stream stays marginally uniform. NB: same-index points of two
    scrambles stay dyadically related (Owen preserves nested intervals), so
    per-index Pearson correlation is NOT expected to vanish — only the seed-
    averaged pairing is unbiased; what must hold is per-stream uniformity."""
    a = np.asarray(rng.sobol2(jnp.arange(256), jnp.full(256, 1, jnp.uint32)))
    b = np.asarray(rng.sobol2(jnp.arange(256), jnp.full(256, 2, jnp.uint32)))
    assert np.abs(a - b).max() > 0.1  # genuinely different realizations
    for pts in (a, b):
        assert abs(pts.mean() - 0.5) < 0.03
        # 256 points, one per 1/256 column in each dim (net property)
        assert len({int(x * 256) for x in pts[:, 0]}) == 256
        assert len({int(y * 256) for y in pts[:, 1]}) == 256
    # seed-pair correlations average out (sign varies with the pair)
    cs = []
    for s in range(24):
        c = np.asarray(rng.sobol2(jnp.arange(64), jnp.full(64, 100 + s, jnp.uint32)))
        d = np.asarray(rng.sobol2(jnp.arange(64), jnp.full(64, 200 + s, jnp.uint32)))
        cs.append(np.corrcoef(c[:, 0], d[:, 0])[0, 1])
    assert abs(np.mean(cs)) < 0.3


def test_flat_and_rep_layouts_agree():
    """sobol2_flat row c*N+i and sobol2_rep row i*S+c are the same point:
    lane i's c-th sample with global index aa[i]*S + c."""
    pix = jnp.array([3, 9, 27], jnp.int32)
    aa = jnp.array([0, 1, 2], jnp.int32)
    s, salt, purpose = 4, 99, 101 << 8
    uf = np.asarray(rng.sobol2_flat(pix, aa, s, purpose, salt))
    ur = np.asarray(rng.sobol2_rep(pix, aa, s, purpose, salt))
    n = 3
    for i in range(n):
        for c in range(s):
            assert np.allclose(uf[c * n + i], ur[i * s + c])
    # matches a direct evaluation
    direct = np.asarray(
        rng.sobol2(
            jnp.uint32(1 * s + 2),
            rng._stream_seed(jnp.array([9], jnp.int32), purpose, jnp.uint32(salt)),
        )
    )[0]
    assert np.allclose(uf[2 * n + 1], direct)


def test_variance_beats_iid():
    """Integrating x*y over a 36-point per-pixel budget (aa=3, n=2 squared):
    the jointly-stratified estimator's RMSE must beat iid uniforms by >2x."""
    errs_s, errs_r = [], []
    idx = jnp.arange(36)
    for s in range(128):
        p = np.asarray(rng.sobol2(idx, jnp.full(36, 1000 + s, jnp.uint32)))
        errs_s.append((p[:, 0] * p[:, 1]).mean() - 0.25)
        q = np.random.RandomState(s).rand(36, 2)
        errs_r.append((q[:, 0] * q[:, 1]).mean() - 0.25)
    rmse_s = float(np.sqrt(np.mean(np.square(errs_s))))
    rmse_r = float(np.sqrt(np.mean(np.square(errs_r))))
    assert rmse_s * 2.0 < rmse_r, (rmse_s, rmse_r)
