"""Unit tests for core math (counterpart of reference rlUtil.h/cpp semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlshaders_tpu.core import frame as fr
from rlshaders_tpu.core import rng
from rlshaders_tpu.core import vecmath as vm


def test_normalize_safe():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(n[0]), [0.6, 0.0, 0.8], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[1]), [0.0, 0.0, 0.0], atol=1e-6)


def test_reflect_matches_reference_convention():
    # reflect(i, n) = 2|i.n| n - i: equals the mirror reflection when i.n > 0
    i = vm.normalize(jnp.array([0.3, 0.4, 0.8]))
    n = jnp.array([0.0, 0.0, 1.0])
    r1 = vm.reflect(i, n)
    np.testing.assert_allclose(
        np.asarray(r1), np.asarray(i * jnp.array([-1.0, -1.0, 1.0])), atol=1e-5
    )
    # unit length preserved for unit inputs
    np.testing.assert_allclose(float(vm.length(r1)), 1.0, atol=1e-5)


def test_spherical_direction_roundtrip():
    cos_t = jnp.array([0.9, 0.2, -0.5])
    phi = jnp.array([0.3, 2.0, 5.0])
    d = vm.spherical_direction(cos_t, phi)
    np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[..., 2]), np.asarray(cos_t), atol=1e-6)


def test_concentric_disk_inside_unit_disk_and_area_uniform():
    key = rng.stream(0)
    u = jax.random.uniform(key, (20000, 2))
    p = vm.concentric_disk_sample(u[:, 0], u[:, 1])
    r2 = np.asarray(p[:, 0] ** 2 + p[:, 1] ** 2)
    assert r2.max() <= 1.0 + 1e-5
    # Uniform over the disk: fraction inside radius 1/sqrt(2) should be ~0.5
    frac = (r2 < 0.5).mean()
    assert abs(frac - 0.5) < 0.02
    # Degenerate center input maps to origin
    p0 = vm.concentric_disk_sample(jnp.array(0.5), jnp.array(0.5))
    np.testing.assert_allclose(np.asarray(p0), [0.0, 0.0], atol=1e-6)


def test_cosine_hemisphere_mean_cos():
    key = rng.stream(1)
    u = jax.random.uniform(key, (40000, 2))
    d = vm.cosine_sample_hemisphere(u[:, 0], u[:, 1])
    assert np.asarray(d[:, 2]).min() >= 0.0
    # E[cos] under cosine-weighted sampling = 2/3
    assert abs(np.asarray(d[:, 2]).mean() - 2.0 / 3.0) < 0.01


@pytest.mark.parametrize(
    "n",
    [
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
        [0.3, -0.5, 0.81],
    ],
)
def test_frame_orthonormal(n):
    nv = vm.normalize(jnp.array(n))
    f = fr.build_frame_polar(nv)
    for a, b in [(f.u, f.v), (f.u, f.n), (f.v, f.n)]:
        assert abs(float(vm.dot(a, b))) < 1e-5
    for a in (f.u, f.v, f.n):
        np.testing.assert_allclose(float(vm.length(a)), 1.0, atol=1e-5)
    # right-handed: u x v = n
    np.testing.assert_allclose(
        np.asarray(vm.cross(f.u, f.v)), np.asarray(f.n), atol=1e-5
    )


def test_frame_roundtrip():
    nv = vm.normalize(jnp.array([0.2, 0.7, 0.4]))
    f = fr.build_frame_polar(nv)
    w = vm.normalize(jnp.array([0.5, -0.4, 0.77]))
    w2 = fr.to_world(f, fr.to_local(f, w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)


def test_stratified_samples_cover_strata():
    key = rng.stream(2)
    s = rng.stratified2(key, (), 3)  # (9, 2)
    assert s.shape == (9, 2)
    sx = np.floor(np.asarray(s[:, 0]) * 3).astype(int)
    sy = np.floor(np.asarray(s[:, 1]) * 3).astype(int)
    assert sorted(zip(sx.tolist(), sy.tolist())) == sorted(
        [(i, j) for j in range(3) for i in range(3)]
    )


def test_luminance_rec709():
    assert abs(float(vm.luminance(jnp.array([1.0, 1.0, 1.0]))) - 1.0) < 1e-5


def test_oren_nayar_full_model_properties():
    """The full ON'94 direct term (r5 default; docs/fidelity.md): exactly
    Lambert at sigma=0, non-negative, and energy-bounded at sigma=1."""
    import jax.numpy as jnp

    from rlshaders_tpu.bsdf import orennayar as on
    from rlshaders_tpu.core.vec3 import V3

    rng = np.random.default_rng(3)
    n = 4096
    u1, u2 = rng.random(n), rng.random(n)
    r = np.sqrt(u1)
    ph = 2 * np.pi * u2
    wi = np.stack([r * np.cos(ph), r * np.sin(ph), np.sqrt(1 - u1)], 1)
    wiv = V3(*[jnp.asarray(wi[:, i], jnp.float32) for i in range(3)])
    t = np.radians(40.0)
    wov = V3(jnp.full(n, np.sin(t), jnp.float32), jnp.zeros(n, jnp.float32),
             jnp.full(n, np.cos(t), jnp.float32))
    f0 = np.asarray(on.eval_brdf(on.make_params(jnp.zeros(n)), wov, wiv))
    np.testing.assert_allclose(f0, wi[:, 2] / np.pi, atol=1e-6)
    f1 = np.asarray(on.eval_brdf(on.make_params(jnp.ones(n)), wov, wiv))
    assert (f1 >= 0).all() and np.isfinite(f1).all()
    albedo = float((f1 / np.maximum(wi[:, 2] / np.pi, 1e-9)).mean())
    assert 0.5 < albedo < 1.0, albedo
