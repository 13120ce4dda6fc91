"""Golden tests for SE(2) geometry vs straightforward NumPy math."""

import jax.numpy as jnp
import numpy as np
import pytest

from srrg2_laser_slam_2d_tpu.utils import geometry as g


def np_v2t(v):
    x, y, t = v
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, x], [s, c, y], [0, 0, 1]], np.float64)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_v2t_t2v_roundtrip(rng):
    v = rng.uniform(-3, 3, size=(32, 3)).astype(np.float32)
    v[:, 2] = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, size=32)
    T = g.v2t(jnp.asarray(v))
    back = g.t2v(T)
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_compose_matches_matrix_product(rng):
    a = rng.uniform(-2, 2, size=3).astype(np.float32)
    b = rng.uniform(-2, 2, size=3).astype(np.float32)
    got = np.asarray(g.compose(jnp.asarray(a), jnp.asarray(b)))
    want = np_v2t(a) @ np_v2t(b)
    np.testing.assert_allclose(np_v2t(got), want, atol=1e-5)


def test_inverse(rng):
    a = rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    ident = np.asarray(g.compose(jnp.asarray(a), g.inverse(jnp.asarray(a))))
    np.testing.assert_allclose(ident, np.zeros_like(a), atol=1e-5)


def test_relative(rng):
    a = rng.uniform(-2, 2, size=3).astype(np.float32)
    b = rng.uniform(-2, 2, size=3).astype(np.float32)
    rel = g.relative(jnp.asarray(a), jnp.asarray(b))
    recomposed = np.asarray(g.compose(jnp.asarray(a), rel))
    np.testing.assert_allclose(np_v2t(recomposed), np_v2t(b), atol=1e-5)


def test_transform_points(rng):
    pose = np.array([1.0, -2.0, 0.7], np.float32)
    pts = rng.uniform(-5, 5, size=(16, 2)).astype(np.float32)
    got = np.asarray(g.transform_points(jnp.asarray(pose), jnp.asarray(pts)))
    T = np_v2t(pose)
    want = (T[:2, :2] @ pts.T).T + T[:2, 2]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate_vectors_preserves_norm(rng):
    pose = np.array([5.0, 5.0, 1.2], np.float32)
    vecs = rng.normal(size=(16, 2)).astype(np.float32)
    got = np.asarray(g.rotate_vectors(jnp.asarray(pose), jnp.asarray(vecs)))
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), np.linalg.norm(vecs, axis=1), atol=1e-5
    )


def test_t2tqxyzw():
    v = jnp.array([1.0, 2.0, np.pi / 2])
    out = np.asarray(g.t2tqxyzw(v))
    np.testing.assert_allclose(out[:3], [1, 2, 0], atol=1e-6)
    np.testing.assert_allclose(out[5], np.sin(np.pi / 4), atol=1e-6)
    np.testing.assert_allclose(out[6], np.cos(np.pi / 4), atol=1e-6)
