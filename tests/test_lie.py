import jax
import jax.numpy as jnp
import numpy as np
import pytest

from direct_stereo_slam_tpu.geometry import lie

pytestmark = pytest.mark.smoke


def rand_tangent(key, scale=1.0, n=()):
    return jax.random.normal(key, n + (6,)) * scale


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    xi = rand_tangent(key, 0.5, (32,))
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-3)
    # re-exponentiating must reproduce the transform tightly (f32)
    T2 = lie.se3_exp(xi2)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=1e-5)


def test_exp_small_angle():
    xi = jnp.array([1e-10, 0, 0, 1e-10, 0, 0], dtype=jnp.float32)
    T = lie.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, 0.5])
    axis /= np.linalg.norm(axis)
    w = jnp.array(axis * (np.pi - 1e-4), dtype=jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)


def test_so3_log_near_pi_zero_component_mixed_signs():
    """Axis sign recovery near theta=pi must anchor on the largest |axis|
    component: an axis with a ~0 x-component and mixed-sign y/z used to
    reconstruct with the wrong relative sign (rotation error ~2.8)."""
    cases = [
        np.array([0.0, 1.0, -1.0]),
        np.array([0.0, -1.0, 1.0]),
        np.array([1e-5, 0.7, -0.7]),
        np.array([-1.0, 0.0, 1.0]),
        np.array([1.0, -1.0, 0.0]),
        np.array([0.0, 0.0, -1.0]),
    ]
    for axis in cases:
        axis = axis / np.linalg.norm(axis)
        for eps in (1e-3, 5e-3, 9e-3):
            w = jnp.array(axis * (np.pi - eps), dtype=jnp.float32)
            R = lie.so3_exp(w)
            R2 = lie.so3_exp(lie.so3_log(R))
            np.testing.assert_allclose(
                np.asarray(R2), np.asarray(R), atol=2e-3,
                err_msg=f"axis={axis}, eps={eps}")


def test_inverse_compose():
    key = jax.random.PRNGKey(1)
    xi = rand_tangent(key, 0.5)
    T = lie.se3_exp(xi)
    I = T @ lie.se3_inverse(T)
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_rotation_orthonormal():
    key = jax.random.PRNGKey(2)
    xi = rand_tangent(key, 2.0, (8,))
    T = lie.se3_exp(xi)
    R = np.asarray(T[..., :3, :3])
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_transform_points():
    key = jax.random.PRNGKey(7)
    T = lie.se3_exp(rand_tangent(key, 0.6))
    pts = jax.random.normal(jax.random.PRNGKey(8), (5, 3))
    out = lie.transform_points(T, pts)
    manual = np.asarray(pts) @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-5)


def test_pure_rotation_z():
    T = lie.se3_exp(jnp.array([0.0, 0, 0, 0, 0, np.pi / 2], dtype=jnp.float32))
    out = lie.transform_points(T, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 1.0, 0.0], atol=1e-5)


def test_adjoint_identity():
    """Adj(T) xi == log(T exp(xi) T^-1) to first order."""
    key = jax.random.PRNGKey(3)
    T = lie.se3_exp(rand_tangent(key, 0.8))
    xi = rand_tangent(jax.random.PRNGKey(4), 1e-4)
    lhs = lie.se3_adjoint(T) @ xi
    rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.se3_inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_log_tiny_rotation_no_nan():
    """Regression: trace==3.0 in f32 with nonzero antisymmetric part used to
    produce NaN/inf via (1-cos) underflow in the V-inverse coefficient."""
    delta = np.eye(4, dtype=np.float32)
    delta[0, 1] = 8.12189537e-05
    delta[1, 0] = -8.12268700e-05
    delta[0, 2] = -4.16595321e-05
    delta[2, 0] = 4.16670591e-05
    delta[1, 2] = 1.12816444e-04
    delta[2, 1] = -1.12835049e-04
    delta[0, 3] = 3.12426477e-04
    delta[1, 3] = -1.12885993e-03
    delta[2, 3] = 1.43307447e-03
    out = np.asarray(lie.se3_log(jnp.asarray(delta)))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[:3], delta[:3, 3], atol=1e-6)


def test_exp_log_small_angles_sweep():
    for theta in [1e-6, 1e-5, 1e-4, 1e-3, 5e-3, 2e-2, 0.1]:
        xi = jnp.array([0.1, -0.2, 0.3, theta, theta * 0.5, -theta], dtype=jnp.float32)
        out = np.asarray(lie.se3_log(lie.se3_exp(xi)))
        assert np.all(np.isfinite(out)), theta
        np.testing.assert_allclose(out, np.asarray(xi), atol=1e-5)
