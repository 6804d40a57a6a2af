import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from monogs_dev_tpu.geometry import (
    se3_exp,
    se3_retract,
    so3_exp,
    so3_left_jacobian,
    projection_matrix,
    world_to_view,
    focal2fov,
    fov2focal,
    eval_sh,
    rgb_to_sh,
    sh_to_rgb,
)
from monogs_dev_tpu.geometry.sh import C0


class TestSO3:
    def test_identity(self):
        r = so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-7)

    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            theta = rng.normal(size=3)
            got = so3_exp(jnp.array(theta, jnp.float32))
            want = ScipyRot.from_rotvec(theta).as_matrix()
            np.testing.assert_allclose(got, want, atol=3e-4)  # float32 trig

    def test_small_angle(self):
        theta = jnp.array([1e-9, -1e-9, 1e-9])
        r = so3_exp(theta)
        assert np.all(np.isfinite(r))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-7)

    def test_orthonormal(self):
        r = so3_exp(jnp.array([0.3, -1.2, 2.0]))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert abs(float(jnp.linalg.det(r)) - 1.0) < 1e-5

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda t: so3_exp(t).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_pure_translation(self):
        tau = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        T = se3_exp(tau)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-7)

    def test_inverse_property(self):
        tau = jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3])
        T = se3_exp(tau)
        T_inv = se3_exp(-tau)
        np.testing.assert_allclose(T @ T_inv, np.eye(4), atol=1e-5)

    def test_left_jacobian_consistency(self):
        # exp([rho, theta]) translation = V(theta) @ rho
        rho = jnp.array([0.5, -1.0, 2.0])
        theta = jnp.array([0.2, 0.3, -0.1])
        V = so3_left_jacobian(theta)
        T = se3_exp(jnp.concatenate([rho, theta]))
        np.testing.assert_allclose(T[:3, 3], V @ rho, atol=1e-6)

    def test_retract(self):
        T0 = se3_exp(jnp.array([1.0, 0.0, 0.0, 0.0, 0.5, 0.0]))
        tau = jnp.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.02])
        T1 = se3_retract(tau, T0)
        np.testing.assert_allclose(T1, se3_exp(tau) @ T0, atol=1e-6)

    def test_grad_flows(self):
        T0 = jnp.eye(4)

        def f(tau):
            return (se3_retract(tau, T0)[:3, 3] ** 2).sum()

        g = jax.grad(f)(jnp.zeros(6))
        assert np.all(np.isfinite(g))


class TestProjection:
    def test_world_to_view(self):
        R = so3_exp(jnp.array([0.1, 0.2, 0.3]))
        t = jnp.array([1.0, 2.0, 3.0])
        T = world_to_view(R, t)
        p = jnp.array([0.5, -0.5, 2.0, 1.0])
        np.testing.assert_allclose((T @ p)[:3], R @ p[:3] + t, atol=1e-6)

    def test_projection_matrix_center(self):
        # a point on the optical axis projects to ndc (cx, cy) offset
        P = projection_matrix(0.01, 100.0, 320.0, 240.0, 500.0, 500.0, 640, 480)
        p = jnp.array([0.0, 0.0, 5.0, 1.0])
        clip = P @ p
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[0], (2 * 320.0 - 640) / 640, atol=1e-6)
        np.testing.assert_allclose(ndc[1], (2 * 240.0 - 480) / 480, atol=1e-6)

    def test_projection_pixel_mapping(self):
        # ndc -> pixel: ((ndc+1)*W-1)/2 should equal fx*x/z + cx - 0.5
        fx, fy, cx, cy, W, H = 520.9, 521.0, 325.1, 249.7, 640, 480
        P = projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H)
        p = jnp.array([0.3, -0.2, 2.5, 1.0])
        clip = P @ p
        ndc_x = clip[0] / clip[3]
        pix_x = ((ndc_x + 1.0) * W - 1.0) / 2.0
        np.testing.assert_allclose(pix_x, fx * 0.3 / 2.5 + cx - 0.5, rtol=1e-5)

    def test_fov_roundtrip(self):
        assert abs(fov2focal(focal2fov(500.0, 640), 640) - 500.0) < 1e-6


class TestSH:
    def test_dc_roundtrip(self):
        rgb = jnp.array([0.25, 0.5, 0.75])
        np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_degree0_constant(self):
        sh = jnp.zeros((5, 1, 3)).at[:, 0, :].set(jnp.array([1.0, 2.0, 3.0]))
        dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, np.tile([C0, 2 * C0, 3 * C0], (5, 1)), atol=1e-6)

    @pytest.mark.parametrize("degree", [1, 2, 3])
    def test_higher_degrees_finite_and_direction_dependent(self, degree):
        k = (degree + 1) ** 2
        sh = jax.random.normal(jax.random.PRNGKey(1), (4, k, 3)) * 0.3
        d1 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        d2 = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1))
        o1, o2 = eval_sh(degree, sh, d1), eval_sh(degree, sh, d2)
        assert np.all(np.isfinite(o1)) and np.all(np.isfinite(o2))
        assert not np.allclose(o1, o2)
