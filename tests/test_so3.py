"""SO(3) numerics parity tests.

Behavioral port of the reference's tests/test_so3.py with the same shapes and
tolerances (the numeric parity contract per BASELINE.md), plus the
singularity cases the reference skips (its log map is unsafe there,
reference so3.py:161) and golden cross-checks against the reference torch
formulas where they are well-conditioned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.geometry import so3

BSZ, L = 32, 100


@pytest.fixture
def rotations():
    return so3.uniform(jax.random.key(0), (BSZ, L))


def test_tensor_trace(rotations):
    assert so3.tensor_trace(rotations).shape == (BSZ, L)


def test_log_rotmat_is_skew(rotations):
    s = so3.log_rotmat(rotations)
    assert s.shape == (BSZ, L, 3, 3)
    np.testing.assert_allclose(s, -jnp.swapaxes(s, -1, -2), atol=1e-6)


def test_vee_shape(rotations):
    v = so3.vee(so3.log_rotmat(rotations))
    assert v.shape == (BSZ, L, 3)


def test_exp_log_roundtrip(rotations):
    """exp(log R) == R to |diff| < 1e-4 — reference tests/test_so3.py:44-62.

    Unlike the reference we do NOT skip near-singular rotations: the
    quaternion-based log map is safe at theta ~ 0 and theta ~ pi.
    """
    r = rotations
    r_recon = so3.exp_skew_symmetric_mat(so3.log_rotmat(r))
    diff = jnp.abs(r - r_recon).sum(axis=(-1, -2))
    assert float(diff.max()) < 1e-4


def test_exp_log_roundtrip_near_singularities():
    # theta ~ 0
    v_small = jnp.array([[1e-6, -2e-7, 3e-7], [0.0, 0.0, 0.0]])
    r = so3.vector_to_rotation_matrix(v_small)
    r_recon = so3.exp_skew_symmetric_mat(so3.log_rotmat(r))
    np.testing.assert_allclose(r, r_recon, atol=1e-5)

    # theta ~ pi around various axes
    axes = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.6, 0.8, 0.0]])
    v_pi = axes * (jnp.pi - 1e-4)
    r = so3.vector_to_rotation_matrix(v_pi)
    r_recon = so3.exp_skew_symmetric_mat(so3.log_rotmat(r))
    np.testing.assert_allclose(r, r_recon, atol=1e-3)


def test_uniform_is_rotation(rotations):
    r = rotations
    assert r.shape == (BSZ, L, 3, 3)
    prod = jnp.einsum("blij,bljk->blik", jnp.swapaxes(r, -1, -2), r)
    eye = jnp.broadcast_to(jnp.eye(3), prod.shape)
    np.testing.assert_allclose(prod, eye, rtol=1e-5, atol=1e-5)
    det = jnp.linalg.det(r)
    np.testing.assert_allclose(det, jnp.ones_like(det), atol=1e-5)


def test_scale_rot_stays_rotation(rotations):
    k = jax.random.uniform(jax.random.key(1), (BSZ,))
    r_scaled = so3.scale_rot(rotations, k)
    assert r_scaled.shape == (BSZ, L, 3, 3)
    prod = jnp.einsum("blij,bljk->blik", jnp.swapaxes(r_scaled, -1, -2), r_scaled)
    eye = jnp.broadcast_to(jnp.eye(3), prod.shape)
    np.testing.assert_allclose(prod, eye, rtol=1e-5, atol=1e-5)


def test_scale_rot_semantics():
    """scale_rot(R, k) rotates by k * theta about the same axis."""
    axis = jnp.array([0.0, 0.0, 1.0])
    theta = 1.2
    r = so3.vector_to_rotation_matrix((axis * theta)[None, None])
    r_half = so3.scale_rot(r, jnp.array([0.5]))
    v = so3.rotation_matrix_to_vector(r_half)[0, 0]
    np.testing.assert_allclose(v, axis * theta * 0.5, atol=1e-6)

    # k=0 -> identity, k=1 -> same rotation
    np.testing.assert_allclose(
        so3.scale_rot(r, jnp.array([0.0]))[0, 0], jnp.eye(3), atol=1e-6
    )
    np.testing.assert_allclose(so3.scale_rot(r, jnp.array([1.0])), r, atol=1e-6)


def test_hat_vee_inverse():
    v = jax.random.normal(jax.random.key(2), (BSZ, L, 3))
    np.testing.assert_allclose(so3.vee(so3.hat(v)), v, atol=1e-7)


def test_golden_vs_torch_reference_formulas():
    """Cross-check the log/exp maps against the reference torch formulas
    (so3.py:146-162, 219-237) on well-conditioned rotations."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    # random rotations with theta away from {0, pi}
    axis = rng.normal(size=(64, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0.2, np.pi - 0.2, size=(64, 1))
    v = (axis * theta).reshape(8, 8, 3)

    r = so3.vector_to_rotation_matrix(jnp.asarray(v, dtype=jnp.float32))

    # torch reference log: theta/(2 sin theta) (R - R^T)
    rt = torch.tensor(np.asarray(r), dtype=torch.float64)
    tr = rt.diagonal(offset=0, dim1=-2, dim2=-1).sum(dim=-1)
    th = torch.acos(((tr - 1) / 2).clamp(-1, 1))[..., None, None]
    s_ref = th / (2 * torch.sin(th)) * (rt - rt.transpose(-1, -2))

    s_ours = so3.log_rotmat(r)
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), atol=1e-4)

    # torch reference exp (Rodrigues) applied to our skew mats
    s64 = torch.tensor(np.asarray(s_ours), dtype=torch.float64)
    vx, vy, vz = s64[..., 2, 1], s64[..., 0, 2], s64[..., 1, 0]
    norm = torch.stack([vx, vy, vz], dim=-1).norm(dim=-1)[..., None, None]
    eye = torch.eye(3, dtype=torch.float64).expand_as(s64)
    r_ref = eye + s64 * torch.sin(norm) / norm + s64 @ s64 * (1 - torch.cos(norm)) / norm**2
    r_ours = so3.exp_skew_symmetric_mat(s_ours)
    np.testing.assert_allclose(np.asarray(r_ours), r_ref.numpy(), atol=1e-4)


def test_maps_are_jittable_and_batchable():
    f = jax.jit(lambda r: so3.exp_skew_symmetric_mat(so3.log_rotmat(r)))
    r = so3.uniform(jax.random.key(3), (4, 7))
    np.testing.assert_allclose(f(r), r, atol=1e-4)

    g = jax.vmap(so3.rotation_matrix_to_vector)
    assert g(r).shape == (4, 7, 3)


def test_gradients_finite_at_singularities():
    """The double-where sqrt-guard rule: gradients through the exp/log maps
    must be finite at EXACT zero rotation (a converged orientation head
    emits exact-zero vectors after bf16 underflow — two 4,000-step TPU
    training runs NaN'd on this before the guard)."""
    g = jax.grad(lambda v: so3.vector_to_rotation_matrix(v).sum())(jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(g)))

    g2 = jax.grad(
        lambda v: so3.vector_to_rotation_matrix(v).sum()
    )(jnp.full((3,), 1e-12))
    assert bool(jnp.all(jnp.isfinite(g2)))

    g3 = jax.grad(
        lambda r: so3.rotation_matrix_to_vector(r).sum()
    )(jnp.eye(3))
    assert bool(jnp.all(jnp.isfinite(g3)))

    # composed roundtrip at a generic point still differentiates correctly
    v0 = jnp.array([0.3, -0.2, 0.5])
    g4 = jax.grad(
        lambda v: so3.rotation_matrix_to_vector(
            so3.vector_to_rotation_matrix(v)
        ).sum()
    )(v0)
    np.testing.assert_allclose(np.asarray(g4), np.ones(3), atol=1e-4)
