"""SO(3) numerics: exp/log maps, axis-angle conversions, geodesic scaling.

TPU-native re-design of the reference's `diffab_pytorch/so3.py:129-259`
(log_rotmat, exp_skew_symmetric_mat, vector<->matrix converters, scale_rot,
uniform).  Differences from the reference, by design:

  * The log map is computed through a unit-quaternion extraction (Shepperd's
    method) instead of theta/(2 sin theta) * (R - R^T), so it is numerically
    safe at theta ~ 0 AND theta ~ pi.  The reference leaves both singular
    (TODO at so3.py:161); its tests skip near-singular rotations
    (tests/test_so3.py:56-59).  Away from the singularities the two agree to
    well below the reference tolerance of 1e-4.
  * Everything is branchless (jnp.where), fully batched over arbitrary
    leading dims, and traceable under jit/vmap/scan — no data-dependent
    Python control flow (XLA requirement).
  * Uniform random rotations come from jax.random quaternions rather than
    scipy (reference so3.py:129-139); the distribution (Haar measure on
    SO(3)) is identical.

All functions accept arrays of shape (..., 3, 3) / (..., 3) with arbitrary
batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def tensor_trace(m: jax.Array) -> jax.Array:
    """Trace over the last two dims.  Reference: so3.py:142-143."""
    return jnp.trace(m, axis1=-2, axis2=-1)


def mat3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3x3 matrix product.

    NOTE: plain (b, L, 3, 3) dot_generals lower fine on TPU; only
    contractions with EXTRA broadcast dims between batch and the 3-vector
    (like IPA's per-head point transforms) degenerate into slow convs and
    need unrolling (see models/ipa.py frames_apply).  Benchmarked: the
    unrolled elementwise form is ~9% slower end-to-end here, so this stays
    a dot."""
    return a @ b


def hat(v: jax.Array) -> jax.Array:
    """Vector (..., 3) -> skew-symmetric matrix (..., 3, 3).

    Reference: vector_to_skew_symmetric_mat, so3.py:185-204.
    """
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(vx)
    rows = jnp.stack(
        [
            jnp.stack([zero, -vz, vy], axis=-1),
            jnp.stack([vz, zero, -vx], axis=-1),
            jnp.stack([-vy, vx, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vee(s: jax.Array) -> jax.Array:
    """Skew-symmetric matrix (..., 3, 3) -> vector (..., 3).

    Reference: skew_symmetric_mat_to_vector, so3.py:165-170.
    """
    return jnp.stack([s[..., 2, 1], s[..., 0, 2], s[..., 1, 0]], axis=-1)


# Aliases matching the reference API surface.
vector_to_skew_symmetric_mat = hat
skew_symmetric_mat_to_vector = vee


def matrix_to_quaternion(r: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), (w, x, y, z).

    Shepperd's method: four candidate extractions, the numerically best one
    (largest divisor) selected per element with jnp.where — robust for every
    rotation including theta ~ pi where the reference's log map breaks.
    Returned quaternions have w >= 0.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]

    # Four squared-magnitude candidates (each >= 0 up to fp error).
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions (unnormalized), one per pivot.
    def _safe(x):
        return jnp.where(x > _EPS, x, 1.0)

    # Gradient-safe sqrt: a candidate with magnitude ~ 0 is never SELECTED
    # by the argmax below (the four magnitudes sum to 4, so the best is
    # always >= 1), but every candidate still participates in the backward
    # pass, where an unguarded sqrt(0) contributes 0 * inf = NaN through
    # the untaken where branch — the same double-where rule as
    # exp_skew_symmetric_mat.
    sw = jnp.sqrt(_safe(qw2))
    sx = jnp.sqrt(_safe(qx2))
    sy = jnp.sqrt(_safe(qy2))
    sz = jnp.sqrt(_safe(qz2))

    q_w = jnp.stack(
        [sw, (m21 - m12) / _safe(sw), (m02 - m20) / _safe(sw), (m10 - m01) / _safe(sw)],
        axis=-1,
    )
    q_x = jnp.stack(
        [(m21 - m12) / _safe(sx), sx, (m01 + m10) / _safe(sx), (m02 + m20) / _safe(sx)],
        axis=-1,
    )
    q_y = jnp.stack(
        [(m02 - m20) / _safe(sy), (m01 + m10) / _safe(sy), sy, (m12 + m21) / _safe(sy)],
        axis=-1,
    )
    q_z = jnp.stack(
        [(m10 - m01) / _safe(sz), (m02 + m20) / _safe(sz), (m12 + m21) / _safe(sz), sz],
        axis=-1,
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)[..., None]

    q = jnp.where(
        best == 0, q_w, jnp.where(best == 1, q_x, jnp.where(best == 2, q_y, q_z))
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize to w >= 0 so the rotation angle is in [0, pi].
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2 * x, 2 * y, 2 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    rows = jnp.stack(
        [
            jnp.stack([1.0 - (tyy + tzz), txy - twz, txz + twy], axis=-1),
            jnp.stack([txy + twz, 1.0 - (txx + tzz), tyz - twx], axis=-1),
            jnp.stack([txz - twy, tyz + twx, 1.0 - (txx + tyy)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotation_matrix_to_vector(r: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> rotation vector (axis * angle), (..., 3).

    Reference: rotation_matrix_to_vector, so3.py:173-182 — but safe at
    theta ~ 0 (where v -> 0 smoothly) and theta ~ pi.
    """
    q = matrix_to_quaternion(r)
    w = q[..., 0]
    xyz = q[..., 1:]
    # gradient-safe norm: sqrt only ever sees the safe operand (same
    # double-where rule as exp_skew_symmetric_mat — an unguarded
    # jnp.linalg.norm has an inf gradient at xyz = 0, which turns into NaN
    # through the untaken where branch)
    n2 = jnp.sum(xyz * xyz, axis=-1)
    small = n2 < _EPS * _EPS
    n_safe = jnp.sqrt(jnp.where(small, 1.0, n2))
    theta = 2.0 * jnp.arctan2(n_safe, w)
    # v = axis * theta = xyz * (theta / n); as theta -> 0, theta/n -> 2/w.
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / n_safe)
    return xyz * scale[..., None]


def log_rotmat(r: jax.Array) -> jax.Array:
    """Matrix log: rotation matrix -> skew-symmetric matrix in so(3).

    Reference: log_rotmat, so3.py:146-162 (theta/(2 sin theta) * (R - R^T),
    singular at theta in {0, pi}).  Here: hat(rotation_vector), exactly
    skew-symmetric by construction and safe everywhere.
    """
    return hat(rotation_matrix_to_vector(r))


def exp_skew_symmetric_mat(s: jax.Array) -> jax.Array:
    """Matrix exp of a skew-symmetric matrix via Rodrigues' formula.

    exp S = I + S * sin(t)/t + S^2 * (1 - cos(t))/t^2,  t = |vee(S)|.

    Reference: exp_skew_symmetric_mat, so3.py:219-237 — which divides by the
    norm directly and NaNs at t = 0; here the two coefficients get Taylor
    fallbacks (sin(t)/t -> 1 - t^2/6, (1-cos t)/t^2 -> 1/2 - t^2/24) so the
    map is exact and differentiable at the identity.
    """
    v = vee(s)
    t2 = jnp.sum(v * v, axis=-1)
    small = t2 < 1e-8
    # GRADIENT-safe guard: sqrt must only ever see the safe operand.  With
    # `t = sqrt(t2)` computed outside the where, the backward pass at
    # t2 == 0 multiplies the untaken branch's zero cotangent by
    # d(sqrt)/d(t2) = inf -> NaN.  This is not theoretical: a converged
    # orientation head emits exact-zero rotation vectors (bf16 underflow),
    # and two 4,000-step TPU training runs NaN'd at that moment until the
    # guard moved inside.
    t2_safe = jnp.where(small, 1.0, t2)
    t_safe = jnp.sqrt(t2_safe)

    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t_safe) / t_safe)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t_safe)) / t2_safe)

    eye = jnp.eye(3, dtype=s.dtype)
    eye = jnp.broadcast_to(eye, s.shape)
    s2 = s @ s
    return eye + a[..., None, None] * s + b[..., None, None] * s2


def vector_to_rotation_matrix(v: jax.Array) -> jax.Array:
    """Rotation vector (axis*angle) (..., 3) -> rotation matrix (..., 3, 3).

    Reference: vector_to_rotation_matrix, so3.py:207-216.
    """
    return exp_skew_symmetric_mat(hat(v))


def scale_rot(r: jax.Array, k: jax.Array) -> jax.Array:
    """Geodesic scaling: exp(k * log R).

    `k` broadcasts against R's batch dims from the LEFT (the reference
    right-appends singleton dims until ndims match, so3.py:240-259): a (B,)
    k against a (B, L, 3, 3) R scales every residue of batch b by k[b].
    """
    k = jnp.asarray(k, dtype=r.dtype)
    if k.ndim > r.ndim - 2:
        raise ValueError(f"k.ndim ({k.ndim}) larger than R's batch ndim ({r.ndim - 2})")
    k = k.reshape(k.shape + (1,) * (r.ndim - 2 - k.ndim))
    v = rotation_matrix_to_vector(r)
    return vector_to_rotation_matrix(k[..., None] * v)


def uniform(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Uniform (Haar) random rotation matrices of shape ``shape + (3, 3)``.

    Reference: so3.uniform via scipy Rotation.random (so3.py:129-139); here a
    normalized 4D Gaussian quaternion, which is the same distribution, on
    device and jit-friendly.
    """
    q = jax.random.normal(key, shape + (4,), dtype=dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)


def compose(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Rotation composition R1 @ R2 over the last two dims."""
    return jnp.einsum("...ij,...jk->...ik", r1, r2)


def identity_like(r: jax.Array) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), r.shape)
