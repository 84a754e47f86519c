"""IGSO(3) diffusion on per-residue orientation frames.

TPU-native re-design of reference `diffab_pytorch/diffusion.py:239-294`
(OrientationDiffuser) as pure keyed functions over precomputed tables, plus
the reverse step the reference's sample() stub lacks (SURVEY.md §3.5).

Forward (diffusion.py:262-294):
  mean_t = scale_rot(R_0, sqrt(abar_t))          geodesic shrink toward I
  noise  ~ IGSO3(I, sqrt(1 - abar_t))            axis-angle sample -> matrix
  R_t    = mean_t @ noise

The IGSO(3) sigma table IS one_minus_alpha_bar_sqrt indexed by timestep
(diffusion.py:254-255), so the timestep doubles as the sigma index — here
that contract is explicit: `OrientationDiffusionTables.igso3.sigmas[t]`.

Reverse (DiffAb paper semantics — apply the forward kernel at t-1 to the
predicted R_0):
  R_{t-1} = scale_rot(R0_hat, sqrt(abar_{t-1})) @ IGSO3-noise(sigma_{t-1})
with zero noise at t == 1 (sigma_0 = 0 by construction).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffab_pytorch_tpu.geometry import igso3 as igso3_lib
from diffab_pytorch_tpu.geometry import so3
from diffab_pytorch_tpu.diffusion.schedule import DiffusionSchedule, cosine_variance_schedule


class OrientationDiffusionTables(NamedTuple):
    """Everything the orientation process needs, as device arrays."""

    sched: DiffusionSchedule
    igso3: igso3_lib.IGSO3Table


def make_orientation_tables(
    sched: DiffusionSchedule,
    n_bins: int = igso3_lib.DEFAULT_N_BINS,
    n_terms: int = igso3_lib.DEFAULT_N_TERMS,
    sigma_threshold: float = igso3_lib.DEFAULT_SIGMA_THRESHOLD,
) -> OrientationDiffusionTables:
    """Build IGSO(3) tables over sigma_t = sqrt(1 - abar_t) for every t.

    Replaces the reference's disk-cached host precompute
    (diffusion.py:254-260 -> so3.py:37-63).
    """
    sigmas = np.asarray(sched.one_minus_alpha_bar_sqrt, dtype=np.float64)
    table = igso3_lib.build_igso3_table(
        sigmas, n_bins=n_bins, n_terms=n_terms, sigma_threshold=sigma_threshold,
        dtype=sched.beta.dtype,
    )
    return OrientationDiffusionTables(sched=sched, igso3=table)


def _apply_forward_kernel(
    key: jax.Array,
    tables: OrientationDiffusionTables,
    orientations: jax.Array,  # (b, L, 3, 3)
    t: jax.Array,  # (b,) timestep == sigma index
    noise_scale: float = 1.0,
) -> jax.Array:
    """scale_rot(R, sqrt(abar_t)) @ IGSO3-noise(sigma_t).

    noise_scale scales the sampled noise ANGLE (low-temperature analogue of
    the coordinate chain's knob; 0 lands deterministically on the scaled
    mean — axis-angle scaling is the geodesic shrink of the noise
    rotation, exact for this parameterization)."""
    n_residues = orientations.shape[-3]
    mean = so3.scale_rot(orientations, tables.sched.alpha_bar_sqrt[t])
    rotvec = igso3_lib.sample_axis_angle(key, tables.igso3, t, (n_residues,))
    noise = so3.vector_to_rotation_matrix(noise_scale * rotvec)
    return so3.compose(mean, noise)


def diffuse_from_t0(
    key: jax.Array,
    tables: OrientationDiffusionTables,
    orientations_t0: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
) -> jax.Array:
    """Sample R_t ~ IGSO3(scale_rot(R_0, sqrt(abar_t)), sqrt(1-abar_t)).

    Reference diffusion.py:262-294 (mask gating at :291-292).
    """
    r_t = _apply_forward_kernel(key, tables, orientations_t0, t)
    return jnp.where(generation_mask[..., None, None], r_t, orientations_t0)


def reverse_step(
    key: jax.Array,
    tables: OrientationDiffusionTables,
    orientations_t: jax.Array,
    orientations_t0_hat: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    noise_scale: float = 1.0,
    s: jax.Array | None = None,
    mode: str = "renoise",
) -> jax.Array:
    """One reverse step R_t -> R_s.  Two modes:

    mode="renoise" (the DiffAb-paper heuristic, the reference has no
    implementation to compare — diffab_pytorch.py:770-776 is an empty
    stub): apply the forward kernel at s to the predicted clean frames —
    R_s = scale_rot(R0_hat, sqrt(abar_s)) @ IGSO3(sigma_s).  Respaces
    trivially (any s < t just renoises the prediction to level s), but
    draws the FULL forward marginal sigma_s = sqrt(1 - abar_s) every step
    and discards R_t entirely: the frame chain has no memory, and at
    mid-t the injected angle is far larger than the exact posterior's
    would be.

    mode="posterior" (the rotational analogue of the DDPM beta-tilde
    posterior, round-3 — addressing the over-noising): transplant the
    Gaussian posterior q(x_s | x_t, x0_hat), whose mean is the convex
    combination  w0 * sqrt(abar_s) x0_hat + wt * x_t / sqrt(alpha_ts)
    with  wt = alpha_ts (1 - abar_s) / (1 - abar_t),  w0 = 1 - wt,
    and whose std is  sigma_tilde = sqrt((1 - abar_s) beta_ts /
    (1 - abar_t)),  onto SO(3):

      A   = scale_rot(R0_hat, sqrt(abar_s))        shrunk prediction
      B   = scale_rot(R_t, 1 / sqrt(alpha_ts))     R_t unshrunk to level s
      M   = A @ scale_rot(A^T B, wt)               geodesic interpolation
      R_s = M @ IGSO3(sigma_tilde)                 continuous-sigma sample

    At mid-t sigma_tilde ~ sqrt(beta_t / (1 - abar_t)) * sigma_s — a
    3-6x smaller injected angle than renoise — and the chain keeps
    memory of R_t.  At s = 0: wt = 0, sigma_tilde = 0, so the step lands
    exactly on R0_hat (same terminal behavior as renoise).  Near t = T
    beta_ts -> 1 makes 1/sqrt(alpha_ts) large and B ill-defined, but wt
    -> 0 there, so the garbage contribution is weighted out.

    noise_scale < 1 scales the sampled noise angle in both modes
    (0 = deterministic geodesic step).
    """
    if s is None:
        s = t - 1
    if mode == "renoise":
        r_prev = _apply_forward_kernel(
            key, tables, orientations_t0_hat, s, noise_scale=noise_scale
        )
    elif mode == "posterior":
        sched = tables.sched
        abar_t = sched.alpha_bar[t]
        abar_s = sched.alpha_bar[s]
        alpha_ts = abar_t / abar_s
        beta_ts = 1.0 - alpha_ts
        one_m_t = jnp.maximum(1.0 - abar_t, 1e-12)
        one_m_s = 1.0 - abar_s
        w_t = alpha_ts * one_m_s / one_m_t  # (b,)
        sigma_tilde = jnp.sqrt(jnp.maximum(one_m_s * beta_ts / one_m_t, 0.0))

        a = so3.scale_rot(orientations_t0_hat, jnp.sqrt(abar_s))
        b_pt = so3.scale_rot(
            orientations_t, 1.0 / jnp.sqrt(jnp.maximum(alpha_ts, 1e-6))
        )
        rel = so3.compose(jnp.swapaxes(a, -1, -2), b_pt)
        mean = so3.compose(a, so3.scale_rot(rel, w_t))

        n_residues = orientations_t.shape[-3]
        rotvec = igso3_lib.sample_axis_angle_continuous(
            key, tables.igso3, sigma_tilde, (n_residues,)
        )
        noise = so3.vector_to_rotation_matrix(noise_scale * rotvec)
        r_prev = so3.compose(mean, noise)
    else:
        raise ValueError(f"unknown orientation reverse mode: {mode!r}")
    return jnp.where(generation_mask[..., None, None], r_prev, orientations_t)


def sample_prior(
    key: jax.Array,
    orientations_context: jax.Array,
    generation_mask: jax.Array,
) -> jax.Array:
    """R_T ~ uniform on SO(3) for generated positions (the t -> T limit);
    context positions keep their frames.  Reference so3.uniform
    (so3.py:129-139) is the host-side scipy analogue."""
    r = so3.uniform(key, orientations_context.shape[:-2],
                    dtype=orientations_context.dtype)
    return jnp.where(generation_mask[..., None, None], r, orientations_context)


class OrientationDiffuser:
    """Thin wrapper mirroring the reference class API (diffusion.py:239-294)."""

    def __init__(self, T: int, s: float = 0.01, beta_max: float = 0.999,
                 tables: OrientationDiffusionTables | None = None):
        if tables is None:
            tables = make_orientation_tables(
                cosine_variance_schedule(T, s=s, beta_max=beta_max)
            )
        self.tables = tables
        self.sched = tables.sched

    def diffuse_from_t0(self, key, orientations_t0, generation_mask, t):
        # NB reference argument order is (orientations, generation_mask, t)
        return diffuse_from_t0(key, self.tables, orientations_t0, t, generation_mask)

    def reverse_step(self, key, orientations_t, orientations_t0_hat, t,
                     generation_mask):
        return reverse_step(
            key, self.tables, orientations_t, orientations_t0_hat, t,
            generation_mask,
        )
