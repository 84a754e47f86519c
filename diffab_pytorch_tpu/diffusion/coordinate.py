"""Gaussian (DDPM) diffusion on C-alpha translations.

TPU-native re-design of reference `diffab_pytorch/diffusion.py:195-236`
(CoordinateDiffuser) as pure keyed functions, plus the DDPM reverse step the
reference's sample() stub lacks (diffab_pytorch.py:770-776, SURVEY.md §3.5).

Forward:  x_t = sqrt(abar_t) x_0 + sqrt(1 - abar_t) eps,  eps ~ N(0, I)
Reverse:  mu_{t-1} = (x_t - beta_t / sqrt(1-abar_t) eps_hat) / sqrt(alpha_t)
          sigma_{t-1}^2 = beta_tilde_t = (1 - abar_{t-1}) / (1 - abar_t) beta_t
          (no noise at the final t=1 -> t=0 step)

Context residues (generation_mask False) pass through unchanged
(diffusion.py:230-231).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.diffusion.schedule import DiffusionSchedule


def diffuse_from_t0(
    key: jax.Array,
    sched: DiffusionSchedule,
    translations_t0: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    return_eps: bool = True,
):
    """Sample x_t ~ q(x_t | x_0).  Reference diffusion.py:199-236.

    translations_t0: (..., L, 3); t: (...,); generation_mask: (..., L).
    """
    a = sched.alpha_bar_sqrt[t][..., None, None]
    b = sched.one_minus_alpha_bar_sqrt[t][..., None, None]
    eps = jax.random.normal(key, translations_t0.shape, dtype=translations_t0.dtype)
    x_t = a * translations_t0 + b * eps
    x_t = jnp.where(generation_mask[..., None], x_t, translations_t0)
    return (x_t, eps) if return_eps else x_t


def reverse_step(
    key: jax.Array,
    sched: DiffusionSchedule,
    translations_t: jax.Array,
    eps_hat: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    x0_clip: float | jax.Array | None = None,
    noise_scale: float = 1.0,
    s: jax.Array | None = None,
    mode: str = "posterior",
) -> jax.Array:
    """One DDPM posterior step x_t -> x_s using the predicted noise.

    s defaults to t - 1 (the full-length chain).  Any s < t gives the
    RESPACED posterior q(x_s | x_t, x0_hat) (DDIM-paper respacing, the
    standard few-step accelerator): the forward kernel between s and t has
    alpha_ts = abar_t / abar_s, and every t-1 quantity below generalizes by
    beta -> beta_ts = 1 - alpha_ts, abar_prev -> abar_s.  s = t - 1
    reproduces the single-step formulas exactly (alpha_ts = alpha_t).

    noise_scale scales the posterior noise's standard deviation
    (low-temperature sampling, cf. RFdiffusion's noise_scale): 1.0 is the
    exact DDPM posterior, 0.0 the deterministic posterior-mean chain.
    Values < 1 trade diversity for precision — useful when the target is
    strongly determined by the context.

    At t == 1 the posterior variance is zero (the step lands on x_0), which
    falls out of beta_tilde = (1 - abar_0)/(1 - abar_1) * beta_1 = 0 since
    abar_0 = 1 — no special-casing needed inside jit.

    x0_clip: static thresholding.  The reverse chain near t = T divides an
    imperfect eps_hat by sqrt(abar_t) ~ 1e-2; with a finite model the
    implied x0_hat can leave the data region, the next step's inputs go
    out-of-distribution, and the chain diverges multiplicatively (observed:
    ~7,000 A RMSD on full-length generation with a model whose t-restart
    designs are sub-2 A).  Clamping the implied x0_hat to
    [-x0_clip, x0_clip] and stepping with the exact posterior
    q(x_{t-1} | x_t, x0_hat) is a no-op whenever the prediction is already
    inside the bound, and a projection back onto it when it is not.  None
    preserves the textbook eps-form step (identical when nothing clips).

    THE BOUND MUST COVER THE DATA.  Scalars apply one global box; a (b,)
    array applies a per-sample box (broadcast over residues/coords) — use
    the sampler's "auto" mode, which derives it from the context extent.
    A bound tighter than the true coordinate range actively amputates
    geometry: clip=5.0 on patches whose CDRs legitimately reach |x| ~ 8
    measured 26.8 A RMSD where the correctly-sized bound gave 1.3 A.

    mode: "posterior" (default) or "ddim".  The two are IDENTICAL at
    noise_scale = 1 (variance identity c_eps^2 + beta_tilde = 1 - abar_s,
    pinned in tests/test_fewstep.py); they differ in how the carried
    residual is scaled when noise_scale < 1:

      posterior  carries sqrt(alpha_ts)(1-abar_s)/(1-abar_t) x_t — every
                 step CONTRACTS the residual component, which is what
                 makes the deterministic low-t chain precise (the
                 contraction eats eps_hat error), but at HIGH t it also
                 contracts the chain's noise RADIUS below the marginal
                 sqrt(1-abar_s): x collapses toward the origin faster
                 than the manifold shrinks, the denoiser sees
                 off-distribution inputs, and some chains freeze near
                 their init (the scattered-design mechanism measured by
                 scripts/probe_scatter.py — 100% of scattered designs
                 NEVER entered the basin; their max|x| stagnated at
                 ~0.2 of the data extent while clean chains reached 0.5).
      ddim       rescales the residual direction to the marginal radius:
                 x_s = sqrt(abar_s) x0_hat
                       + sqrt(1-abar_s-sigma^2) (x_t - sqrt(abar_t)
                         x0_hat)/sqrt(1-abar_t) + sigma z,
                 sigma = noise_scale sqrt(beta_tilde) — the chain stays
                 ON the q(x_s | x0_hat) manifold by construction, but
                 faithfully carries eps_hat error forward (measured 67 A
                 vs 0.30 A on a full-length ns=0 chain — do NOT run ddim
                 at low t).

    The sampler's coord_ddim_t_min knob composes them per step: ddim in
    the stiff high-t transport region, posterior contraction below.
    """
    if isinstance(x0_clip, jax.Array) and x0_clip.ndim == 1:
        x0_clip = x0_clip[..., None, None]  # (b,) -> broadcast (b, L, 3)
    if s is None:
        s = t - 1
    one_minus_abar = sched.one_minus_alpha_bar_sqrt[t][..., None, None] ** 2
    abar = sched.alpha_bar[t][..., None, None]
    abar_prev = sched.alpha_bar[s][..., None, None]
    alpha = abar / abar_prev  # alpha_ts; s = t-1 -> alpha_t
    beta = 1.0 - alpha  # beta_ts
    beta_tilde = (1.0 - abar_prev) / one_minus_abar * beta

    # Posterior-mean parameterization, DELIBERATELY (measured, do not
    # "upgrade" to eta-DDIM): at noise_scale < 1 the posterior mean's eps
    # coefficient c_eps = sqrt(alpha_ts)(1-abar_s)/sqrt(1-abar_t) is
    # SMALLER than DDIM's sqrt(1-abar_s - sigma^2), so every step
    # CONTRACTS the carried eps/error component.  With an imperfect
    # eps_hat that contraction is what makes the deterministic chain
    # precise — measured on the trained compositional checkpoint
    # (full-length, ns=0): 0.30 A CA-RMSD here vs 67 A with the exact
    # eta-DDIM direction term, which faithfully carries the model's eps
    # error forward instead of shrinking it.  (Both parameterizations are
    # identical at noise_scale = 1 by the variance identity
    # c_eps^2 + beta_tilde = 1 - abar_s, pinned in tests/test_fewstep.py.)
    if mode not in ("posterior", "ddim"):
        raise ValueError(f"mode must be 'posterior' or 'ddim', got {mode!r}")
    sigma = noise_scale * jnp.sqrt(jnp.maximum(beta_tilde, 0.0))
    if mode == "ddim":
        x0_hat = (
            translations_t - jnp.sqrt(one_minus_abar) * eps_hat
        ) / jnp.sqrt(abar)
        if x0_clip is not None:
            x0_hat = jnp.clip(x0_hat, -x0_clip, x0_clip)
        direction = (
            translations_t - jnp.sqrt(abar) * x0_hat
        ) / jnp.sqrt(one_minus_abar)
        mean = jnp.sqrt(abar_prev) * x0_hat + jnp.sqrt(
            jnp.maximum((1.0 - abar_prev) - sigma**2, 0.0)
        ) * direction
    elif x0_clip is None:
        mean = (
            translations_t - beta / jnp.sqrt(one_minus_abar) * eps_hat
        ) / jnp.sqrt(alpha)
    else:
        x0_hat = (
            translations_t - jnp.sqrt(one_minus_abar) * eps_hat
        ) / jnp.sqrt(abar)
        x0_hat = jnp.clip(x0_hat, -x0_clip, x0_clip)
        # q(x_s | x_t, x0_hat) posterior mean (algebraically equal to the
        # eps-form above when the clip is inactive)
        mean = (
            jnp.sqrt(abar_prev) * beta * x0_hat
            + jnp.sqrt(alpha) * (1.0 - abar_prev) * translations_t
        ) / one_minus_abar
    noise = jax.random.normal(key, translations_t.shape, dtype=translations_t.dtype)
    x_prev = mean + sigma * noise
    return jnp.where(generation_mask[..., None], x_prev, translations_t)


def reverse_step_from_x0(
    key: jax.Array,
    sched: DiffusionSchedule,
    translations_t: jax.Array,
    x0_hat: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    x0_clip: float | jax.Array | None = None,
    noise_scale: float | jax.Array = 1.0,
    s: jax.Array | None = None,
) -> jax.Array:
    """One posterior step q(x_s | x_t, x0_hat) given an EXPLICIT clean-state
    estimate.

    Same step as `reverse_step` (posterior-mean parameterization, respaced
    s < t supported, x0 clipping, noise_scale) but the x0 estimate is an
    input instead of being implied from eps_hat — the entry point for the
    sampler's higher-order coordinate solvers (`sample(coord_solver=...)`),
    which build a better x0 estimate (multistep extrapolation / a corrector
    model eval) and still step with the error-contracting posterior mean
    (the contraction is the measured reason the deterministic chain is
    precise — see the parameterization note in `reverse_step`).

    With x0_hat = predicted_x0(sched, x_t, eps_hat, t) this reproduces
    `reverse_step(..., mode="posterior")` exactly (pinned in
    tests/test_fewstep.py).
    """
    if isinstance(x0_clip, jax.Array) and x0_clip.ndim == 1:
        x0_clip = x0_clip[..., None, None]
    if s is None:
        s = t - 1
    one_minus_abar = sched.one_minus_alpha_bar_sqrt[t][..., None, None] ** 2
    abar = sched.alpha_bar[t][..., None, None]
    abar_prev = sched.alpha_bar[s][..., None, None]
    alpha = abar / abar_prev  # alpha_ts
    beta = 1.0 - alpha  # beta_ts
    beta_tilde = (1.0 - abar_prev) / one_minus_abar * beta
    if x0_clip is not None:
        x0_hat = jnp.clip(x0_hat, -x0_clip, x0_clip)
    mean = (
        jnp.sqrt(abar_prev) * beta * x0_hat
        + jnp.sqrt(alpha) * (1.0 - abar_prev) * translations_t
    ) / one_minus_abar
    sigma = noise_scale * jnp.sqrt(jnp.maximum(beta_tilde, 0.0))
    noise = jax.random.normal(key, translations_t.shape, dtype=translations_t.dtype)
    x_prev = mean + sigma * noise
    return jnp.where(generation_mask[..., None], x_prev, translations_t)


def predicted_x0(
    sched: DiffusionSchedule,
    translations_t: jax.Array,
    eps_hat: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """Recover the implied x_0 estimate from (x_t, eps_hat) — useful for
    metrics and for optimization-by-renoising workflows."""
    a = sched.alpha_bar_sqrt[t][..., None, None]
    b = sched.one_minus_alpha_bar_sqrt[t][..., None, None]
    return (translations_t - b * eps_hat) / a


def sample_prior(
    key: jax.Array,
    translations_context: jax.Array,
    generation_mask: jax.Array,
) -> jax.Array:
    """x_T ~ N(0, I) on generated positions (the t -> T limit of the forward
    process); context positions keep their coordinates."""
    noise = jax.random.normal(
        key, translations_context.shape, dtype=translations_context.dtype
    )
    return jnp.where(generation_mask[..., None], noise, translations_context)


class CoordinateDiffuser:
    """Thin wrapper mirroring the reference class API (diffusion.py:195-236)."""

    def __init__(self, T: int, s: float = 0.01, beta_max: float = 0.999,
                 sched: DiffusionSchedule | None = None):
        from diffab_pytorch_tpu.diffusion.schedule import cosine_variance_schedule

        self.sched = sched if sched is not None else cosine_variance_schedule(
            T, s=s, beta_max=beta_max
        )

    def diffuse_from_t0(self, key, translations_t0, t, generation_mask,
                        return_eps: bool = True):
        return diffuse_from_t0(
            key, self.sched, translations_t0, t, generation_mask, return_eps
        )

    def reverse_step(self, key, translations_t, eps_hat, t, generation_mask):
        return reverse_step(
            key, self.sched, translations_t, eps_hat, t, generation_mask
        )
