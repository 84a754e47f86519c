"""Model-based design scoring: rank designs without ground truth.

The sampler's stochastic modes produce a heavy-tailed design distribution —
the typical design is sub-angstrom while a small scattered minority is far
off (QUALITY.md: best-of-8 beats the mean by 2-60x depending on mode).  A
pick-the-best workflow therefore needs a way to ORDER the n designs of a
target, and at design time there is no native structure to score against.

`score_designs` is that ordering: a Monte-Carlo estimate of the diffusion
training objective ("simple" ELBO terms) evaluated ON THE DESIGN — the
design is treated as x_0, forward-noised at a grid of timesteps, denoised,
and scored by how well the model's predictions recover it:

  seq_score            CE of the predicted p(s_0) against the designed
                       sequence (the D3PM CE term of the training loss)
  translations_score   |eps_hat - eps|^2 over designed CAs (the DDPM
                       simple loss)
  orientations_score   discrepancy of the predicted R_0 vs the designed
                       frames (the reference's OrientationLoss,
                       diffab_pytorch.py:610-625)

A design the model assigns high likelihood denoises back to itself from
every t; a scattered/implausible one does not — the model has never seen
geometry like it, so its predictions point elsewhere and the score blows
up.  Lower = better.  Scores are comparable only across designs of the
SAME target (the context terms shift per target).

Cost: |t_grid| x n_draws denoiser forwards per design (default 16) vs
T = 100 for sampling it — measured 20% of design time on v5e at the
128-design fan-out (85.5 ms to score what takes 424 ms to sample;
~1,500 designs scored/s/chip).  The scorer
reuses the shared-context design fan-out end to end: the context is
encoded ONCE per target and the pair tensor / per-layer bias logits are
shared by all n designs inside attention (models/ipa.py), exactly like
`sampling.sampler.sample(n_designs=n)`.

The reference has no counterpart (no sampler, no evaluation —
SURVEY.md §6); the scoring rule is standard diffusion-model likelihood
ranking applied to the DiffAb objective.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from diffab_pytorch_tpu.data.batch import ProteinBatch
from diffab_pytorch_tpu.diffusion import coordinate, orientation, sequence
from diffab_pytorch_tpu.diffusion.orientation import OrientationDiffusionTables
from diffab_pytorch_tpu.diffusion.schedule import DiffusionSchedule
from diffab_pytorch_tpu.models.diffab import DiffAbModel
from diffab_pytorch_tpu.sampling.sampler import SampleResult
from diffab_pytorch_tpu.train.losses import orientation_discrepancy


@flax.struct.dataclass
class DesignScores:
    """Per-design score vectors, (b*n,) design-major (row i*n + d is design
    d of target i) — the same row order the sampler emits.  Lower is
    better.  `score` is the weighted sum of the components actually
    generated (a fixed modality contributes zeros)."""

    score: jax.Array  # (bn,)
    seq_score: jax.Array  # (bn,)
    translations_score: jax.Array  # (bn,)
    orientations_score: jax.Array  # (bn,)


def _masked_row_mean(elem: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(elem * m, axis=-1) / jnp.maximum(m.sum(axis=-1), 1.0)


def score_designs(
    model: DiffAbModel,
    params,
    sched: DiffusionSchedule,
    tables: OrientationDiffusionTables,
    batch: ProteinBatch,
    designs: SampleResult,
    key: jax.Array,
    *,
    generate_structure: bool = True,
    generate_sequence: bool = True,
    t_grid: Optional[Sequence[int]] = None,
    n_draws: int = 2,
    seq_weight: float = 1.0,
    translations_weight: float = 1.0,
    orientations_weight: float = 1.0,
) -> DesignScores:
    """Score the designs of `batch`'s targets.  jit-compatible (flags and
    the grid are Python-static).

    batch:   the b targets (the SAME batch the designs were sampled from —
             context features and masks come from here).
    designs: b*n rows, design-major, as produced by
             `sample(n_designs=n)` — n is inferred from the row ratio.
    key:     scoring noise; folds per (t, draw).  Scores are deterministic
             given (params, batch, designs, key).
    t_grid:  timesteps of the Monte-Carlo grid (default: 8 evenly spaced
             over [1, T/4]).  Low t dominates discrimination — x_t is
             nearly the design itself, so an implausible design cannot
             hide behind the noise.  Measured on the trained 12k
             checkpoint (scripts/probe_ranking.py, 24 val_combo targets
             x 8 designs, scatter-prone ns=1.0 mode): t in [1, T/4] gives
             Spearman rho 0.75 / top-1 RMSD 0.335 A vs 0.66 / 0.356 for
             a uniform [1, T] grid and 0.20 / 4.7 for [3T/4, T]; the
             translations term carries most of the signal (alone: 0.70),
             seq/orientation terms alone discriminate poorly but do not
             hurt.  Per-mode measurements (round 3, 24 val_combo targets
             x 8 designs per checkpoint, scripts/probe_ranking.py):
             fix-sequence (structure design) ranks well with the SAME
             default — rho 0.66-0.78 / top-1 within 0.03-0.05 A of
             oracle across two checkpoints; every grid placement scores
             within noise of it, so no mode-specific grid is warranted.
             fix-structure (sequence design) needs no ranking on a
             mode-dropout-trained checkpoint (unranked 1-AAR ~ 0.001 —
             nothing to discriminate) and CANNOT be rescued by any grid
             on a codesign-only checkpoint (rho |<=| 0.15 at low/mid/
             uniform/high grids and 4 draws: the designs are
             out-of-distribution, a training defect, not a scoring one —
             train with TrainConfig.mode_dropout instead).
    n_draws: independent noise draws per grid point (2 by default;
             4 measured rho 0.78 for 2x the cost).

    generate_structure / generate_sequence must match the sampling mode:
    a fixed modality was never generated, is identical across designs, and
    is part of the CONTEXT — noising or scoring it would be wrong.
    """
    b = batch.batch_size
    bn = designs.seq_idx.shape[0]
    if bn % b:
        raise ValueError(f"designs rows {bn} not a multiple of batch {b}")
    n = bn // b
    if not (generate_structure or generate_sequence):
        raise ValueError("nothing was generated: both modalities are fixed")

    gen = batch.generation_mask & batch.residue_mask
    seq_gen = gen if generate_sequence else jnp.zeros_like(gen)
    struct_gen = gen if generate_structure else jnp.zeros_like(gen)

    rep = (lambda a: jnp.repeat(a, n, axis=0)) if n > 1 else (lambda a: a)
    gen, seq_gen, struct_gen = rep(gen), rep(seq_gen), rep(struct_gen)
    res_mask = rep(batch.residue_mask)

    # the design IS x_0 for scoring
    seq_d = designs.seq_idx
    x_d = designs.translations
    r_d = designs.orientations

    # context encoding once per target (design-independent: the generated
    # region is masked out of the context features) + per-layer bias logits,
    # shared by all n designs inside attention like the sampler's fan-out
    res_emb, pair_emb = model.apply(
        params,
        batch,
        generate_structure=generate_structure,
        generate_sequence=generate_sequence,
        method="encode_context",
    )
    from diffab_pytorch_tpu.models.ipa import precompute_pair_biases

    pair_biases = precompute_pair_biases(
        params["params"]["denoiser"]["ipa"], pair_emb
    )

    T = sched.T
    if t_grid is None:
        t_grid = np.unique(
            np.round(np.linspace(1, max(T // 4, 1), num=8)).astype(np.int64)
        )
    t_arr = np.asarray(
        [int(t) for t in t_grid for _ in range(max(1, int(n_draws)))],
        dtype=np.int32,
    )
    d_arr = np.asarray(
        [d for _ in t_grid for d in range(max(1, int(n_draws)))],
        dtype=np.int32,
    )
    if not ((1 <= t_arr) & (t_arr <= T)).all():
        raise ValueError(f"t_grid values must be in [1, {T}]")

    def body(acc, td):
        t, d = td
        k = jax.random.fold_in(jax.random.fold_in(key, t), d)
        ks, kx, kr = jax.random.split(k, 3)
        tvec = jnp.full((bn,), t, dtype=jnp.int32)

        seq_t = sequence.diffuse_from_t0(
            ks, sched, seq_d, tvec, seq_gen,
            model.cfg.aa_vocab_size, return_posterior=False,
        )
        x_t, eps = coordinate.diffuse_from_t0(
            kx, sched, x_d, tvec, struct_gen
        )
        r_t = orientation.diffuse_from_t0(kr, tables, r_d, tvec, struct_gen)

        denoised = model.apply(
            params,
            seq_t,
            x_t,
            r_t,
            res_emb,
            pair_emb,
            sched.beta[tvec],
            gen,
            res_mask,
            pair_biases=pair_biases,
            method="denoise",
        )

        log_p0 = jax.nn.log_softmax(
            denoised["seq_logits"].astype(jnp.float32), axis=-1
        )
        ce = -jnp.take_along_axis(log_p0, seq_d[..., None], axis=-1)[..., 0]
        seq_s = _masked_row_mean(ce, seq_gen)

        eps_err = jnp.sum(
            (denoised["translations_eps"].astype(jnp.float32)
             - eps.astype(jnp.float32)) ** 2,
            axis=-1,
        )
        trans_s = _masked_row_mean(eps_err, struct_gen)

        orient_s = _masked_row_mean(
            9.0 * orientation_discrepancy(
                denoised["orientations_t0"].astype(jnp.float32),
                r_d.astype(jnp.float32),
            ),
            struct_gen,
        )
        return (acc[0] + seq_s, acc[1] + trans_s, acc[2] + orient_s), None

    zero = jnp.zeros((bn,), jnp.float32)
    (seq_s, trans_s, orient_s), _ = jax.lax.scan(
        body, (zero, zero, zero),
        (jnp.asarray(t_arr), jnp.asarray(d_arr)),
    )
    n_steps = float(len(t_arr))
    seq_s, trans_s, orient_s = (
        seq_s / n_steps, trans_s / n_steps, orient_s / n_steps
    )
    total = (
        seq_weight * seq_s
        + translations_weight * trans_s
        + orientations_weight * orient_s
    )
    return DesignScores(
        score=total,
        seq_score=seq_s,
        translations_score=trans_s,
        orientations_score=orient_s,
    )


def rank_per_target(scores: jax.Array, n_designs: int) -> jax.Array:
    """Order the designs of each target by ascending score (best first).

    scores: (b*n,) design-major.  Returns (b, n) int32 — row i holds the
    design indices of target i, best first; flat row index of target i's
    rank-r design is i*n + out[i, r]."""
    per_target = scores.reshape(-1, n_designs)
    return jnp.argsort(per_target, axis=-1).astype(jnp.int32)
