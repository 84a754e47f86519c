"""Frozen dataclass configuration (model / diffusion / data / train).

TPU-native equivalent of the reference's scattered configuration: argparse
flags in train.py:14-43, hardcoded hyperparameters in train.py:62-80, and
DiffAb.__init__ defaults (diffab_pytorch.py:628-647).  One source of truth,
hashable (usable as a jit static argument), with the reference defaults as
the canonical preset (SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from diffab_pytorch_tpu.constants import (
    AA_VOCAB_SIZE,
    MAX_N_ATOMS_PER_RESIDUE,
    MAX_N_CHAINS,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Denoiser network hyperparameters.

    Defaults = the reference's training configuration (train.py:62-80) with
    DiffAb.__init__ structural defaults (diffab_pytorch.py:628-647).
    """

    d_residue_emb: int = 128
    d_pair_emb: int = 64
    n_ipa_layers: int = 6
    d_scalar_per_head: int = 32
    n_query_point_per_head: int = 8
    n_value_point_per_head: int = 8
    n_head: int = 8
    use_pair_bias: bool = True
    n_atoms: int = MAX_N_ATOMS_PER_RESIDUE
    aa_vocab_size: int = AA_VOCAB_SIZE
    max_n_chains: int = MAX_N_CHAINS
    max_dist_to_consider: int = 32
    # Atoms (by index, N=0 CA=1 C=2 O=3 ...) entering the pair DISTANCE
    # feature: None = all n_atoms (the reference's A^2 = 225-channel
    # kernel, diffab_pytorch.py:198-207).  The (b, L, L, A^2) kernel
    # streams dominate the TRAIN step's HBM traffic (bench.py byte
    # ledger), so narrowing this is the architectural train-throughput
    # lever; 4 = backbone-only (N, CA, C, O), 16 channels.  Changes the
    # parameter tree (pair2distcoef / distance_mlp_0 widths) — opt-in,
    # recorded per checkpoint via model_config.json.  Measured
    # throughput/quality trade: DESIGN.md §3.
    dist_atoms: int | None = None
    n_residue_dihedral_funcs: int = 3  # AngularEncoding(num_funcs=3), ref :64
    n_pair_dihedral_funcs: int = 2  # AngularEncoding(2), ref :209
    # Computation dtype for the big matmuls (params stay float32).  bfloat16
    # feeds the MXU at full rate; float32 is used for parity tests.
    compute_dtype: str = "float32"
    # Fused Pallas attention core (ops/ipa_pallas.py): one VMEM-resident
    # kernel for logits+softmax+reductions.  Forward-path acceleration
    # (sampling: 1.08x measured on v5e at batch 32); backward
    # differentiates the identical jnp math.  None = auto: ON when the
    # default backend is TPU, OFF elsewhere (the CPU fallback would run in
    # slow interpret mode).  True/False force it either way.
    use_pallas_attention: bool | None = None
    # Fuse the ENTIRE IPA layer into the Pallas kernel (round 3): QKV
    # projections, frame transforms, augmented-operand assembly, attention,
    # and the scalar/point/norm output projections all run in VMEM — the
    # per-design activation streams (projections + relayouts, ~69% of the
    # reverse scan's HBM traffic by the bench.py byte ledger) never touch
    # HBM.  Only the attention weights (for the XLA-side pair reduction)
    # and the d-wide accumulator cross the chip boundary.  Requires
    # use_pallas_attention; None = follow the attention flag.
    fuse_ipa_layer: bool | None = None
    # Fuse the per-layer pair-bias projections into ONE matmul over the
    # pair tensor (models/ipa.py stack): left per layer, the
    # (b, L, L, d_pair) pair embedding crosses HBM n_layers times in the
    # forward and its gradient is accumulated across n_layers matmuls in
    # the backward — the surviving pair-stream bound after dist_atoms
    # (DESIGN.md §3).  Numerics are identical per output column (same
    # contraction, same accumulation order); the param tree is unchanged
    # (each layer's kernel is materialized via an identity matmul, the
    # same trick as the fused QKV projection).  Applies whenever biases
    # are not already precomputed (training; the sampler hoists its own
    # f32 biases out of the scan).  Ignored under remat_ipa, where the
    # bias belongs inside each layer's checkpointed region.
    fuse_pair_bias: bool = True
    # Pair-table lookups (aa_pair_embedding, pair2distcoef,
    # relpos_embedding) as one-hot MXU contractions instead of
    # gather/scatter (round 4).  The r4 trace of the production train step
    # (runs/profile_r4/train_top_ops.json) put 61% of DEVICE time in these
    # tables' ops: the backward scatter-adds of 524k (b L^2) index rows
    # into the tiny (441, d)/(65, d) tables cost 3.6-4.0 ms EACH and the
    # forward gathers 0.9 ms each, while the equivalent one-hot matmuls
    # are bandwidth-trivial (the 21^2 tables factor through two (.., 21)
    # contractions, so no (b, L, L, 441) one-hot is ever materialized;
    # relpos materializes its (b, L, L, 65) one-hot once).  Numerically
    # EXACT (a one-hot row selects a single table row; products by 1.0
    # and sums over zeros are exact in every dtype) — transplant goldens
    # unchanged.  Param tree unchanged.  OFF path kept for A/B.
    onehot_pair_tables: bool = True
    # Apply the pair MLP's first layer as per-feature-block partial
    # matmuls (round 4): mlp_0(concat(blocks)) == sum_i blocks[i] @ W_i
    # + b, so each block is consumed in its native layout and the
    # (b, L, L, 162) concat plus its layout copy — the two largest ops
    # of the post-onehot train profile (~1 ms of 11.2,
    # runs/profile_r4b/train_top_ops.json) — never materialize.  Same
    # sliced-projection trick as models/ipa.py to_out (param tree
    # unchanged via the identity matmul); splitting only regroups f32
    # accumulation per block.  Measured on v5e (same-process A/B,
    # runs/profile_r4b/ab_split_pair_mlp0.json): production step 71.8 ->
    # 92.1 steps/s (+28% — the backward's 162-wide gradient concat
    # vanishes too) — ON by default.
    split_pair_mlp0: bool = True
    # Rematerialize IPA layers in the backward pass (jax.checkpoint):
    # trades ~1 extra forward for not storing per-layer activations —
    # enables much larger training batches (HBM is the binding constraint
    # at b >= 64 with the (b, L, L, A^2) distance features).
    remat_ipa: bool = False
    # Rematerialize the PAIR-EMBEDDING stack (jax.checkpoint around
    # PairEmbedding).  Hypothesis: the train step is bandwidth-bound on
    # pair-rank tensors (~23% BW attainment vs ~2.5% MFU), so skipping the
    # store+reload of the (b, L, L, A^2) distance-kernel intermediates
    # should help.  MEASURED DEAD END on v5e (runs/train_sweep.json,
    # DESIGN.md): 20-29% SLOWER at every batch 16-256 (e.g. 624 vs 784
    # samples/s @ b128) — the recompute streams the same pair-rank tensors
    # a second time, and XLA's fused backward evidently does not
    # materialize them all to begin with.  Kept (OFF) as the recorded
    # experiment + for memory-constrained future configs; numerics are
    # identical (tests/test_modules.py test_remat_pair_equivalence).
    remat_pair: bool = False
    # Self-conditioning (Chen et al. 2022 "Analog Bits"; used by
    # RFdiffusion): feed the PREVIOUS denoising step's clean-state estimate
    # (x0_hat in each residue's local frame + predicted p(s_0)) back into
    # the denoiser.  Targets the scattered-design failure mode of
    # stochastic full-length chains (QUALITY.md: the mean/median RMSD
    # split).  Training runs a second conditioned forward on a
    # stop-gradient first-pass estimate for a random half of the batch
    # (~2x step cost); sampling threads the estimate through the scan for
    # free.  OFF by default: enabling widens the denoiser fuse layer, so
    # checkpoints are not interchangeable with the default tree (the
    # reference has no such mechanism; golden parity keeps the default).
    self_conditioning: bool = False
    # Late-fusion self-conditioning (round 4): the conditioned features
    # (previous step's x0 estimate, p(s_0), validity flag) are injected
    # AFTER the IPA trunk, into the coordinate/orientation heads only —
    # the trunk forward and the sequence head never see them, so the
    # trunk representation cannot become estimate-dependent and the
    # sequence head trains effectively 100% cold.  Motivated by the
    # round-4 attribution experiment (QUALITY.md): conditioned-geometry
    # features damage barcode-rule learning regardless of information
    # content (decoupled corpus: AAR 0.755 vs 0.982 control on BOTH val
    # splits) — a representation/gradient interference through the
    # shared fuse layer, which this isolates away structurally.  Changes
    # the geometry heads' input width (recorded per checkpoint via
    # model_config.json).  Requires self_conditioning.
    sc_late_fusion: bool = False
    # Split-trunk self-conditioning (round 5): the geometry heads read a
    # SECOND, independently-parameterized trunk (own fuse MLP + own IPA
    # stack) that receives the conditioned features early-fused, while
    # the sequence head keeps the original trunk computed from context
    # alone — FULL architectural isolation at ~2x trunk parameters and
    # ~2x trunk compute.  Motivation: late fusion removes the FORWARD
    # path of the interference but the geometry-head gradients still
    # flow through the shared trunk, and the tied-corpus late-fusion
    # AAR is a seed-dependent basin outcome (0.774-0.999 across six
    # seeds, QUALITY.md round 5) — this is the asserted ceiling, built
    # and measured.  Mutually exclusive with sc_late_fusion; requires
    # self_conditioning.
    sc_split_trunk: bool = False
    # Include the predicted p(s_0) among the sc features.  True helps the
    # single-loop task; on the harder multi-loop corpus the sequence
    # estimate acts as a self-copy shortcut — train seq-CE converges while
    # held-out-combination AAR stalls at the memorizer ceiling (0.71 vs
    # 0.99 without sc, QUALITY.md) — so multi-loop recipes should run
    # geometry-only (False: features are the local displacement + flag).
    self_conditioning_sequence: bool = True

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Forward/reverse process configuration (reference diffab_pytorch.py:638-640,
    diffusion.py:254-260)."""

    T: int = 100
    s: float = 0.01
    beta_max: float = 0.999
    igso3_n_bins: int = 8192
    igso3_n_terms: int = 1024
    igso3_sigma_threshold: float = 0.1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Patch / featurization configuration (reference preprocess_pdb.py:16-19,
    README.md:25)."""

    patch_size: int = 128  # K nearest residues around CDR anchors
    cdrs_to_generate: Tuple[str, ...] = ("H3",)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization configuration (reference train.py:29-36,
    diffab_pytorch.py:644-646,925-931)."""

    batch_size: int = 16
    epochs: int = 60
    lr: float = 1e-4
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    # Adam epsilon.  The reference/torch default is 1e-8; RAISING it is
    # the principled counter to the late-training spiral (QUALITY.md
    # defect #5): once a head converges its second moments go tiny and
    # the next gradient burst is divided by ~sqrt(nu) ~ 0 — a larger eps
    # floors that divisor, bounding the update at g/eps.  Self-conditioned
    # multi-loop training at lr 6e-4 spirals deterministically with 1e-8.
    adam_eps: float = 1e-8
    grad_clip_norm: float = 0.0  # 0 disables (ref train.py:102 is broken anyway)
    # UPDATE clipping (per-leaf RMS of the Adam-normalized update, applied
    # AFTER scale_by_adam and BEFORE the lr scaling — optax
    # clip_by_block_rms).  Gradient clipping cannot stop the measured
    # spirals because the gradients are not large — the update g/sqrt(nu)
    # is (tiny second moments after a head converges).  Capping the
    # normalized update's per-leaf RMS at c bounds every parameter's
    # per-step movement at ~c*lr regardless of nu, which covers BOTH
    # observed mechanisms (tiny-nu burst AND the sc loss-landscape cliff
    # that a raised adam_eps did not fix — QUALITY.md).  Steady-state Adam
    # updates have per-element magnitude ~<=1, so c=1.0 is inert on healthy
    # steps.  0 disables (exact optax.adam/adamw semantics).
    update_clip_rms: float = 0.0
    # Exponential moving average of the parameters (the standard diffusion-
    # model stabilizer: Ho et al. 2020 use 0.9999).  When > 0, TrainState
    # carries ema_params (initialized to the init params) and every step
    # blends ema = d*ema + (1-d)*params.  Evaluation/sampling should use
    # the EMA weights: checkpoint.restore_params prefers a checkpoint's
    # ema_params when present.  0 disables (no extra state).
    ema_decay: float = 0.0
    # D3PM hybrid loss (Austin et al. 2021): weight of the direct
    # cross-entropy on p_hat(s_0) added to the posterior KL.  The KL alone
    # barely supervises the context->s_0 map at large t (train/losses.py);
    # 1.0 makes full-length sequence generation actually recover native
    # sequences.  0 reproduces the reference's pure-KL objective.
    seq_ce_weight: float = 1.0
    # LR schedule: 0/0 keeps the reference's constant Adam lr.  A cosine
    # decay horizon (lr_decay_steps > 0, includes warmup) is the standard
    # cure for the late-training Adam instability observed on this model:
    # once a head fully converges its second moments go tiny, the next
    # gradient burst is divided by ~sqrt(nu) ~ 0, and the loss spirals
    # 0.4 -> 6.7 -> NaN within ~70 steps (measured, deterministic at
    # ~step 3950 of a 6k-step run; global-norm clipping does not help
    # because the gradients themselves are not large).
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0
    lr_min_ratio: float = 0.0
    # Self-conditioning TRAINING schedule (round 3 — the multi-loop sc/AAR
    # trade is trained in, not a sampling artifact: QUALITY.md measured the
    # sampling-time gate flat at 0.817-0.820 AAR.  These knobs reshape the
    # training signal instead):
    #   sc_rate            fraction of each batch trained conditioned
    #                      (the Chen et al. recipe uses 0.5)
    #   sc_onset_steps     steps trained fully COLD before conditioning
    #                      starts (late-onset sc: learn the barcode rule
    #                      first, add the estimate afterwards)
    #   sc_rate_warmup     steps to ramp the rate 0 -> sc_rate after onset
    #                      (annealed sc)
    #   sc_seq_loss_weight per-sample weight of the SEQUENCE losses
    #                      (KL + CE) on the conditioned half (<1 keeps the
    #                      sequence head's gradient dominated by the cold
    #                      half; geometry losses stay unweighted)
    #   sc_per_residue     draw the conditioning mask per RESIDUE instead
    #                      of per sample: every training sample is then
    #                      partially cold, so the barcode-rule gradient is
    #                      never fully diluted by a conditioned sample —
    #                      the last schedule-shape mitigation of the
    #                      multi-loop sc/AAR trade (QUALITY.md)
    sc_rate: float = 0.5
    sc_onset_steps: int = 0
    sc_rate_warmup: int = 0
    sc_seq_loss_weight: float = 1.0
    sc_per_residue: bool = False
    # Context-mode dropout: probability that a training sample is
    # presented as fix-structure (geometry un-noised and fully visible,
    # sequence-only supervision) and, with the same probability, as
    # fix-sequence — the per-sample form of the reference's encode_context
    # conditioning flags (diffab_pytorch.py:693-700).  0 trains pure
    # codesign (the reference's only exercised mode), which leaves the
    # fixed-modality SAMPLING modes out-of-distribution: measured 0.18 AAR
    # for fix-structure sequence design from a codesign-only checkpoint vs
    # 0.994 codesign AAR on the same corpus (QUALITY.md round 3).
    # Must be <= 0.5 (the two fixed tasks partition [0, 2p)).
    mode_dropout: float = 0.0
    seed: int = 42
    val_pct: float = 0.1
    log_every: int = 50
    checkpoint_every: int = 1000
    checkpoint_dir: str = "checkpoints"


@dataclasses.dataclass(frozen=True)
class DiffAbConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def default_config() -> DiffAbConfig:
    """The reference's full-size training preset (train.py:62-80)."""
    return DiffAbConfig()


def production_config(steps: int = 12000, batch_size: int = 32,
                      seed: int = 42) -> DiffAbConfig:
    """The measured-best training recipe, bundled (DESIGN.md §3,
    QUALITY.md).

    Everything here was gated by a full 12k-step quality run against the
    reference-default preset before shipping:

    - ``dist_atoms=4`` — backbone-only pair distance channels: +30-44%
      samples/s, quality-free (`runs/quality_combo12k_dist4`).
    - ``d_pair_emb=48`` — narrower pair representation: +7-9% on top,
      quality-free; the combined recipe's gate is
      `runs/quality_combo12k_prod`.
    - bfloat16 compute (MXU-native; params stay f32).
    - lr 6e-4 under warmup+cosine over the full horizon, grad-norm clip,
      per-leaf update-RMS cap 1.0 and parameter-EMA 0.999 — the
      robustness set: the plain recipe damaged 2 of 4 seed-matrix runs,
      the robust one 0 of 3 (QUALITY.md seed matrix).
    - ``mode_dropout=0.15`` — one checkpoint serves codesign AND the
      fixed-modality conditioning modes (fix-structure AAR 0.18 -> 0.999,
      codesign unchanged — QUALITY.md round 3).

    ``steps`` must be the real training horizon: peak lr 6e-4 is only
    stable because the cosine decays over it (QUALITY.md lr note).
    Checkpoints record the model config; sampling reads it back, so
    designs from a production checkpoint need no extra flags.
    """
    return DiffAbConfig(
        model=dataclasses.replace(
            ModelConfig(),
            dist_atoms=4,
            d_pair_emb=48,
            compute_dtype="bfloat16",
        ),
        train=dataclasses.replace(
            TrainConfig(),
            batch_size=batch_size,
            lr=6e-4,
            lr_warmup_steps=min(100, steps // 10),
            lr_decay_steps=steps,
            grad_clip_norm=1.0,
            update_clip_rms=1.0,
            ema_decay=0.999,
            mode_dropout=0.15,
            seed=seed,
        ),
    )


def tiny_config() -> DiffAbConfig:
    """BASELINE config #1: 2 IPA blocks, d=32 — CPU-runnable end-to-end."""
    return DiffAbConfig(
        model=ModelConfig(
            d_residue_emb=32,
            d_pair_emb=16,
            n_ipa_layers=2,
            d_scalar_per_head=8,
            n_query_point_per_head=4,
            n_value_point_per_head=4,
            n_head=4,
        ),
        train=TrainConfig(batch_size=2),
    )
