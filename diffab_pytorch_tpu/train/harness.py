"""The DiffAb training harness: noising, loss, optimizer, jitted steps.

TPU-native equivalent of the Lightning-module half of the reference
(`diffab_pytorch/diffab_pytorch.py:628-931`: _add_noise, _shared_step,
training_step/validation_step, configure_optimizers) — re-designed
functionally: the harness owns the static pieces (model, schedule, IGSO3
tables, optimizer), state lives in a TrainState pytree, and the train step
is ONE jitted pure function (loss + grad + update fused into a single XLA
program, no framework callbacks between).

Metric names match the reference's logging exactly
({train,val}/{seq_loss, translations_loss, orientations_loss, loss},
diffab_pytorch.py:889-922) so dashboards translate 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from diffab_pytorch_tpu.config import DiffAbConfig
from diffab_pytorch_tpu.data.batch import ProteinBatch
from diffab_pytorch_tpu.diffusion import (
    coordinate,
    make_orientation_tables,
    orientation,
    sequence,
)
from diffab_pytorch_tpu.diffusion.orientation import OrientationDiffusionTables
from diffab_pytorch_tpu.diffusion.schedule import (
    DiffusionSchedule,
    cosine_variance_schedule,
)
from diffab_pytorch_tpu.models.diffab import DiffAbModel
from diffab_pytorch_tpu.train.losses import diffab_losses


@flax.struct.dataclass
class TrainState:
    """Replicatable/shardable training state pytree."""

    step: jax.Array
    params: dict
    opt_state: optax.OptState
    # EMA of params (TrainConfig.ema_decay > 0) — None when disabled, so
    # states/checkpoints from runs without EMA keep their pytree structure.
    ema_params: dict | None = None


@flax.struct.dataclass
class NoisedSample:
    """Output of the forward-noising pass (reference _add_noise,
    diffab_pytorch.py:778-806)."""

    t: jax.Array  # (b,)
    beta: jax.Array  # (b,)
    seq_idx_t: jax.Array  # (b, L)
    seq_posterior: jax.Array  # (b, L, K) — true posterior (KL target)
    translations_t: jax.Array  # (b, L, 3)
    translations_eps: jax.Array  # (b, L, 3) — true noise (MSE target)
    orientations_t: jax.Array  # (b, L, 3, 3)


class DiffAb:
    """Owns model + diffusion tables + optimizer; produces jitted steps.

    The drop-in counterpart of the reference's DiffAb LightningModule
    constructor wiring (diffab_pytorch.py:650-678)."""

    def __init__(self, config: DiffAbConfig | None = None):
        self.config = config or DiffAbConfig()
        if not 0.0 <= self.config.train.mode_dropout <= 0.5:
            raise ValueError(
                "TrainConfig.mode_dropout must be in [0, 0.5] "
                f"(got {self.config.train.mode_dropout}): the two fixed-"
                "modality tasks each take probability p out of [0, 2p)"
            )
        self.model = DiffAbModel(self.config.model)
        d = self.config.diffusion
        self.sched: DiffusionSchedule = cosine_variance_schedule(
            d.T, s=d.s, beta_max=d.beta_max
        )
        self.orientation_tables: OrientationDiffusionTables = make_orientation_tables(
            self.sched,
            n_bins=d.igso3_n_bins,
            n_terms=d.igso3_n_terms,
            sigma_threshold=d.igso3_sigma_threshold,
        )
        self.optimizer = self._make_optimizer()

    # ------------------------------------------------------------------
    def _make_optimizer(self) -> optax.GradientTransformation:
        t = self.config.train
        if t.lr_decay_steps > 0:
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if t.lr_warmup_steps else t.lr,
                peak_value=t.lr,
                warmup_steps=t.lr_warmup_steps,
                decay_steps=t.lr_decay_steps,  # includes warmup
                end_value=t.lr * t.lr_min_ratio,
            )
        elif t.lr_warmup_steps > 0:
            lr = optax.linear_schedule(0.0, t.lr, t.lr_warmup_steps)
        else:
            lr = t.lr  # constant — the reference's choice (train.py:97)
        # Decomposed adam/adamw (optax.adam == scale_by_adam + lr scaling;
        # adamw adds add_decayed_weights between them) so UPDATE clipping
        # can sit after the normalization and before the lr — see
        # TrainConfig.update_clip_rms.  Exactly optax.adam(w) semantics
        # when update_clip_rms == 0.
        txs = []
        if t.grad_clip_norm > 0:
            txs.append(optax.clip_by_global_norm(t.grad_clip_norm))
        txs.append(optax.scale_by_adam(b1=t.betas[0], b2=t.betas[1],
                                       eps=t.adam_eps))
        if t.update_clip_rms > 0:
            txs.append(optax.clip_by_block_rms(t.update_clip_rms))
        if t.weight_decay > 0:
            txs.append(optax.add_decayed_weights(t.weight_decay))
        txs.append(optax.scale_by_learning_rate(lr))
        return optax.chain(*txs)

    def init(self, key: jax.Array, sample_batch: ProteinBatch) -> TrainState:
        """Initialize parameters and optimizer state from one batch.

        Init runs jitted ON THE CPU BACKEND and the resulting (small) state
        is transferred once: flax init executed eagerly is pathological on
        remote/tunneled TPU backends (one RPC per op), and even jitted it
        is a multi-minute accelerator compile for zero benefit — the
        initializers are host-sized work."""
        b = sample_batch.batch_size
        beta = jnp.zeros((b,), dtype=jnp.float32)

        default = jax.devices()[0]
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = default

        key, batch_cpu, beta = jax.device_put((key, sample_batch, beta), cpu)
        params = jax.jit(self.model.init)(
            key,
            batch_cpu,
            batch_cpu.seq_idx,
            batch_cpu.translations,
            batch_cpu.orientations,
            beta,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=jax.jit(self.optimizer.init)(params),
            ema_params=(jax.tree.map(jnp.copy, params)
                        if self.config.train.ema_decay > 0 else None),
        )
        if default.platform != cpu.platform:
            state = jax.device_put(state, default)
        return state

    # ------------------------------------------------------------------
    def add_noise(
        self, key: jax.Array, batch: ProteinBatch, t: jax.Array,
        seq_generation_mask: jax.Array | None = None,
        struct_generation_mask: jax.Array | None = None,
    ) -> NoisedSample:
        """Run all three forward diffusions at timestep t (reference
        _add_noise, diffab_pytorch.py:778-806).

        seq_generation_mask / struct_generation_mask override which
        positions each modality noises (context-mode dropout: a visible
        modality stays at t0, exactly what the fixed-modality sampler
        feeds the denoiser).  Default: batch.generation_mask for both."""
        sgm = (batch.generation_mask if seq_generation_mask is None
               else seq_generation_mask)
        stm = (batch.generation_mask if struct_generation_mask is None
               else struct_generation_mask)
        k_seq, k_coord, k_orient = jax.random.split(key, 3)
        seq_idx_t, seq_posterior = sequence.diffuse_from_t0(
            k_seq, self.sched, batch.seq_idx, t, sgm,
            self.config.model.aa_vocab_size,
        )
        translations_t, translations_eps = coordinate.diffuse_from_t0(
            k_coord, self.sched, batch.translations, t, stm
        )
        orientations_t = orientation.diffuse_from_t0(
            k_orient, self.orientation_tables, batch.orientations, t, stm,
        )
        return NoisedSample(
            t=t,
            beta=self.sched.beta[t],
            seq_idx_t=seq_idx_t,
            seq_posterior=seq_posterior,
            translations_t=translations_t,
            translations_eps=translations_eps,
            orientations_t=orientations_t,
        )

    def _sc_rate(self, step) -> jax.Array | float:
        """Self-conditioning rate at `step` (TrainConfig sc_* schedule).
        step=None (eval, legacy callers) -> the full configured rate."""
        t = self.config.train
        if step is None or (t.sc_onset_steps == 0 and t.sc_rate_warmup == 0):
            return t.sc_rate
        prog = (step - t.sc_onset_steps) / max(t.sc_rate_warmup, 1)
        return t.sc_rate * jnp.clip(prog, 0.0, 1.0)

    def loss_fn(
        self, params, key: jax.Array, batch: ProteinBatch, step=None
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """One stochastic training loss evaluation: t ~ U[1, T] per batch
        element, noise, encode, denoise, three masked losses (reference
        _shared_step, diffab_pytorch.py:808-880).  `step` (traced or None)
        drives the self-conditioning schedule only."""
        k_t, k_noise, k_sc, k_mode = jax.random.split(key, 4)
        b = batch.batch_size
        t = jax.random.randint(k_t, (b,), 1, self.config.diffusion.T + 1)

        # Context-mode dropout (TrainConfig.mode_dropout = p): with
        # probability p each, a sample is presented as fix-structure
        # (geometry un-noised + fully visible, sequence-only supervision)
        # or fix-sequence (the mirror) instead of codesign — so ONE
        # checkpoint supports all three of the reference's conditioning
        # modes (encode_context flags, diffab_pytorch.py:693-700) at
        # sampling time.  Measured necessity: a codesign-only checkpoint
        # scores 0.18 AAR in fix-structure sampling (QUALITY.md round 3) —
        # the fixed-modality context configurations are out-of-distribution
        # unless trained.
        p = self.config.train.mode_dropout
        if p > 0.0:
            u = jax.random.uniform(k_mode, (b,))
            struct_visible = u < p  # fix-structure samples
            seq_visible = (u >= p) & (u < 2.0 * p)  # fix-sequence samples
            seq_gen = batch.generation_mask & ~seq_visible[:, None]
            struct_gen = batch.generation_mask & ~struct_visible[:, None]
        else:
            struct_visible = seq_visible = None
            seq_gen = struct_gen = None
        noised = self.add_noise(
            k_noise, batch, t,
            seq_generation_mask=seq_gen, struct_generation_mask=struct_gen,
        )

        if self.config.model.self_conditioning:
            # Self-conditioning (config.py): a stop-gradient first pass
            # supplies the clean-state estimate for a random half of the
            # samples — the model learns BOTH the cold start (sampling
            # step T) and the conditioned steps (all later ones).
            # The context/pair encoding is identical between the two
            # passes, so encode ONCE (and hoist the pair-bias logits) and
            # run only the denoiser twice — mirroring the sampler's reuse.
            # Gradients are unchanged: the first pass contributes none
            # (its outputs pass through stop_gradient), and the shared
            # encoding back-props through the second pass exactly as the
            # full forward did.
            from diffab_pytorch_tpu.models.ipa import precompute_pair_biases

            res_emb, pair_emb = self.model.apply(
                params, batch, method="encode_context",
                structure_visible=struct_visible,
                sequence_visible=seq_visible,
            )
            pair_biases = precompute_pair_biases(
                params["params"]["denoiser"]["ipa"], pair_emb
            )

            def denoise(**sc_kwargs):
                return self.model.apply(
                    params,
                    noised.seq_idx_t,
                    noised.translations_t,
                    noised.orientations_t,
                    res_emb,
                    pair_emb,
                    noised.beta,
                    batch.generation_mask,
                    batch.residue_mask,
                    pair_biases=pair_biases,
                    method="denoise",
                    **sc_kwargs,
                )

            first = denoise()
            x0_hat = coordinate.predicted_x0(
                self.sched, noised.translations_t,
                first["translations_eps"], t,
            )
            # Per-sample (b,) by default; per-RESIDUE (b, L) when
            # TrainConfig.sc_per_residue — each residue is conditioned
            # independently, so every sample keeps cold rows and the
            # barcode-rule gradient is never fully diluted (QUALITY.md
            # multi-loop sc/AAR trade).
            sc_shape = ((b, batch.seq_idx.shape[1])
                        if self.config.train.sc_per_residue else (b,))
            sc_mask = jax.random.bernoulli(
                k_sc, self._sc_rate(step), sc_shape)
            if struct_visible is not None:
                # the structure estimate is meaningless (and the implied
                # x0_hat ill-conditioned) when the geometry is fixed
                sv = (struct_visible[:, None] if sc_mask.ndim == 2
                      else struct_visible)
                sc_mask = sc_mask & ~sv
            denoised = denoise(
                sc_translations_x0=jax.lax.stop_gradient(x0_hat),
                sc_seq_probs=jax.lax.stop_gradient(first["seq_posterior"]),
                sc_mask=sc_mask,
            )
        else:
            denoised = self.model.apply(
                params,
                batch,
                noised.seq_idx_t,
                noised.translations_t,
                noised.orientations_t,
                noised.beta,
                structure_visible=struct_visible,
                sequence_visible=seq_visible,
            )
        # The head predicts p_hat(s_0); the KL's predicted distribution is
        # the derived posterior q(s_{t-1}|s_t, p_hat(s_0)) — the SAME
        # transform the sampler draws from, so train and sample semantics
        # agree (DESIGN.md §2 #15).
        seq_log_posterior_pred = sequence.log_posterior_from_predicted_t0(
            self.sched, noised.seq_idx_t, denoised["seq_posterior"], t,
            seq_gen if seq_gen is not None else batch.generation_mask,
        )
        seq_w = None
        if (self.config.model.self_conditioning
                and self.config.train.sc_seq_loss_weight != 1.0):
            w = self.config.train.sc_seq_loss_weight
            seq_w = jnp.where(sc_mask, w, 1.0)  # (b,) or (b, L)
        losses = diffab_losses(
            denoised,
            seq_log_posterior_pred,
            noised.seq_posterior,
            noised.translations_eps,
            batch.orientations,
            batch.generation_mask,
            batch.residue_mask,
            seq_idx_t0_true=batch.seq_idx,
            seq_ce_weight=self.config.train.seq_ce_weight,
            seq_sample_weight=seq_w,
            seq_gen_mask=seq_gen,
            struct_gen_mask=struct_gen,
        )
        return losses["loss"], losses

    # ------------------------------------------------------------------
    def train_step_impl(
        self, state: TrainState, batch: ProteinBatch, key: jax.Array
    ):
        """The pure (unjitted) train step — also the body the parallel
        layer partitions with GSPMD.

        The key is folded with state.step INSIDE the jit: callers can pass
        the same base key every step (distinct randomness per step, zero
        per-step host-side key ops — on tunneled/remote backends each host
        key op costs a dispatch round-trip that dominated the step time)."""
        key = jax.random.fold_in(key, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: self.loss_fn(p, key, batch, step=state.step),
            has_aux=True,
        )
        (_, metrics), grads = grad_fn(state.params)
        new_state = self.apply_gradients(state, grads)
        metrics = {f"train/{k}": v for k, v in metrics.items()}
        return new_state, metrics

    def apply_gradients(self, state: TrainState, grads) -> TrainState:
        """Optimizer update + param apply + EMA blend — the shared tail of
        every train step (single-device, pool, and parallel/dp.py)."""
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = self.config.train.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                               ema, params)
        return TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema,
        )

    def make_train_step(self, donate: bool = True):
        """Build the jitted single-device train step:
        (state, batch, key) -> (state, metrics)."""
        return jax.jit(
            self.train_step_impl, donate_argnums=(0,) if donate else ()
        )

    def make_pool_train_step(self, donate: bool = True,
                             steps_per_call: int = 1):
        """Jitted train step over a DEVICE-RESIDENT sample pool:
        (state, pool, idx, key) -> (state, metrics), where pool is a
        ProteinBatch holding the whole dataset (PatchDataset.device_pool)
        and idx is the (b,) int32 row selection for this step.

        The batch is gathered on device, so the per-step host->device
        transfer is 4*b bytes of indices instead of megabytes of features.
        On tunneled/remote backends the feature transfer is the binding
        cost once the host pipeline is cached: measured 384 -> ~790
        samples/s at batch 32 on v5e-over-tunnel (DESIGN.md §3), the
        device-resident ceiling.  Prefer this whenever the dataset fits
        HBM — measured at the full SAbDab inventory scale: 8,333 K=128
        patches = 0.28 GB on-chip (~34 KB/sample; the round-5 dress
        rehearsal, runs/r5_dress/rehearsal.json — an earlier ~1.4 GB
        estimate here overcounted 5x).

        steps_per_call = k > 1 runs k optimizer steps per dispatch as one
        on-device `lax.scan` over a (k, b) index block — the round-4
        dispatch-gap lever: after the one-hot table fix the production
        step's device time (~12 ms) is short enough that the ~2-5 ms
        per-call host dispatch through the remote tunnel is a double-digit
        tax.  Numerics are EXACTLY the k=1 chain's (the per-step key fold
        uses state.step inside the jit, so scanned steps consume the same
        key sequence — pinned in tests/test_train_infra.py); metrics come
        back stacked (k,) per entry."""
        k = int(steps_per_call)

        def step(state: TrainState, pool: ProteinBatch, idx: jax.Array,
                 key: jax.Array):
            if k == 1:
                batch = jax.tree.map(lambda x: x[idx], pool)
                return self.train_step_impl(state, batch, key)

            def body(st, idx_t):
                batch = jax.tree.map(lambda x: x[idx_t], pool)
                return self.train_step_impl(st, batch, key)

            return jax.lax.scan(body, state, idx)  # idx: (k, b)

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self):
        """Jitted validation step: (params, batch, key) -> metrics."""

        def eval_step(params, batch: ProteinBatch, key: jax.Array):
            _, metrics = self.loss_fn(params, key, batch)
            return {f"val/{k}": v for k, v in metrics.items()}

        return jax.jit(eval_step)

    # ------------------------------------------------------------------
    def encode_context(self, params, batch: ProteinBatch,
                       generate_structure: bool = True,
                       generate_sequence: bool = True):
        return self.model.apply(
            params, batch,
            generate_structure=generate_structure,
            generate_sequence=generate_sequence,
            method="encode_context",
        )

    def denoise(self, params, *args, **kwargs):
        return self.model.apply(params, *args, method="denoise", **kwargs)

    def sample(self, params, batch: ProteinBatch, key: jax.Array, **kwargs):
        """Reverse-diffusion design/optimization — see sampling.sampler
        (the reference's unimplemented DiffAb.sample,
        diffab_pytorch.py:770-776)."""
        from diffab_pytorch_tpu.sampling.sampler import sample as _sample

        return _sample(
            self.model, params, self.sched, self.orientation_tables, batch,
            key, **kwargs,
        )

    def score_designs(self, params, batch: ProteinBatch, designs,
                      key: jax.Array, **kwargs):
        """Likelihood-rank designs without ground truth — see
        sampling.scoring (Monte-Carlo ELBO terms on the design; lower is
        better, comparable within one target's designs)."""
        from diffab_pytorch_tpu.sampling.scoring import score_designs as _score

        return _score(
            self.model, params, self.sched, self.orientation_tables, batch,
            designs, key, **kwargs,
        )
