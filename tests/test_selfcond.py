"""Self-conditioning contracts (config.py ModelConfig.self_conditioning).

The mechanism is OURS (the reference has no sampler to condition —
diffab_pytorch.py:770-776); the recipe is the standard one (Chen et al.
2022; RFdiffusion).  Pinned here:

  * default OFF leaves the parameter tree bit-identical (checkpoints and
    the golden weight-transplant test are untouched);
  * SE(3) equivariance holds WITH conditioning (the sc features are built
    invariantly: local-frame displacement + p(s_0) + flag);
  * the flag gates the features (flag 0 == no estimate given);
  * training and sampling run end to end with it on.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import DiffAbConfig, tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.models.diffab import DiffAbModel
from diffab_pytorch_tpu.train import DiffAb

B, L = 2, 32


def sc_config() -> DiffAbConfig:
    cfg = tiny_config()
    return dc.replace(cfg, model=dc.replace(cfg.model, self_conditioning=True))


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), B, L, 15, n_generate=8)


@pytest.fixture(scope="module")
def harness():
    return DiffAb(sc_config())


@pytest.fixture(scope="module")
def state(harness, batch):
    return harness.init(jax.random.key(1), batch)


def test_default_off_param_tree_unchanged(batch):
    """self_conditioning=False must init the exact tree of the pre-feature
    code: same leaves, same shapes (the golden transplant test depends on
    it)."""
    base = DiffAb(tiny_config()).init(jax.random.key(1), batch).params
    d = tiny_config().model.d_residue_emb
    fuse0 = base["params"]["denoiser"]["fuse_0"]["kernel"]
    assert fuse0.shape[0] == 2 * d  # no sc feature columns

    sc = DiffAb(sc_config()).init(jax.random.key(1), batch).params
    fuse0_sc = sc["params"]["denoiser"]["fuse_0"]["kernel"]
    K = tiny_config().model.aa_vocab_size
    assert fuse0_sc.shape[0] == 2 * d + 3 + K + 1
    # every OTHER leaf keeps its shape
    flat = dict(jax.tree_util.tree_flatten_with_path(base)[0])
    flat_sc = dict(jax.tree_util.tree_flatten_with_path(sc)[0])
    assert set(map(str, flat)) == set(map(str, flat_sc))
    for kpath, leaf in flat.items():
        if "fuse_0" in str(kpath) and "kernel" in str(kpath):
            continue
        assert leaf.shape == flat_sc[kpath].shape, kpath


def test_flag_zero_equals_no_estimate(harness, state, batch):
    """sc features with flag 0 must produce the SAME output as passing no
    estimate at all — the gate is the only path in."""
    beta = jnp.full((B,), 0.2)
    x_t = batch.translations
    r_t = batch.orientations
    base = harness.model.apply(
        state.params, batch, batch.seq_idx, x_t, r_t, beta
    )
    gated = harness.model.apply(
        state.params, batch, batch.seq_idx, x_t, r_t, beta,
        sc_translations_x0=x_t + 3.0,
        sc_seq_probs=jnp.full((B, L, 21), 1 / 21.0),
        sc_mask=jnp.zeros((B,)),
    )
    for k in base:
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(gated[k]), atol=1e-6
        )
    # ... and flag 1 actually changes the prediction
    on = harness.model.apply(
        state.params, batch, batch.seq_idx, x_t, r_t, beta,
        sc_translations_x0=x_t + 3.0,
        sc_seq_probs=jnp.full((B, L, 21), 1 / 21.0),
        sc_mask=jnp.ones((B,)),
    )
    assert float(jnp.abs(on["translations_eps"]
                         - base["translations_eps"]).max()) > 1e-4


def test_se3_equivariance_with_conditioning(batch):
    """The sc features are invariant by construction, so the heads keep
    their covariance under a global rotation WITH an estimate plugged in
    (the estimate rotates with the system)."""
    cfg = sc_config().model
    model = DiffAbModel(dc.replace(cfg, compute_dtype="float32"))
    beta = jnp.array([0.01, 0.4])
    k = jax.random.key(3)
    x_t = batch.translations + 0.1 * jax.random.normal(k, (B, L, 3))
    r_t = batch.orientations
    sc_x = batch.translations + 0.2 * jax.random.normal(
        jax.random.key(4), (B, L, 3)
    )
    sc_p = jax.nn.softmax(
        jax.random.normal(jax.random.key(5), (B, L, 21)), axis=-1
    )
    flag = jnp.ones((B,))
    params = model.init(jax.random.key(0), batch, batch.seq_idx, x_t, r_t,
                        beta)

    theta = 1.1
    q = jnp.array(
        [[jnp.cos(theta), -jnp.sin(theta), 0.0],
         [jnp.sin(theta), jnp.cos(theta), 0.0],
         [0.0, 0.0, 1.0]]
    )
    rot_batch = batch.replace(
        xyz=batch.xyz @ q, orientations=batch.orientations @ q
    )
    out = model.apply(params, batch, batch.seq_idx, x_t, r_t, beta,
                      sc_translations_x0=sc_x, sc_seq_probs=sc_p,
                      sc_mask=flag)
    out_r = model.apply(params, rot_batch, batch.seq_idx, x_t @ q, r_t @ q,
                        beta, sc_translations_x0=sc_x @ q, sc_seq_probs=sc_p,
                        sc_mask=flag)
    np.testing.assert_allclose(
        np.asarray(out_r["translations_eps"]),
        np.asarray(out["translations_eps"] @ q), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["orientations_t0"]),
        np.asarray(out["orientations_t0"] @ q), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["seq_posterior"]),
        np.asarray(out["seq_posterior"]), atol=2e-4,
    )


def test_train_and_sample_end_to_end(harness, state, batch):
    step = harness.make_train_step(donate=False)
    s2, metrics = step(state, batch, jax.random.key(7))
    assert np.isfinite(float(metrics["train/loss"]))
    # params moved (gradients flow through the conditioned pass)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s2.params
    )
    assert max(jax.tree.leaves(moved)) > 0

    res = harness.sample(state.params, batch, jax.random.key(8), n_steps=4,
                         n_designs=2)
    assert res.seq_idx.shape == (2 * B, L)
    assert np.isfinite(np.asarray(res.translations)).all()
    # determinism under the same key
    res2 = harness.sample(state.params, batch, jax.random.key(8), n_steps=4,
                          n_designs=2)
    np.testing.assert_array_equal(np.asarray(res.seq_idx),
                                  np.asarray(res2.seq_idx))


def test_sc_inputs_rejected_when_off(batch):
    h = DiffAb(tiny_config())
    params = h.init(jax.random.key(1), batch).params
    with pytest.raises(ValueError, match="self_conditioning is off"):
        h.model.apply(
            params, batch, batch.seq_idx, batch.translations,
            batch.orientations, jnp.full((B,), 0.2),
            sc_translations_x0=batch.translations,
            sc_seq_probs=jnp.full((B, L, 21), 1 / 21.0),
            sc_mask=jnp.ones((B,)),
        )


def test_scoring_works_with_sc_model(harness, state, batch):
    """score_designs runs single-pass (flag 0) against an sc model — the
    cold-start path the model trains for."""
    designs = harness.sample(state.params, batch, jax.random.key(9),
                             n_designs=2, n_steps=4)
    sc = harness.score_designs(state.params, batch, designs,
                               jax.random.key(10), t_grid=(1, 5), n_draws=1)
    assert sc.score.shape == (2 * B,)
    assert np.isfinite(np.asarray(sc.score)).all()


def test_huge_estimate_stays_finite(harness, state, batch):
    """The implied x0_hat at high t is O(1/sqrt(abar)) — unbounded it NaN'd
    training within 600 steps (quality run 2026-08-17).  The denoiser must
    saturate the sc displacement: huge estimates give finite outputs and a
    finite training loss."""
    beta = jnp.full((B,), 0.999)
    out = jax.jit(
        lambda p: harness.model.apply(
            p, batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
            sc_translations_x0=batch.translations + 1e6,
            sc_seq_probs=jnp.full((B, L, 21), 1 / 21.0),
            sc_mask=jnp.ones((B,)),
        )
    )(state.params)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # gradient through a full loss with the huge-estimate pass stays finite
    # (jitted: the eager op-by-op grad took ~50 s of the suite wall)
    loss, g = jax.jit(
        jax.value_and_grad(
            lambda p: harness.loss_fn(p, jax.random.key(11), batch)[0]
        )
    )(state.params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_geometry_only_variant(batch):
    """self_conditioning_sequence=False drops the p(s_0) columns (the
    multi-loop recipe): narrower fuse layer, flag gating still exact."""
    cfg = sc_config()
    cfg = dc.replace(cfg, model=dc.replace(
        cfg.model, self_conditioning_sequence=False))
    h = DiffAb(cfg)
    state = h.init(jax.random.key(1), batch)
    d = cfg.model.d_residue_emb
    fuse0 = state.params["params"]["denoiser"]["fuse_0"]["kernel"]
    assert fuse0.shape[0] == 2 * d + 3 + 1  # no p(s_0) columns

    beta = jnp.full((B,), 0.2)
    base = h.model.apply(state.params, batch, batch.seq_idx,
                         batch.translations, batch.orientations, beta)
    gated = h.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
        sc_translations_x0=batch.translations + 2.0,
        sc_seq_probs=jnp.full((B, L, 21), 1 / 21.0),  # accepted, ignored
        sc_mask=jnp.zeros((B,)),
    )
    np.testing.assert_allclose(np.asarray(base["translations_eps"]),
                               np.asarray(gated["translations_eps"]),
                               atol=1e-6)
    # train + sample run end to end
    s2, m = h.make_train_step(donate=False)(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["train/loss"]))
    res = h.sample(state.params, batch, jax.random.key(3), n_steps=3)
    assert np.isfinite(np.asarray(res.translations)).all()


def test_sc_t_max_gating(harness, state, batch):
    """sc_t_max >= T is identical to ungated; sc_t_max=0 (never condition)
    differs from the conditioned chain with the same key."""
    kw = dict(n_steps=4, n_designs=2)
    full = harness.sample(state.params, batch, jax.random.key(12), **kw)
    gated_all = harness.sample(state.params, batch, jax.random.key(12),
                               sc_t_max=harness.sched.T, **kw)
    np.testing.assert_array_equal(np.asarray(full.seq_idx),
                                  np.asarray(gated_all.seq_idx))
    np.testing.assert_array_equal(np.asarray(full.translations),
                                  np.asarray(gated_all.translations))
    cold = harness.sample(state.params, batch, jax.random.key(12),
                          sc_t_max=0, **kw)
    assert float(jnp.abs(cold.translations - full.translations).max()) > 0


def test_sc_rate_schedule(batch):
    """TrainConfig sc_onset_steps / sc_rate_warmup shape the conditioning
    rate: zero before onset, linear ramp to sc_rate, constant after."""
    from diffab_pytorch_tpu.config import TrainConfig

    cfg = sc_config()
    cfg = dc.replace(cfg, train=TrainConfig(
        sc_rate=0.5, sc_onset_steps=100, sc_rate_warmup=200))
    h = DiffAb(cfg)
    assert float(h._sc_rate(0)) == 0.0
    assert float(h._sc_rate(100)) == 0.0
    np.testing.assert_allclose(float(h._sc_rate(200)), 0.25)
    np.testing.assert_allclose(float(h._sc_rate(300)), 0.5)
    np.testing.assert_allclose(float(h._sc_rate(10_000)), 0.5)
    # legacy callers without a step get the full rate
    assert h._sc_rate(None) == 0.5
    # pure onset (no warmup): a step function
    h2 = DiffAb(dc.replace(cfg, train=TrainConfig(
        sc_rate=0.5, sc_onset_steps=100)))
    assert float(h2._sc_rate(99)) == 0.0
    np.testing.assert_allclose(float(h2._sc_rate(101)), 0.5)
    # default config: constant, no tracing of step needed
    assert DiffAb(sc_config())._sc_rate(None) == 0.5


def test_sc_onset_train_step_is_cold(batch):
    """Before sc_onset_steps the train step's loss equals the rate-0
    (all-cold) loss with the same key: the schedule really gates the mask."""
    from diffab_pytorch_tpu.config import TrainConfig

    common = dict(batch_size=B, lr=1e-3, seed=0)
    cfg_onset = dc.replace(sc_config(), train=TrainConfig(
        sc_onset_steps=1000, **common))
    cfg_rate0 = dc.replace(sc_config(), train=TrainConfig(
        sc_rate=0.0, **common))
    h_onset, h_rate0 = DiffAb(cfg_onset), DiffAb(cfg_rate0)
    state = h_onset.init(jax.random.key(1), batch)
    # jitted with (key, step) as operands: the eager per-key loss_fn loop
    # cost ~15 s of suite wall; one compile (cached) serves every call
    f_on = jax.jit(lambda p, k, s: h_onset.loss_fn(p, k, batch, step=s)[0])
    f_r0 = jax.jit(lambda p, k, s: h_rate0.loss_fn(p, k, batch, step=s)[0])
    l1 = f_on(state.params, jax.random.key(5), 3)
    l2 = f_r0(state.params, jax.random.key(5), 3)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # after onset the conditioned mask fires and the loss differs — over
    # several keys (a single key can draw an all-cold mask at b=2)
    diffs = []
    for k in range(8):
        la = f_on(state.params, jax.random.key(k), 2000)
        lb = f_r0(state.params, jax.random.key(k), 2000)
        diffs.append(abs(float(la) - float(lb)))
    assert max(diffs) > 1e-6


def test_sc_seq_loss_weight(batch):
    """sc_seq_loss_weight=1 is bit-identical to the unweighted path;
    weight<1 changes only the sequence terms."""
    from diffab_pytorch_tpu.config import TrainConfig

    common = dict(batch_size=B, lr=1e-3, seed=0)
    h_w1 = DiffAb(dc.replace(sc_config(), train=TrainConfig(
        sc_seq_loss_weight=1.0, **common)))
    h_w25 = DiffAb(dc.replace(sc_config(), train=TrainConfig(
        sc_seq_loss_weight=0.25, **common)))
    h_plain = DiffAb(dc.replace(sc_config(), train=TrainConfig(**common)))
    state = h_plain.init(jax.random.key(1), batch)

    # jitted with the key as an operand (cached; the eager loop cost ~10 s)
    f_w1 = jax.jit(lambda p, k: h_w1.loss_fn(p, k, batch, step=1)[1])
    f_w25 = jax.jit(lambda p, k: h_w25.loss_fn(p, k, batch, step=1)[1])
    f_plain = jax.jit(lambda p, k: h_plain.loss_fn(p, k, batch, step=1)[1])
    m1 = f_w1(state.params, jax.random.key(7))
    mp = f_plain(state.params, jax.random.key(7))
    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]), rtol=1e-7)

    # over several keys (a single key can draw an all-cold or all-hot mask
    # at b=2, where the weighted mean degenerates to the plain mean):
    # geometry terms ALWAYS identical, sequence terms differ on mixed masks
    seq_diffs = []
    for k in range(8):
        m25 = f_w25(state.params, jax.random.key(k))
        mk = f_plain(state.params, jax.random.key(k))
        np.testing.assert_allclose(float(m25["translations_loss"]),
                                   float(mk["translations_loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m25["orientations_loss"]),
                                   float(mk["orientations_loss"]), rtol=1e-6)
        seq_diffs.append(abs(float(m25["seq_loss"]) - float(mk["seq_loss"])))
    assert max(seq_diffs) > 1e-8


def test_seq_sample_weight_mechanism():
    """diffab_losses seq_sample_weight: deterministic unit check — the
    weighted sequence mean moves toward the up-weighted sample; geometry
    and weight-of-ones paths are untouched."""
    from diffab_pytorch_tpu.train.losses import diffab_losses

    rng = np.random.default_rng(0)
    b, Lh, K = 2, 6, 21
    denoised = {
        "seq_logits": jnp.asarray(rng.normal(size=(b, Lh, K)), jnp.float32),
        "translations_eps": jnp.asarray(rng.normal(size=(b, Lh, 3)), jnp.float32),
        "orientations_t0": jnp.broadcast_to(jnp.eye(3), (b, Lh, 3, 3)),
    }
    log_post = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(b, Lh, K)), jnp.float32), axis=-1
    )
    post_true = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(b, Lh, K)), jnp.float32), axis=-1
    )
    eps_true = jnp.asarray(rng.normal(size=(b, Lh, 3)), jnp.float32)
    r_true = jnp.broadcast_to(jnp.eye(3), (b, Lh, 3, 3))
    gen = jnp.ones((b, Lh), bool)
    args = (denoised, log_post, post_true, eps_true, r_true, gen, gen)
    kw = dict(seq_idx_t0_true=jnp.zeros((b, Lh), jnp.int32), seq_ce_weight=1.0)

    base = diffab_losses(*args, **kw)
    ones = diffab_losses(*args, seq_sample_weight=jnp.ones((b,)), **kw)
    np.testing.assert_allclose(float(base["loss"]), float(ones["loss"]), rtol=1e-7)

    w = diffab_losses(*args, seq_sample_weight=jnp.asarray([1.0, 0.25]), **kw)
    # sequence mean moves toward sample 0's per-sample mean
    only0 = diffab_losses(
        *args[:5], jnp.asarray([[True] * Lh, [False] * Lh]), gen, **kw
    )
    d_base = abs(float(base["seq_loss"]) - float(only0["seq_loss"]))
    d_w = abs(float(w["seq_loss"]) - float(only0["seq_loss"]))
    assert d_w < d_base
    np.testing.assert_allclose(float(w["translations_loss"]),
                               float(base["translations_loss"]), rtol=1e-7)


def test_sc_mask_per_residue(harness, state, batch):
    """sc_mask may be (b, L): all-zeros equals no estimate, all-ones equals
    the per-sample ones mask, and a mixed mask is its own program (the gate
    is the only path in, per residue)."""
    beta = jnp.full((B,), 0.2)
    kw = dict(
        sc_translations_x0=batch.translations + 3.0,
        sc_seq_probs=jnp.full((B, L, 21), 1 / 21.0),
    )
    base = harness.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    off = harness.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta, sc_mask=jnp.zeros((B, L)), **kw,
    )
    for k in base:
        np.testing.assert_allclose(np.asarray(base[k]), np.asarray(off[k]),
                                   atol=1e-6)
    on_rows = harness.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta, sc_mask=jnp.ones((B, L)), **kw,
    )
    on_samples = harness.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta, sc_mask=jnp.ones((B,)), **kw,
    )
    np.testing.assert_allclose(np.asarray(on_rows["translations_eps"]),
                               np.asarray(on_samples["translations_eps"]),
                               atol=1e-6)
    half = jnp.arange(L)[None, :] < L // 2
    mixed = harness.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta, sc_mask=jnp.broadcast_to(half, (B, L)),
        **kw,
    )
    assert float(jnp.abs(mixed["translations_eps"]
                         - base["translations_eps"]).max()) > 1e-4
    assert float(jnp.abs(mixed["translations_eps"]
                         - on_rows["translations_eps"]).max()) > 1e-4


def test_sc_per_residue_training(batch):
    """TrainConfig.sc_per_residue: the loss runs finite end to end, differs
    from the per-sample draw under the same key, and gradients stay finite."""
    from diffab_pytorch_tpu.config import TrainConfig

    common = dict(batch_size=B, lr=1e-3, seed=0)
    h_row = DiffAb(dc.replace(sc_config(), train=TrainConfig(
        sc_per_residue=True, **common)))
    h_samp = DiffAb(dc.replace(sc_config(), train=TrainConfig(**common)))
    state = h_samp.init(jax.random.key(1), batch)

    l_row, m = h_row.loss_fn(state.params, jax.random.key(5), batch, step=1)
    assert np.isfinite(float(l_row))
    diffs = []
    for k in range(6):
        a = h_row.loss_fn(state.params, jax.random.key(k), batch, step=1)[0]
        b_ = h_samp.loss_fn(state.params, jax.random.key(k), batch, step=1)[0]
        diffs.append(abs(float(a) - float(b_)))
    assert max(diffs) > 1e-7
    g = jax.grad(
        lambda p: h_row.loss_fn(p, jax.random.key(5), batch, step=1)[0]
    )(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    # ... and composes with the seq-loss down-weight (the (b, L) weight path)
    h_both = DiffAb(dc.replace(sc_config(), train=TrainConfig(
        sc_per_residue=True, sc_seq_loss_weight=0.1, **common)))
    l2, _ = h_both.loss_fn(state.params, jax.random.key(5), batch, step=1)
    assert np.isfinite(float(l2))


def test_cli_train_sc_schedule_flags():
    """The production train CLI wires the sc-schedule knobs (and adam_eps)
    into TrainConfig — parity with scripts/quality_run.py's surface."""
    from diffab_pytorch_tpu.cli import train as train_cli

    args = train_cli.parse_args([
        "--data-dir", "/nonexistent", "--self-conditioning",
        "--sc-geometry-only", "--sc-rate", "0.4", "--sc-onset", "123",
        "--sc-rate-warmup", "456", "--sc-seq-loss-weight", "0.2",
        "--sc-per-residue", "--adam-eps", "1e-5",
    ])
    cfg = train_cli.build_config(args)
    assert cfg.train.sc_per_residue
    assert cfg.model.self_conditioning
    assert not cfg.model.self_conditioning_sequence
    assert cfg.train.sc_rate == 0.4
    assert cfg.train.sc_onset_steps == 123
    assert cfg.train.sc_rate_warmup == 456
    assert cfg.train.sc_seq_loss_weight == 0.2
    assert cfg.train.adam_eps == 1e-5


def test_sc_late_fusion_isolates_sequence_head(batch):
    """sc_late_fusion (round 4): the conditioned features join after the
    trunk, geometry heads only — so seq_posterior is BIT-identical with
    and without an estimate (the sequence pathway is structurally cold),
    while the geometry heads respond.  Param shapes: the geometry heads
    widen, fuse_0 carries no sc columns, sequence head unchanged."""
    cfg = dc.replace(sc_config(), model=dc.replace(
        sc_config().model, sc_late_fusion=True))
    h = DiffAb(cfg)
    state = h.init(jax.random.key(2), batch)
    d = cfg.model.d_residue_emb
    K = cfg.model.aa_vocab_size
    p = state.params["params"]["denoiser"]
    sc_w = 3 + K + 1
    assert p["fuse_0"]["kernel"].shape[0] == 2 * d  # no sc columns
    assert p["coordinate_head"]["dense_0"]["kernel"].shape[0] == d + 3 + sc_w
    assert p["orientation_head"]["dense_0"]["kernel"].shape[0] == d + 3 + sc_w
    assert p["sequence_head"]["dense_0"]["kernel"].shape[0] == d + 3

    beta = jnp.full((B,), 0.2)
    fwd = jax.jit(lambda prm, kw: h.model.apply(
        prm, batch, batch.seq_idx, batch.translations, batch.orientations,
        beta, **kw), static_argnums=())
    cold = h.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    warm = h.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
        sc_translations_x0=batch.translations + 0.5,
        sc_seq_probs=jnp.full((B, L, K), 1.0 / K),
        sc_mask=jnp.ones((B,)),
    )
    np.testing.assert_array_equal(
        np.asarray(cold["seq_posterior"]), np.asarray(warm["seq_posterior"])
    )
    assert float(jnp.max(jnp.abs(
        warm["translations_eps"] - cold["translations_eps"]
    ))) > 1e-6
    # trains end to end: one jitted step, finite loss
    step = h.make_train_step(donate=False)
    s2, m = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(m["train/loss"]))


def test_sc_late_fusion_requires_sc(batch):
    cfg = dc.replace(tiny_config(), model=dc.replace(
        tiny_config().model, sc_late_fusion=True))
    h = DiffAb(cfg)
    with pytest.raises(ValueError, match="sc_late_fusion"):
        h.init(jax.random.key(0), batch)


def test_sc_split_trunk_isolates_sequence_pathway(batch):
    """sc_split_trunk (round 5): the geometry heads read a SECOND trunk
    (own fuse MLP + own IPA stack) that receives the estimate early-fused;
    the sequence head keeps the context-only trunk.  Forward isolation:
    seq_posterior bit-identical with/without an estimate.  GRADIENT
    isolation (the property late fusion lacks): the geometry losses'
    gradient w.r.t. the sequence trunk's parameters is zero."""
    cfg = dc.replace(sc_config(), model=dc.replace(
        sc_config().model, sc_split_trunk=True))
    h = DiffAb(cfg)
    state = h.init(jax.random.key(2), batch)
    d = cfg.model.d_residue_emb
    K = cfg.model.aa_vocab_size
    p = state.params["params"]["denoiser"]
    sc_w = 3 + K + 1
    # sequence trunk carries no sc columns; geo trunk carries them
    assert p["fuse_0"]["kernel"].shape[0] == 2 * d
    assert p["geo_fuse_0"]["kernel"].shape[0] == 2 * d + sc_w
    assert "geo_ipa" in p and "ipa" in p
    # heads read trunk width + beta encoding only (no post-trunk concat)
    assert p["coordinate_head"]["dense_0"]["kernel"].shape[0] == d + 3
    assert p["sequence_head"]["dense_0"]["kernel"].shape[0] == d + 3

    beta = jnp.full((B,), 0.2)
    cold = h.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    warm = h.model.apply(
        state.params, batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
        sc_translations_x0=batch.translations + 0.5,
        sc_seq_probs=jnp.full((B, L, K), 1.0 / K),
        sc_mask=jnp.ones((B,)),
    )
    np.testing.assert_array_equal(
        np.asarray(cold["seq_posterior"]), np.asarray(warm["seq_posterior"])
    )
    assert float(jnp.max(jnp.abs(
        warm["translations_eps"] - cold["translations_eps"]
    ))) > 1e-6

    # gradient isolation: d(geometry outputs)/d(sequence-trunk params) = 0
    def geo_loss(params):
        out = h.model.apply(
            params, batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
            sc_translations_x0=batch.translations + 0.5,
            sc_seq_probs=jnp.full((B, L, K), 1.0 / K),
            sc_mask=jnp.ones((B,)),
        )
        return (jnp.sum(out["translations_eps"] ** 2)
                + jnp.sum(out["orientations_t0"] ** 2))

    g = jax.grad(geo_loss)(state.params)["params"]["denoiser"]
    for name in ("fuse_0", "fuse_1", "ipa", "sequence_head"):
        leaves = jax.tree.leaves(g[name])
        assert all(float(jnp.abs(x).max()) == 0.0 for x in leaves), name
    # ... while the geo trunk trains
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree.leaves(g["geo_ipa"]))
    # end to end: one jitted train step, finite loss
    step = h.make_train_step(donate=False)
    s2, m = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(m["train/loss"]))


def test_sc_split_trunk_excludes_late_fusion(batch):
    cfg = dc.replace(sc_config(), model=dc.replace(
        sc_config().model, sc_split_trunk=True, sc_late_fusion=True))
    h = DiffAb(cfg)
    with pytest.raises(ValueError, match="mutually exclusive"):
        h.init(jax.random.key(0), batch)
