"""Benchmark: CDR-H3 codesign sampling throughput (K=128, T=100).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N, ...}

The headline metric is end-to-end design throughput with the DEFAULT model
(d=128, 6 IPA layers — reference train.py:62-80) in the FLAGSHIP
configuration (BASELINE config #5): 128 designs of one target via the
shared-context fan-out — context encoded once, pair tensors read once per
target, then the full T=100 reverse scan with all three reverse kernels,
on one chip, bf16 matmul compute.  vs_baseline compares against the
PyTorch reference driven the same way (encode + 100 denoiser forwards per
sample) on this host's CPU, measured by bench_baseline_torch.py and cached
in baseline_torch.json (the reference publishes no numbers of its own,
BASELINE.md).

Budget discipline (round-4 restructure — BENCH_r03 was rc=124/null
because seven separately-jitted programs through the 1-3-min-per-compile
remote tunnel overran the driver's timeout):

  * Progressive emission (round-5 restructure): a complete
    contract-conforming JSON line is printed after EVERY stage —
    sampling headline first, the two fast recipes second, the bsz16
    train step + rooflines third, production train and the legacy
    25-step chain last — so a timeout or a degraded-tunnel compile
    (measured: 6+ min for one train-step compile) loses only the least
    important remaining fields, never the record (the driver reads the
    tail line).
  * Train steps are timed as repeated calls of the once-compiled step on
    the SAME TrainState instead of chaining states: chained states walk
    an XLA layout fix-point that costs 3-4 extra remote recompiles per
    train config (DESIGN.md §3 host-side rules) for an identical
    steady-state step program.  Cross-checked on v5e: non-chained timing
    matches the chained fix-point rate within noise.
  * The round-1 legacy batch-32 no-fan-out program is dropped (its
    number stopped informing decisions in round 2; the fan-out and
    chord programs carry the story).
  * Every secondary program (10-step chord, production train, 25-step)
    is gated on remaining wall budget (BENCH_BUDGET_S, default 540 s):
    skipped secondaries report null rather than risking the record.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import jax

# peak dense bf16 FLOP/s per chip by device kind (substring match)
_PEAK_BF16 = [
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v4", 275e12),
]

# peak HBM bandwidth per chip (bytes/s)
_PEAK_HBM = [
    ("v6", 1640e9),
    ("v5p", 2765e9),
    ("v5 lite", 819e9),
    ("v5e", 819e9),
    ("v4", 1228e9),
]


def _peak(device, table, default):
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in table:
        if sub in kind:
            return peak
    return default


def peak_flops(device) -> float:
    return _peak(device, _PEAK_BF16, 197e12)  # default to v5e


def peak_hbm_bw(device) -> float:
    return _peak(device, _PEAK_HBM, 819e9)


def denoiser_call_flops(cfg, b: int, L: int) -> float:
    """Dominant matmul FLOPs (2*m*n*k each) of ONE denoiser forward.

    Per IPA layer (models/ipa.py): QKV/point projections + output dense,
    fused attention logits (scalar + point via the augmented contraction),
    and the three attention-weighted reductions (values, points, pair
    rows)."""
    m = cfg.model
    h, ds = m.n_head, m.d_scalar_per_head
    pq, pv = m.n_query_point_per_head, m.n_value_point_per_head
    d, dp = m.d_residue_emb, m.d_pair_emb
    bl = b * L
    bhll = b * h * L * L
    proj = 2 * bl * d * (3 * h * ds + 3 * h * pq * 3)  # scalar+point QKV
    out_dense = 2 * bl * (h * ds + h * dp + h * pv * 3 + h * pv) * d
    logits = 2 * bhll * (ds + 3 * pq + 2)  # augmented q.k contraction
    reductions = 2 * bhll * (ds + 3 * pv) + 2 * b * L * L * h * dp
    per_layer = proj + out_dense + logits + reductions
    return float(m.n_ipa_layers * per_layer + 2 * bl * (2 * d) * d)  # + fuse


def encode_model_flops(cfg, b: int, L: int) -> float:
    """Dominant FLOPs of one context encoding (Residue/Pair embeddings).

    Small next to T=100 denoiser calls in sampling, but the train step pays
    it EVERY step: the (b, L, L, A^2) distance-kernel MLP and the L^2 pair
    MLP are the train-side heavyweights (models/embedding.py)."""
    m = cfg.model
    d, dp, A, V = m.d_residue_emb, m.d_pair_emb, m.n_atoms, m.aa_vocab_size
    Ad = m.dist_atoms or A  # atoms in the pair distance feature
    bl, bll = b * L, b * L * L
    cat_res = d + V * A * 3 + 3 * (m.n_residue_dihedral_funcs * 4 + 1) + d
    res = 2 * bl * (cat_res * 2 * d + 2 * d * d + 2 * d * d)
    cat_pair = 3 * dp + 2 * (m.n_pair_dihedral_funcs * 4 + 1)
    pair = (
        2 * bll * (Ad * Ad * dp + dp * dp)  # distance-kernel MLP
        + 2 * bll * (cat_pair * dp + 2 * dp * dp)  # pair MLP
    )
    if m.onehot_pair_tables:
        # one-hot table contractions (round 4): relpos one-hot matmul +
        # the factorized vocab-contraction pair of the aa-pair/dist-coef
        # tables (models/embedding.py pair_table_lookup)
        mdist_w = 2 * m.max_dist_to_consider + 1
        pair += 2 * bll * (mdist_w * dp + V * (dp + Ad * Ad))
    dist_cross = 2 * b * (L * Ad) * (L * Ad) * 3  # |x-y|^2 expansion matmul
    return float(res + pair + dist_cross)


def sampler_model_flops(cfg, b: int, L: int, T: int) -> float:
    """Analytic model FLOPs for one full codesign batch (encode once +
    T denoiser calls).  The one-time context encoding is folded in as one
    pair-MLP term (small next to T=100 calls)."""
    m = cfg.model
    dp = m.d_pair_emb
    pair_mlp = 2 * b * L * L * (dp * 4) * dp  # one-time context encoding
    return float(T * denoiser_call_flops(cfg, b, L) + pair_mlp)


def train_model_flops(cfg, b: int, L: int) -> float:
    """Analytic FLOPs of ONE train step: forward (encode + denoiser, twice
    with self-conditioning) + backward at the standard 2x-forward count.
    Dominant matmul terms only, +-10%."""
    n_fwd = 2 if cfg.model.self_conditioning else 1
    fwd = encode_model_flops(cfg, b, L) + n_fwd * denoiser_call_flops(cfg, b, L)
    return float(3.0 * fwd)  # fwd + bwd (~2x fwd)


def train_hbm_bytes(cfg, b: int, L: int) -> float:
    """Analytic HBM traffic of ONE train step, in bytes (+-30%, lumped).

    The train step's distinctive streams, absent from sampling, are the
    context-encoding L^2 feature tensors paid EVERY step: the
    (b, L, L, A^2) distance-kernel tensors (squared distances, per-pair
    coefs, exp kernel) and the (b, L, L, ~3 dp) pair concat/MLP
    activations.  Forward streams are counted explicitly; backward is the
    standard ~2x forward re-read/accumulate.  Parameter/optimizer traffic
    (~5 reads+writes of 2.5 M params) is included but minor."""
    m = cfg.model
    h, ds = m.n_head, m.d_scalar_per_head
    pq, pv = m.n_query_point_per_head, m.n_value_point_per_head
    d, dp, A = m.d_residue_emb, m.d_pair_emb, m.n_atoms
    Ad = m.dist_atoms or A  # atoms in the pair distance feature
    bl, bll, ll = b * L, b * L * L, L * L

    # context encoding (bf16 = 2 bytes): 3 Ad^2-wide tensors (d2, coef,
    # kernel) each written+read, dist-MLP/pair-MLP activations, coord
    # scatter feature (V*A*3 wide, bf16)
    enc = (
        3 * 2 * bll * Ad * Ad * 2
        + (2 * dp + 3 * dp + dp) * bll * 2
        + bl * (m.aa_vocab_size * A * 3) * 2 * 2
    )
    if m.onehot_pair_tables:
        # the materialized relpos one-hot (write + read; its gradient-side
        # re-read rides the 3x forward multiplier below).  The factorized
        # aa-pair tables materialize only (b, L, vocab)-rank temporaries —
        # noise at this scale.
        enc += 2 * bll * (2 * m.max_dist_to_consider + 1) * 2
    # per IPA layer (as the sampler count, without fan-out sharing)
    pair_read = bll * dp * 2  # attended-pair-rows reduction read
    bias = bll * h * 4
    attn_rt = 2 * b * h * ll * 2
    act = bl * (
        7 * d + 2 * 3 * h * ds + 4 * 3 * h * pq * 3
        + h * (ds + 3 * pv + pv) + 2 * d
    ) * 2
    layers = m.n_ipa_layers * (pair_read + bias + attn_rt + act)
    # bias-PROJECTION pair reads: one matmul over the pair tensor per
    # layer, or ONE total with the fused cross-layer projection
    # (ModelConfig.fuse_pair_bias, models/ipa.py)
    n_bias_reads = (1 if (m.fuse_pair_bias and not m.remat_ipa)
                    else m.n_ipa_layers)
    bias_proj = n_bias_reads * bll * dp * 2

    n_fwd = 2 if cfg.model.self_conditioning else 1
    fwd = enc + n_fwd * (layers + bias_proj)
    # params + Adam moments: read params+mu+nu, write params+mu+nu (~2.5M
    # leaves x 4 bytes x 6)
    n_params = (
        # projections + out dense per layer + embeddings, coarse
        m.n_ipa_layers * (d * (3 * h * ds + 3 * h * pq * 3)
                          + (h * ds + h * dp + h * pv * 3 + h * pv) * d)
        + (21 * 21) * (Ad * Ad + dp) + 2 * d * d * 4 + dp * dp * 4
    )
    opt = 6 * n_params * 4
    return float(3.0 * fwd + opt)


def sampler_hbm_bytes(cfg, b: int, L: int, T: int, n_designs: int = 1) -> float:
    """Analytic HBM traffic for one full codesign batch, in bytes.

    Sampling is BANDWIDTH-bound on TPU (DESIGN.md §3), so MFU alone is the
    wrong roofline; this count makes the binding resource visible
    (round-1 VERDICT weak #1).  Exact for the dominant L^2 streams of the
    default (fused-layer Pallas) reverse scan; per-residue activation
    traffic is a lumped estimate for the round-3 fused layer, which keeps
    projections/frames/attention outputs in VMEM — only x, the
    accumulator, the frames, and per-grid-cell weight re-fetches cross
    HBM (models/ipa.py, ops/ipa_pallas.py fused_ipa_layer).

    Per IPA layer per reverse step, with b = bp * n_designs state rows over
    bp pair copies (the design fan-out shares pair/bias reads per target):
      pair read       bp*L^2*dp     bf16  (attended_pair_rows, one read)
      bias read       bp*h*L^2      f32   (precomputed logits, f32 on
                                           purpose — bf16 measured slower)
      attn roundtrip  2*b*h*L^2     bf16  (kernel writes, XLA reduction reads)
      activations     O(b*L*d)            (projections, frames, out dense)
    The one-time context encoding (pair MLP + bias precompute, ~1/T of the
    scan traffic) is added once.
    """
    m = cfg.model
    h, ds = m.n_head, m.d_scalar_per_head
    pq, pv = m.n_query_point_per_head, m.n_value_point_per_head
    d, dp = m.d_residue_emb, m.d_pair_emb
    bp = max(b // max(n_designs, 1), 1)
    ll = L * L

    pair_read = bp * ll * dp * 2
    bias_read = bp * h * ll * 4
    attn_rt = 2 * b * h * ll * 2
    # the output projection is applied as sliced partial matmuls in each
    # operand's native layout (round 2b, models/ipa.py): the pair
    # contribution crosses HBM as a d-wide tensor (target-major write +
    # design-major transpose round-trip), not as the h*dp-wide out_pair
    out_pair_write = 3 * b * L * d * 2
    # Per-residue streams.  With the round-3 fused layer (the TPU
    # default), projections / frame transforms / attention outputs /
    # output-projection operands all live in VMEM: what crosses HBM is
    # one x read, the accumulator write+read, the frames, and the weight
    # blocks re-fetched per grid cell (db=4 designs per cell).
    w_cols = 3 * h * ds + 2 * h * pq * 3 + h * pv * 3
    out_rows = h * ds + h * pv * 3 + h * pv
    w_bytes = (d * w_cols + out_rows * d) * 2
    cells = max(b // 4, 1)
    act = b * L * (3 * d + 12) * 2 + cells * w_bytes
    per_layer = pair_read + bias_read + attn_rt + out_pair_write + act

    # per denoiser call outside the layers: embedding fuse, heads, diffusion
    # reverse kernels (seq posterior, coord/orientation updates)
    per_call = b * L * (6 * d + 4 * m.aa_vocab_size + 12 * 9) * 4
    per_step = m.n_ipa_layers * per_layer + per_call

    # one-time context encoding: distance/dihedral features -> pair MLP
    # (write pair twice through the MLP), bias logits precompute (read pair,
    # write n_layers f32 logit maps)
    encode = bp * ll * (3 * dp * 2 + dp * 2) + m.n_ipa_layers * bp * h * ll * 4
    return float(T * per_step + encode)


def get_baseline() -> float:
    path = os.path.join(os.path.dirname(__file__) or ".", "baseline_torch.json")
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".",
                                          "bench_baseline_torch.py")],
            check=True, capture_output=True,
        )
    with open(path) as f:
        return float(json.load(f)["samples_per_sec"])


def main():
    from diffab_pytorch_tpu.config import default_config
    from diffab_pytorch_tpu.data.batch import synthetic_batch
    from diffab_pytorch_tpu.train import DiffAb

    t_begin = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "540"))

    def time_left() -> float:
        return budget_s - (time.time() - t_begin)

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    harness = DiffAb(cfg)

    # Headline config = the flagship use case (BASELINE config #5, SURVEY
    # §2.10): many designs of ONE target, via the shared-context fan-out
    # (sample n_designs=N — pair tensor and bias logits read once per
    # target).  N=128 is the measured throughput peak on v5e (scripts/
    # bench_fanout.py: 301 vs 184 samples/s for the tiled replicate_batch
    # path at the same width; with the round-3 fused layer 428 at N=128
    # and 395 at N=256 — scripts/bench_fused_layer.py).
    N_DESIGNS, L, T = 128, 128, cfg.diffusion.T
    one = synthetic_batch(jax.random.key(0), 1, L, cfg.model.n_atoms,
                          n_generate=8)
    state = harness.init(jax.random.key(1), one)

    sample_fn = jax.jit(
        lambda p, b, k: harness.sample(p, b, k, n_designs=N_DESIGNS)
    )

    # compile + warmup
    t0 = time.time()
    res = sample_fn(state.params, one, jax.random.key(2))
    jax.block_until_ready(res)
    compile_s = time.time() - t0

    # timed runs (keys precomputed: host-side key creation pays a
    # dispatch round-trip on tunneled backends)
    n_iters = 3
    keys = [jax.random.key(3 + i) for i in range(n_iters)]
    jax.block_until_ready(keys)
    t0 = time.time()
    for k in keys:
        res = sample_fn(state.params, one, k)
    jax.block_until_ready(res)
    dt = time.time() - t0
    samples_per_sec = N_DESIGNS * n_iters / dt

    # MFU: model FLOPs per sample batch / wall / peak bf16.  FLOPs are
    # counted analytically from the architecture (XLA's cost_analysis is
    # unavailable/untrustworthy on tunneled backends, and fused Pallas
    # kernels are opaque custom calls it cannot see inside anyway); the
    # dominant dense/attention terms of the T denoiser calls, ±10%.
    flops = sampler_model_flops(cfg, N_DESIGNS, L, T)
    mfu = (flops * n_iters / dt) / peak_flops(jax.devices()[0]) if flops else None

    # Bandwidth roofline: sampling is HBM-bound (DESIGN.md §3), so report
    # achieved bytes/s against the chip's HBM peak next to the FLOP-side
    # MFU — the attainment number that actually bounds this program.
    hbm_bytes = sampler_hbm_bytes(cfg, N_DESIGNS, L, T, n_designs=N_DESIGNS)
    hbm_bps = hbm_bytes * n_iters / dt
    bw_pct = hbm_bps / peak_hbm_bw(jax.devices()[0])

    baseline = get_baseline()
    out = {
        "metric": "CDR-H3 codesign designs/sec/chip "
                  "(128-design fan-out, K=128, T=100, default model)",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / baseline, 1),
        "baseline_torch_cpu_samples_per_sec": round(baseline, 4),
        "n_designs_fanout": N_DESIGNS,
        "compile_seconds": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "sample_tflops_per_sec": (
            round(flops * n_iters / dt / 1e12, 2) if flops else None
        ),
        "mfu_pct": round(100 * mfu, 2) if mfu is not None else None,
        "hbm_gb_per_batch": round(hbm_bytes / 1e9, 2),
        "hbm_gbps": round(hbm_bps / 1e9, 1),
        "pct_of_bandwidth_roofline": round(100 * bw_pct, 1),
        "binding_bound": (
            "bandwidth" if bw_pct > (mfu or 0.0) else "flops"
        ),
        # the later stages fill these in if wall budget allows; every
        # emit() below prints a complete contract-conforming record, so a
        # timeout loses the LEAST important remaining fields (round-5
        # restructure: a degraded tunnel spent 6+ min on the bsz16
        # train-step compile and starved the fast-recipe secondaries the
        # round-4 review asked to carry — sampling first, fast recipes
        # second, train numbers third)
        "train_steps_per_sec_bsz16": None,
        "train_tflops_per_sec": None,
        "train_mfu_pct": None,
        "train_hbm_gbps": None,
        "train_pct_of_bandwidth_roofline": None,
        "train_binding_bound": None,
        "samples_per_sec_10step_chord_fanout": None,
        "samples_per_sec_22eval_stochastic_fanout": None,
        "samples_per_sec_25step_fanout": None,
        "train_production_steps_per_sec": None,
        "train_production_samples_per_sec": None,
        "train_production_batch_size": None,
        "wall_seconds_at_headline": round(time.time() - t_begin, 1),
    }

    def emit():
        out["wall_seconds_last_emit"] = round(time.time() - t_begin, 1)
        print(json.dumps(out))
        sys.stdout.flush()

    # The record is safe from here: a timeout truncates later fields,
    # never the headline (the driver reads the tail line).
    emit()

    # --- secondaries, each gated on remaining wall budget (a remote
    # compile costs 1-3 min; only start one if it can plausibly finish)

    # Fast-recipe fan-out width: the short chains amortize per-step
    # overhead over more designs, so their throughput peaks at n=512,
    # not the headline's n=128 (width sweep
    # runs/profile_r4b/ab_fastrecipe_width.json: chord-10 4,335.5/s and
    # 22-eval 2,037.2/s at n=512 vs 3,957.7 / 1,988.0 at n=128).  The
    # record should carry the best sustained number the configuration
    # actually produces (round-4 VERDICT weak #1).
    N_FAST = 512
    out["fast_recipe_fanout_width"] = N_FAST

    # Secondary order = importance under budget pressure (round 5: a
    # slow-compile session skipped everything after the production
    # train): the two fast recipes first — they are the record the
    # round-4 review asked to carry at best width — then production
    # train, then the legacy 25-step chain.
    # 10-step chord-start chain (round 3) — generation from the forward-
    # noised anchor chord at t_start=0.6T skips most of the high-t
    # transport; measured on the trained checkpoint at full-length-recipe
    # quality (scatter 0.005-0.016 across three retrains —
    # runs/quality_combo12k_r3/coord_reverse_probe.json ns0_10_chord60)
    # at 1/10th the model evals of the T=100 headline chain.
    if time_left() > 240:
        chord_fn = jax.jit(
            lambda p, b, k: harness.sample(
                p, b, k, n_designs=N_FAST, n_steps=10, init="chord",
                t_start=6 * T // 10, noise_scale=0.0,
            )
        )
        jax.block_until_ready(chord_fn(state.params, one, jax.random.key(2)))
        t0 = time.time()
        for k in keys:
            resch = chord_fn(state.params, one, k)
        jax.block_until_ready(resch)
        out["samples_per_sec_10step_chord_fanout"] = round(
            N_FAST * n_iters / (time.time() - t0), 3
        )

    # 22-eval fine-tail chord chain — the round-4 fast STOCHASTIC recipe
    # (sampler n_fine_tail): scatter/precision/diversity at parity with
    # the 100-eval ns1+ntmax50 recipe on two retrains and the degenerate
    # corpus (runs/r4_ck{A,B}, runs/r4_div2 — DESIGN.md §3)
    if time_left() > 240:
        tail_fn = jax.jit(
            lambda p, b, k: harness.sample(
                p, b, k, n_designs=N_FAST, n_steps=22, n_fine_tail=12,
                noise_t_max=12, init="chord", t_start=6 * T // 10,
                noise_scale=1.0,
            )
        )
        jax.block_until_ready(tail_fn(state.params, one, jax.random.key(2)))
        t0 = time.time()
        for k in keys:
            rest = tail_fn(state.params, one, k)
        jax.block_until_ready(rest)
        out["samples_per_sec_22eval_stochastic_fanout"] = round(
            N_FAST * n_iters / (time.time() - t0), 3
        )
    emit()  # headline + both fast recipes now on record

    # train step throughput (batch 16, reference-default model).  ONE
    # compile: the step is timed as repeated calls on the same TrainState
    # rather than chained states — chaining walks an XLA layout fix-point
    # costing 3-4 extra remote recompiles (DESIGN.md §3) for an identical
    # steady-state program.  20 timed steps amortize per-call
    # remote-dispatch latency.  This stage ran BEFORE the fast recipes
    # until round 5; on a degraded tunnel its compile alone took 6+ min.
    if time_left() > 180:
        train_batch = synthetic_batch(jax.random.key(4), 16, L,
                                      cfg.model.n_atoms)
        step_fn = harness.make_train_step(donate=False)
        base_key = jax.random.key(5)
        s2, _ = step_fn(state, train_batch, base_key)  # compile + warmup
        jax.block_until_ready(s2)
        t0 = time.time()
        for _ in range(20):
            s2, m = step_fn(state, train_batch, base_key)  # key folds inside
        jax.block_until_ready(s2)
        train_steps_per_sec = 20 / (time.time() - t0)

        # train-side roofline (round-3 VERDICT weak #5): analytic
        # FLOP/byte counts — the (b,L,L,A^2) distance-kernel tensors paid
        # every step make training's binding bound different
        tr_flops = train_model_flops(cfg, 16, L)
        tr_bytes = train_hbm_bytes(cfg, 16, L)
        tr_mfu = tr_flops * train_steps_per_sec / peak_flops(jax.devices()[0])
        tr_bw = tr_bytes * train_steps_per_sec / peak_hbm_bw(jax.devices()[0])
        out["train_steps_per_sec_bsz16"] = round(train_steps_per_sec, 3)
        out["train_tflops_per_sec"] = round(
            tr_flops * train_steps_per_sec / 1e12, 2
        )
        out["train_mfu_pct"] = round(100 * tr_mfu, 2)
        out["train_hbm_gbps"] = round(
            tr_bytes * train_steps_per_sec / 1e9, 1
        )
        out["train_pct_of_bandwidth_roofline"] = round(100 * tr_bw, 1)
        out["train_binding_bound"] = "bandwidth" if tr_bw > tr_mfu else "flops"
        emit()

    # production-recipe train throughput: the quality-gated fast settings
    # (production_config: dist_atoms=4, d_pair 48, bf16 — DESIGN.md §3,
    # gate runs/quality_combo12k_prod) at the recipe batch, so the bench
    # records what a production training run actually achieves per chip.
    # Same one-compile non-chained timing as the bsz16 train number.
    if time_left() > 180:
        from diffab_pytorch_tpu.config import production_config

        pcfg = production_config()
        pharness = DiffAb(pcfg)
        PB = pcfg.train.batch_size
        pbatch = synthetic_batch(jax.random.key(6), PB, L, pcfg.model.n_atoms)
        pstate = pharness.init(jax.random.key(7), pbatch)
        pstep = pharness.make_train_step(donate=False)
        ps2, _ = pstep(pstate, pbatch, jax.random.key(8))
        jax.block_until_ready(ps2)
        t0 = time.time()
        for _ in range(20):
            ps2, _ = pstep(pstate, pbatch, jax.random.key(8))
        jax.block_until_ready(ps2)
        prod_steps_per_sec = 20 / (time.time() - t0)
        out["train_production_steps_per_sec"] = round(prod_steps_per_sec, 3)
        out["train_production_samples_per_sec"] = round(
            prod_steps_per_sec * PB, 1
        )
        out["train_production_batch_size"] = PB

    # 25-step respaced chain in the same fan-out config — the pre-chord
    # fast mode (QUALITY.md: same median RMSD as the full chain)
    if time_left() > 240:
        sample25_fn = jax.jit(
            lambda p, b, k: harness.sample(p, b, k, n_designs=N_DESIGNS,
                                           n_steps=25)
        )
        jax.block_until_ready(
            sample25_fn(state.params, one, jax.random.key(2))
        )
        t0 = time.time()
        for k in keys:
            res25 = sample25_fn(state.params, one, k)
        jax.block_until_ready(res25)
        out["samples_per_sec_25step_fanout"] = round(
            N_DESIGNS * n_iters / (time.time() - t0), 3
        )

    out["wall_seconds_total"] = round(time.time() - t_begin, 1)
    emit()


if __name__ == "__main__":
    main()
