"""Fused Pallas TPU kernel for the IPA attention core.

The hot loop of the denoiser (reference diffab_pytorch.py:389-465, executed
6 layers x T=100 steps per design) fused into one VMEM-resident kernel per
batch element:

    scalar logits + pair bias + point-distance logits -> masked softmax ->
    three attention-weighted reductions (scalar values, pair rows, points)

without materializing any of the five (b, h, L, L) f32 logit intermediates
the XLA path streams through HBM.  Two pieces deliberately stay OUTSIDE
the kernel: the pair-bias projection (one well-shaped MXU matmul, invariant
across scan steps — precomputed per design) and the attended-pair-rows
reduction (a (b, i)-batched matmul XLA lowers well; keeping pair out of
the kernel avoids a (L, d_pair, L) VMEM-resident block and a per-step
transposed relayout of the biggest tensor in the model).  The kernel emits
the attention weights for that reduction — one (b, h, L, L) bf16 tensor
instead of five f32 ones.  The point-distance term uses the
|q|^2+|k|^2-2qk expansion folded into the scalar-QK contraction via row
augmentation (one matmul computes logit_scalar + logit_point, and gamma is
pre-multiplied into the point projections), so outputs match the jnp path
(models/ipa.py) to accumulation order.

Gradients: `fused_ipa_attention` carries a custom VJP whose backward pass
differentiates the identical pure-jnp computation — the kernel accelerates
the forward (sampling is forward-only; training recomputes under autodiff).

Shapes (static): L must be a multiple of 128 (lane alignment); L = 128 is
the native patch size.  All heads are processed inside one kernel instance;
grid = (batch,).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

# Designs folded into ONE grid cell under fan-out (None = auto).  At wide
# fan-out the (targets, designs) grid runs one tiny working set (~0.8 MB)
# per cell; folding db designs per cell amortizes the per-iteration
# pipeline overhead db-fold at the cost of db x the VMEM footprint
# (~3.4 MB of blocks per design-quad + f32 logits).  Auto picks the
# largest of (4, 2, 1) dividing n_designs — measured fastest with safe
# VMEM headroom on v5e (DESIGN.md §3).  Tests override this module global
# to pin per-db numerics.
DESIGNS_PER_BLOCK: int | None = None

# Round-5 fused-layer variant: the per-cell projection and output-
# projection dots run across all db designs at once (2D Mosaic-legal
# matmuls with the designs merged into the row/lane dim) instead of the
# static per-design unroll — see _layer_kernel_batched.  ON by default:
# measured on v5e, two timed windows each, replicated
# (runs/r5_roofline/ab_batched_kernel.json): T=100 n=128 fan-out
# 474.8 -> 530.9 designs/s (+11.8%), chord-10 n=512 4,190 -> 4,636
# (+10.6%), 22-eval n=512 1,994 -> 2,226 (+11.7%); outputs bit-identical
# to the unrolled kernel.  Module global so A/B benches and tests can
# pin either path.  db=8 measured +2% more at n=512 but the r2b OOM
# caveat stands (db=16 is a VMEM OOM: 21.8M > 16M scoped); auto stays 4.
BATCHED_LAYER_KERNEL: bool = True


def _pick_designs_per_block(n_designs: int) -> int:
    if DESIGNS_PER_BLOCK is not None:
        if n_designs % DESIGNS_PER_BLOCK:
            raise ValueError(
                f"DESIGNS_PER_BLOCK={DESIGNS_PER_BLOCK} does not divide "
                f"n_designs={n_designs}"
            )
        return DESIGNS_PER_BLOCK
    for db in (4, 2):
        if n_designs % db == 0:
            return db
    return 1


def _attention_core_jnp(
    q_s, k_s, v_s,  # (b, L, h, ds)
    q_p, k_p, v_p,  # (b, L, h, P, 3) global frame
    pair,  # (b, L, L, dp)
    bias,  # (b, h, L, L) pair-bias logits (precomputed)
    gamma,  # (h,) softplus already applied
    mask,  # (b, L) float (1 valid / 0 pad)
    scale_scalar: float,
    scale_point: float,
    scale_total: float,
):
    """Reference jnp computation (identical math; used for the VJP and for
    correctness diffing of the kernel).  pair/bias may carry a smaller batch
    bp = b // n_designs (design fan-out — models/ipa.py); they broadcast
    across the n designs of each target."""
    b, L, h, ds = q_s.shape
    pq = q_p.shape[3]
    if pair.shape[0] != b:
        n = b // pair.shape[0]
        pair = jnp.repeat(pair, n, axis=0)
        bias = jnp.repeat(bias, n, axis=0)

    logit = jnp.einsum("bihd,bjhd->bhij", q_s, k_s) * scale_scalar
    qf = q_p.reshape(b, L, h, pq * 3)
    kf = k_p.reshape(b, L, h, pq * 3)
    cross = jnp.einsum("bihc,bjhc->bhij", qf, kf)
    q_sq = jnp.sum(qf * qf, axis=-1).transpose(0, 2, 1)
    k_sq = jnp.sum(kf * kf, axis=-1).transpose(0, 2, 1)
    sq_dist = q_sq[:, :, :, None] + k_sq[:, :, None, :] - 2.0 * cross
    logit = logit - 0.5 * scale_point * gamma[None, :, None, None] * sq_dist
    logit = (logit + bias) * scale_total
    logit = jnp.where(mask[:, None, None, :] > 0, logit, _NEG_INF)
    attn = jax.nn.softmax(logit, axis=-1)

    out_s = jnp.einsum("bhij,bjhd->bihd", attn, v_s)
    out_pair = jnp.einsum("bhij,bijd->bihd", attn, pair)
    out_p = jnp.einsum("bhij,bjhpc->bihpc", attn, v_p)
    return out_s, out_pair, out_p


def _kernel(
    q_ref, k_ref,  # (db, h, F, L) augmented projections — see _pallas_forward
    v_s_ref,  # (db, h, ds, L)
    v_p_ref,  # (db, h, P*3, L)
    bias_ref,  # (h, L, L) — precomputed pair-bias logits
    out_s_ref,  # (db, h, ds, L)
    out_p_ref,  # (db, h, P*3, L)
    attn_ref,  # (db, h, L, L) — attention weights (pair reduction runs in XLA)
    *,
    scale_total: float,
):
    """Head-BATCHED formulation: every contraction is one dot_general with
    the head axis as a batch dimension (no per-head Python loop — Mosaic
    unrolls loops into h separate small ops, while batched dots pipeline on
    the MXU).  The scalar-QK, point-distance, and gamma terms are all folded
    into ONE augmented matmul by the caller (q_aug . k_aug = logit_scalar +
    logit_point), so the kernel body is free of the rank-changing reshapes
    and tiny-vector broadcasts Mosaic cannot lower (e.g. (h,) -> (h,1,1)).
    Matmuls run in the INPUT dtype (bf16 on TPU) with f32 accumulation;
    softmax stays f32.  The (features, L) layout keeps L as the lane
    dimension (Mosaic requires 128-aligned lane slices; per-head feature
    widths like 192 cannot satisfy that).

    The leading db axis is the designs-per-cell fold (DESIGNS_PER_BLOCK):
    db designs of ONE target run in one grid cell as a (db*h)-batched dot
    — the leading-axes reshape is layout-free, and the shared bias block
    broadcasts from the same VMEM copy."""
    f32 = jnp.float32
    dt_in = q_ref.dtype
    db, h, _, L = q_ref.shape
    fold = lambda x: x.reshape(db * h, *x.shape[2:])

    # logit[g, i, j] = sum_f q_aug[g, f, i] k_aug[g, f, j], g = (d, h)
    logit = jax.lax.dot_general(
        fold(q_ref[:]), fold(k_ref[:]),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (db*h, L, L)
    # key masking is already inside the augmented contraction (a dedicated
    # row pair adds -1e9/scale_total on padded keys), so the kernel touches
    # no sub-tile mask block and no boolean vectors
    bias = bias_ref[:].astype(f32)  # (h, L, L)
    logit = (
        logit.reshape(db, h, L, L) + bias[None]
    ).reshape(db * h, L, L) * scale_total

    m = jnp.max(logit, axis=-1, keepdims=True)
    e = jnp.exp(logit - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)  # (g, i, j) f32
    attn_in = attn.astype(dt_in)

    # out[g, d, i] = sum_j v[g, d, j] attn[g, i, j]
    v_dot = lambda v_t: jax.lax.dot_general(
        v_t, attn_in, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    out_s_ref[:] = v_dot(fold(v_s_ref[:])).astype(out_s_ref.dtype).reshape(
        out_s_ref.shape
    )
    out_p_ref[:] = v_dot(fold(v_p_ref[:])).astype(out_p_ref.dtype).reshape(
        out_p_ref.shape
    )
    attn_ref[:] = attn_in.reshape(attn_ref.shape)


def _attention_core_raw_jnp(
    q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
    scale_scalar, scale_point, scale_total,
):
    """jnp mirror of the RAW kernel outputs (no pair reduction):
    out_s in kernel layout (b, h, ds, L), the attention weights, and the
    point output in (b, L, h, P, 3).  Used as the VJP recompute target of
    `fused_ipa_attention_raw`."""
    b, L, h, ds = q_s.shape
    pq = q_p.shape[3]
    bb = bias if bias.shape[0] == b else jnp.repeat(bias, b // bias.shape[0], axis=0)

    logit = jnp.einsum("bihd,bjhd->bhij", q_s, k_s) * scale_scalar
    qf = q_p.reshape(b, L, h, pq * 3)
    kf = k_p.reshape(b, L, h, pq * 3)
    cross = jnp.einsum("bihc,bjhc->bhij", qf, kf)
    q_sq = jnp.sum(qf * qf, axis=-1).transpose(0, 2, 1)
    k_sq = jnp.sum(kf * kf, axis=-1).transpose(0, 2, 1)
    sq_dist = q_sq[:, :, :, None] + k_sq[:, :, None, :] - 2.0 * cross
    logit = logit - 0.5 * scale_point * gamma[None, :, None, None] * sq_dist
    logit = (logit + bb) * scale_total
    logit = jnp.where(mask[:, None, None, :] > 0, logit, _NEG_INF)
    attn = jax.nn.softmax(logit, axis=-1)

    out_s_t = jnp.einsum("bhij,bjhd->bhdi", attn, v_s)
    out_p = jnp.einsum("bhij,bjhpc->bihpc", attn, v_p)
    return out_s_t, attn, out_p


def _pallas_raw(
    q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
    scale_scalar, scale_point, scale_total,
):
    """Assemble the augmented operands and run the kernel.  Returns the
    kernel-native layouts: out_s (b, h, ds, L), out_p (b, h, pv*3, L),
    attn (b, h, L, L)."""
    b, L, h, ds = q_s.shape
    pq = q_p.shape[3]
    pv = v_p.shape[3]
    if pq != pv:
        raise ValueError("pallas kernel assumes n_query_points == n_value_points")
    bp = bias.shape[0]
    if b % bp:
        raise ValueError(f"state batch {b} is not a multiple of pair batch {bp}")
    n_designs = b // bp
    dt = q_s.dtype

    # head-batched (h, features, L) layout so L is always the lane dimension
    head_t = lambda x: jnp.transpose(x.reshape(b, L, h, -1), (0, 2, 3, 1))

    # Fold the point-distance logits into the scalar-QK matmul (one MXU
    # contraction computes both, and gamma never enters the kernel):
    #   logit = ss * q_s.k_s - 0.5*sp*gamma * (|q_p|^2 + |k_p|^2 - 2 q_p.k_p)
    # With q' = a*q_p, k' = a*k_p, a = sqrt(0.5*sp*gamma):
    #   q_aug = [ss*q_s | 2q' | -|q'|^2 | -1],  k_aug = [k_s | k' | 1 | |k'|^2]
    g = jnp.sqrt(0.5 * scale_point * gamma.astype(jnp.float32))  # (h,)
    qp_t = head_t(q_p) * g[None, :, None, None].astype(dt)  # (b, h, p3, L)
    kp_t = head_t(k_p) * g[None, :, None, None].astype(dt)
    q_sq = jnp.sum(qp_t.astype(jnp.float32) ** 2, axis=2, keepdims=True)
    k_sq = jnp.sum(kp_t.astype(jnp.float32) ** 2, axis=2, keepdims=True)
    ones = jnp.ones_like(q_sq)  # (b, h, 1, L)
    # key-mask row pair: q contributes 1, k contributes -1e9/st on padded
    # keys — the mask rides the same contraction (Mosaic cannot lift the
    # sub-tile (1, 1, L) mask block a separate input would need)
    neg_k = jnp.broadcast_to(
        ((mask.astype(jnp.float32) - 1.0) * (-_NEG_INF / float(scale_total)))[
            :, None, None, :
        ],
        ones.shape,
    )
    q_aug = jnp.concatenate(
        [head_t(q_s) * jnp.asarray(scale_scalar, dt), 2.0 * qp_t,
         (-q_sq).astype(dt), (-ones).astype(dt), ones.astype(dt)], axis=2,
    )  # (b, h, F, L)
    k_aug = jnp.concatenate(
        [head_t(k_s), kp_t, ones.astype(dt), k_sq.astype(dt),
         neg_k.astype(dt)], axis=2,
    )
    # pad the augmented feature dim to the sublane tile (16 for bf16);
    # zero rows are inert in the contraction
    F = -(-q_aug.shape[2] // 16) * 16
    padding = [(0, 0), (0, 0), (0, F - q_aug.shape[2]), (0, 0)]
    q_aug = jnp.pad(q_aug, padding)
    k_aug = jnp.pad(k_aug, padding)

    # Grid (targets, design blocks) with the design axis minor: per-design
    # blocks cover rows [.. i*n + j*db ..), while the bias block's index map
    # is constant across the inner design iterations — Pallas detects the
    # unchanged block index and SKIPS the HBM->VMEM copy, so each target's
    # bias logits are fetched once and revisited from VMEM by all n designs
    # (the design-grid re-read VERDICT round 1 asked for).  db > 1
    # additionally folds db designs into ONE cell (fewer, fatter pipeline
    # iterations — see DESIGNS_PER_BLOCK).  n_designs = 1 degenerates to
    # the original (b,) grid behavior.
    db = _pick_designs_per_block(n_designs)
    n_blocks = n_designs // db

    def head_spec(height):
        return pl.BlockSpec(
            (db, h, height, L),
            lambda i, j: (i * n_blocks + j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    bias_spec = pl.BlockSpec(
        (1, h, L, L), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pl.GridSpec(
        grid=(bp, n_blocks),
        in_specs=[
            head_spec(F), head_spec(F),
            head_spec(ds), head_spec(pv * 3),
            bias_spec,
        ],
        out_specs=[
            head_spec(ds), head_spec(pv * 3), head_spec(L),
        ],
    )

    kernel = functools.partial(_kernel, scale_total=float(scale_total))

    # the bias block carries a leading 1 (target); squeeze it inside
    def kernel_wrap(q, k, vs, vp, bi, os, opt, at):
        kernel(q, k, vs, vp, bi.at[0], os, opt, at)

    out_shapes = [
        jax.ShapeDtypeStruct((b, h, ds, L), dt),
        jax.ShapeDtypeStruct((b, h, pv * 3, L), dt),
        jax.ShapeDtypeStruct((b, h, L, L), dt),
    ]
    flops_per_b = 2 * h * L * L * (F + ds + pq * 3)
    out_s, out_p, attn = pl.pallas_call(
        kernel_wrap,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_b,
            bytes_accessed=b * h * L * L * 2 * bias.dtype.itemsize,
            transcendentals=b * h * L * L,
        ),
        # interpret on CPU so the kernel is testable on the faked mesh
        interpret=jax.default_backend() == "cpu",
    )(q_aug, k_aug, head_t(v_s), head_t(v_p), bias)
    return out_s, out_p, attn


def _pallas_forward(
    q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
    scale_scalar, scale_point, scale_total,
):
    b, L, h, ds = q_s.shape
    pv = v_p.shape[3]
    n_designs = b // bias.shape[0]
    dt = q_s.dtype
    out_s, out_p, attn = _pallas_raw(
        q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
        scale_scalar, scale_point, scale_total,
    )

    # attended pair rows OUTSIDE the kernel: XLA lowers this (b, i)-batched
    # (h, j) x (j, dp) contraction straight onto the MXU reading pair once,
    # and keeping pair out of the kernel spares the (L, dp, L) VMEM block
    # and its per-step transposed relayout.  Under design fan-out the n
    # designs of a target batch into the matmul's M dimension so pair is
    # read once per TARGET (models/ipa.py attended_pair_rows).
    from diffab_pytorch_tpu.models.ipa import attended_pair_rows

    out_pair = attended_pair_rows(
        attn, pair.astype(dt), n_designs
    ).reshape(b, L, h, -1)

    unhead = lambda x: jnp.transpose(x, (0, 3, 1, 2))  # (b, L, h, f)
    return (
        unhead(out_s),
        out_pair,
        unhead(out_p).reshape(b, L, h, pv, 3),
    )


# ---------------------------------------------------------------------------
# Round-3: FULLY fused IPA layer kernel.
#
# The attention-only kernel above still pays the per-design activation
# streams through HBM every layer-step: six projection matmuls materialize
# (b, L, h, f) tensors, frames_apply rewrites the point clouds, head_t
# relayouts everything into the kernel's (b, h, f, L) layout, and the
# augmented operands cross HBM again as kernel inputs — ~180 MB of the
# 262 MB/layer/step the 128-design fan-out moves (bench.py
# sampler_hbm_bytes).  This kernel moves ALL of it into VMEM: per grid
# cell it reads the residue embedding x (and the tiny per-step frame
# tensors), projects with the fused weight blocks, applies the rigid
# frames, assembles the augmented operands, runs the attention core, and
# applies the scalar/point/norm slices of the output projection — writing
# back only the attention weights (consumed by the XLA-side pair
# reduction, the measured-best split) and the (b, L, d) accumulator.
#
# Layout rules that make it lower cleanly on Mosaic:
#   * every point tensor lives as (h, 3, P, L) — coordinates on a
#     non-tiled axis, (P, L) = (8, 128) exact f32 tiles, so frame
#     transforms are sublane-aligned vector ops;
#   * the fused projection weights are column-REORDERED outside the kernel
#     (params-only, hoisted out of the sampler scan) to emit that layout
#     directly, with scale_scalar / sqrt(0.5*scale_point*gamma) folded in;
#   * rotations arrive as (b, 9, L) rows R[i, j] at 3*i+j, translations as
#     (b, 3, L) (+ a per-head g-scaled copy for the q/k side, since gamma
#     cannot broadcast from an (h,) vector inside the kernel).
# ---------------------------------------------------------------------------


def _layer_kernel(
    x_ref,     # (db, L, d)
    rot_ref,   # (db, 9, L)   rows 3*i+j = R[i, j]
    trg_ref,   # (db, h, 3, L)  g-scaled translations (q/k side)
    trv_ref,   # (db, 3, L)     plain translations (v side)
    nk_ref,    # (db, 1, L)     -NEG_INF/scale_total on padded keys
    wq_ref,    # (d, h*(ds+3*pq))  [scalar*ss | points*(g)] per head
    wk_ref,    # (d, h*(ds+3*pq))
    wv_ref,    # (d, h*(ds+3*pv))
    bias_ref,  # (1, h, L, L) f32 pair-bias logits
    wos_ref,   # (h*ds, d)
    wop_ref,   # (h*3*pv, d)  rows ordered (h, coord, pv)
    won_ref,   # (h*pv, d)
    acc_ref,   # (db, L, d)
    attn_ref,  # (db, h, L, L)
    *,
    scale_total: float,
    h: int,
    ds: int,
    pq: int,
    pv: int,
):
    f32 = jnp.float32
    dt = x_ref.dtype
    db, L, d = x_ref.shape
    bias = bias_ref[0].astype(f32)  # (h, L, L), shared across the db designs

    for di in range(db):  # static unroll: designs folded into one cell
        x_i = x_ref[di]  # (L, d)
        r = rot_ref[di]  # (9, L)
        rc = lambda k: r[k : k + 1, :].astype(f32)[None]  # (1, 1, L)

        # fused projections: (F, L) = W^T-contraction against x rows
        proj = lambda w_ref: jax.lax.dot_general(
            w_ref[:], x_i, (((0,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        pjq, pjk, pjv = proj(wq_ref), proj(wk_ref), proj(wv_ref)

        def split(p, np_):
            return (
                p[: h * ds].reshape(h, ds, L),
                p[h * ds :].reshape(h, 3, np_, L),
            )

        qs, qp = split(pjq, pq)
        ks, kp = split(pjk, pq)
        vs, vp = split(pjv, pv)

        def fapply(p4, t_c, inverse=False):
            """x @ R + t per coordinate; p4 (h, 3, P, L), t_c(c) -> bcast.
            inverse=False: out_c = sum_i p_i R[i, c]  (rows 3*i+c);
            inverse=True:  out_c = sum_i p_i R[c, i]  (rows 3*c+i)."""
            cols = []
            for c in range(3):
                idx = (lambda i: 3 * i + c) if not inverse else (
                    lambda i: 3 * c + i
                )
                o = (
                    p4[:, 0] * rc(idx(0))
                    + p4[:, 1] * rc(idx(1))
                    + p4[:, 2] * rc(idx(2))
                )
                if t_c is not None:
                    o = o + t_c(c)
                cols.append(o[:, None])
            return jnp.concatenate(cols, axis=1)  # (h, 3, P, L)

        trg = trg_ref[di].astype(f32)  # (h, 3, L)
        trv = trv_ref[di].astype(f32)  # (3, L)
        qg = fapply(qp, lambda c: trg[:, c][:, None, :])
        kg = fapply(kp, lambda c: trg[:, c][:, None, :])
        vg = fapply(vp, lambda c: trv[c : c + 1, :][None])

        q_sq = jnp.sum((qg * qg).reshape(h, 3 * pq, L), 1, keepdims=True)
        k_sq = jnp.sum((kg * kg).reshape(h, 3 * pq, L), 1, keepdims=True)
        ones = jnp.ones((h, 1, L), f32)
        nk = jnp.broadcast_to(nk_ref[di].astype(f32)[None], (h, 1, L))
        f_aug = ds + 3 * pq + 3
        pad = -(-f_aug // 16) * 16 - f_aug
        zpad = jnp.zeros((h, pad, L), f32)
        q_aug = jnp.concatenate(
            [qs, (2.0 * qg).reshape(h, 3 * pq, L), -q_sq, -ones, ones, zpad],
            axis=1,
        ).astype(dt)
        k_aug = jnp.concatenate(
            [ks, kg.reshape(h, 3 * pq, L), ones, k_sq, nk, zpad], axis=1
        ).astype(dt)

        logit = jax.lax.dot_general(
            q_aug, k_aug, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )  # (h, L, L)
        logit = (logit + bias) * scale_total
        m = jnp.max(logit, axis=-1, keepdims=True)
        e = jnp.exp(logit - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        at = attn.astype(dt)
        attn_ref[di] = at

        # attention-weighted sums + output projection slices, all in VMEM
        wsum = lambda v_t: jax.lax.dot_general(
            v_t.astype(dt), at, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        os_ = wsum(vs)  # (h, ds, Li)
        out_proj = lambda t, w_ref: jax.lax.dot_general(
            t.astype(dt), w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        acc = out_proj(os_.reshape(h * ds, L), wos_ref)  # (L, d)

        og = wsum(vg.reshape(h, 3 * pv, L)).reshape(h, 3, pv, L)
        dd = og - trv[None, :, None, :]  # (h, 3, pv, L) - (1, 3, 1, L)
        loc = fapply(dd, None, inverse=True)
        nrm = jnp.sqrt(jnp.sum(loc * loc, axis=1) + 1e-8)  # (h, pv, L)
        acc = acc + out_proj(loc.reshape(h * 3 * pv, L), wop_ref)
        acc = acc + out_proj(nrm.reshape(h * pv, L), won_ref)
        acc_ref[di] = acc.astype(acc_ref.dtype)


def _layer_kernel_batched(
    x_ref,     # (db, L, d)
    rot_ref,   # (db, 9, L)   rows 3*i+j = R[i, j]
    trg_ref,   # (db, h, 3, L)  g-scaled translations (q/k side)
    trv_ref,   # (db, 3, L)     plain translations (v side)
    nk_ref,    # (db, 1, L)     -NEG_INF/scale_total on padded keys
    wq_ref,    # (d, h*(ds+3*pq))
    wk_ref,    # (d, h*(ds+3*pq))
    wv_ref,    # (d, h*(ds+3*pv))
    bias_ref,  # (1, h, L, L) f32 pair-bias logits
    wos_ref,   # (h*ds, d)
    wop_ref,   # (h*3*pv, d)  rows ordered (h, coord, pv)
    won_ref,   # (db? no) -> (h*pv, d)
    acc_ref,   # (db, L, d)
    attn_ref,  # (db, h, L, L)
    *,
    scale_total: float,
    h: int,
    ds: int,
    pq: int,
    pv: int,
):
    """Fat-dot fused layer (round 5): the same math as _layer_kernel but
    the per-cell dots that CAN legally batch across the db designs do —
    the three projection matmuls contract against all db*L residue rows
    at once, and the three output projections run once on lane-
    concatenated per-design operands.  Mosaic's tpu.matmul supports at
    most ONE batch dim (measured: a (db, h)-batched dot fails kernel
    verification), so the h-batched logit/weighted-sum dots stay per
    design under the static unroll.  The r5 roofline
    (runs/r5_roofline) put the unrolled kernel at ~32% of its own
    bandwidth-set bound with MXU issue overhead the prime suspect; the
    projections are 47% of kernel FLOPs and gain a db-times-fatter N
    dimension here.  Per-output-element f32 accumulation order is
    unchanged (same contraction, same lengths), so numerics match the
    unrolled kernel bit-for-bit.
    """
    f32 = jnp.float32
    dt = x_ref.dtype
    db, L, d = x_ref.shape
    bias = bias_ref[0].astype(f32)  # (h, L, L), shared across designs

    # ALL designs' projections in three 2D dots: (d, F)^T . (d, db*L)
    # -> (F, db*L); per-design views are 128-aligned lane slices.
    x2 = x_ref[:].reshape(db * L, d)  # leading-dim merge: layout-free
    proj = lambda w_ref: jax.lax.dot_general(
        w_ref[:], x2, (((0,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    pjq, pjk, pjv = proj(wq_ref), proj(wk_ref), proj(wv_ref)

    os_parts, loc_parts, nrm_parts = [], [], []
    for di in range(db):  # static unroll for the h-batched attention dots
        sl = slice(di * L, (di + 1) * L)
        r = rot_ref[di]  # (9, L)
        rc = lambda k: r[k : k + 1, :].astype(f32)[None]  # (1, 1, L)

        def split(p, np_):
            return (
                p[: h * ds, sl].reshape(h, ds, L),
                p[h * ds :, sl].reshape(h, 3, np_, L),
            )

        qs, qp = split(pjq, pq)
        ks, kp = split(pjk, pq)
        vs, vp = split(pjv, pv)

        def fapply(p4, t_c, inverse=False):
            """x @ R + t per coordinate; p4 (h, 3, P, L)."""
            cols = []
            for c in range(3):
                idx = (lambda i: 3 * i + c) if not inverse else (
                    lambda i: 3 * c + i
                )
                o = (
                    p4[:, 0] * rc(idx(0))
                    + p4[:, 1] * rc(idx(1))
                    + p4[:, 2] * rc(idx(2))
                )
                if t_c is not None:
                    o = o + t_c(c)
                cols.append(o[:, None])
            return jnp.concatenate(cols, axis=1)  # (h, 3, P, L)

        trg = trg_ref[di].astype(f32)  # (h, 3, L)
        trv = trv_ref[di].astype(f32)  # (3, L)
        qg = fapply(qp, lambda c: trg[:, c][:, None, :])
        kg = fapply(kp, lambda c: trg[:, c][:, None, :])
        vg = fapply(vp, lambda c: trv[c : c + 1, :][None])

        q_sq = jnp.sum((qg * qg).reshape(h, 3 * pq, L), 1, keepdims=True)
        k_sq = jnp.sum((kg * kg).reshape(h, 3 * pq, L), 1, keepdims=True)
        ones = jnp.ones((h, 1, L), f32)
        nk = jnp.broadcast_to(nk_ref[di].astype(f32)[None], (h, 1, L))
        f_aug = ds + 3 * pq + 3
        pad = -(-f_aug // 16) * 16 - f_aug
        zpad = jnp.zeros((h, pad, L), f32)
        q_aug = jnp.concatenate(
            [qs, (2.0 * qg).reshape(h, 3 * pq, L), -q_sq, -ones, ones,
             zpad], axis=1,
        ).astype(dt)
        k_aug = jnp.concatenate(
            [ks, kg.reshape(h, 3 * pq, L), ones, k_sq, nk, zpad], axis=1
        ).astype(dt)

        logit = jax.lax.dot_general(
            q_aug, k_aug, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )  # (h, L, L)
        logit = (logit + bias) * scale_total
        m = jnp.max(logit, axis=-1, keepdims=True)
        e = jnp.exp(logit - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        at = attn.astype(dt)
        attn_ref[di] = at

        wsum = lambda v_t: jax.lax.dot_general(
            v_t.astype(dt), at, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        os_parts.append(wsum(vs).reshape(h * ds, L))
        og = wsum(vg.reshape(h, 3 * pv, L)).reshape(h, 3, pv, L)
        dd = og - trv[None, :, None, :]
        loc = fapply(dd, None, inverse=True)
        nrm = jnp.sqrt(jnp.sum(loc * loc, axis=1) + 1e-8)  # (h, pv, L)
        loc_parts.append(loc.reshape(h * 3 * pv, L))
        nrm_parts.append(nrm.reshape(h * pv, L))

    # output projections ONCE per cell on lane-concatenated operands:
    # (rows, db*L) . (rows, d) -> (db*L, d) -> (db, L, d) (leading split)
    out_proj = lambda parts, w_ref: jax.lax.dot_general(
        jnp.concatenate(parts, axis=1).astype(dt), w_ref[:],
        (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    acc = (
        out_proj(os_parts, wos_ref)
        + out_proj(loc_parts, wop_ref)
        + out_proj(nrm_parts, won_ref)
    )
    acc_ref[:] = acc.reshape(db, L, d).astype(acc_ref.dtype)


def _pallas_layer(
    x, rot, trans, mask,
    w_qs, w_ks, w_vs, w_qp, w_kp, w_vp, w_os, w_op, w_on,
    bias, gamma, scale_scalar, scale_point, scale_total,
):
    """Assemble the reordered/pre-scaled operands and run the fused layer
    kernel.  Weight reordering and scaling are params-only — XLA hoists
    them out of the sampler scan.  Returns (acc (b, L, d), attn
    (b, h, L, L)), acc excluding the pair contribution and the output
    bias row (added by the caller)."""
    b, L, d = x.shape
    h = gamma.shape[0]
    ds = w_qs.shape[1] // h
    pq = w_qp.shape[1] // (h * 3)
    pv = w_vp.shape[1] // (h * 3)
    if pq != pv:
        raise ValueError("fused layer kernel assumes equal q/v point counts")
    bp = bias.shape[0]
    if b % bp:
        raise ValueError(f"state batch {b} is not a multiple of pair batch {bp}")
    n_designs = b // bp
    dt = x.dtype

    # ---- weights: reorder points (h, pq, 3) -> (h, 3, pq), fold scales --
    g = jnp.sqrt(0.5 * scale_point * gamma.astype(jnp.float32))  # (h,)
    reorder = lambda w, np_: jnp.transpose(
        w.reshape(d, h, np_, 3), (0, 1, 3, 2)
    ).reshape(d, h * 3 * np_)
    scale_heads = lambda w, np_: (
        w.reshape(d, h, 3 * np_) * g[None, :, None].astype(w.dtype)
    ).reshape(d, h * 3 * np_)
    wq = jnp.concatenate(
        [w_qs * jnp.asarray(scale_scalar, w_qs.dtype),
         scale_heads(reorder(w_qp, pq), pq)], axis=1,
    ).astype(dt)
    wk = jnp.concatenate(
        [w_ks, scale_heads(reorder(w_kp, pq), pq)], axis=1
    ).astype(dt)
    wv = jnp.concatenate([w_vs, reorder(w_vp, pv)], axis=1).astype(dt)
    # output projection: point rows native (h, pv, 3) -> kernel (h, 3, pv)
    w_op_r = jnp.transpose(
        w_op.reshape(h, pv, 3, d), (0, 2, 1, 3)
    ).reshape(h * 3 * pv, d).astype(dt)
    w_os_c = w_os.astype(dt)
    w_on_c = w_on.astype(dt)

    # ---- per-step tensors --------------------------------------------
    rot_r = jnp.transpose(rot, (0, 2, 3, 1)).reshape(b, 9, L).astype(dt)
    trv = jnp.swapaxes(trans, 1, 2).astype(dt)  # (b, 3, L)
    trg = (trv[:, None] * g[None, :, None, None].astype(dt))  # (b, h, 3, L)
    nk = (
        (mask.astype(jnp.float32) - 1.0) * (-_NEG_INF / float(scale_total))
    )[:, None, :].astype(dt)  # (b, 1, L)

    db = _pick_designs_per_block(n_designs)
    n_blocks = n_designs // db

    dspec = lambda *shape: pl.BlockSpec(
        (db,) + shape, lambda i, j: (i * n_blocks + j,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    wspec = lambda w: pl.BlockSpec(
        w.shape, lambda i, j: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (1, h, L, L), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pl.GridSpec(
        grid=(bp, n_blocks),
        in_specs=[
            dspec(L, d), dspec(9, L), dspec(h, 3, L), dspec(3, L),
            dspec(1, L),
            wspec(wq), wspec(wk), wspec(wv), bias_spec,
            wspec(w_os_c), wspec(w_op_r), wspec(w_on_c),
        ],
        out_specs=[dspec(L, d), dspec(h, L, L)],
    )
    kernel = functools.partial(
        _layer_kernel_batched if BATCHED_LAYER_KERNEL else _layer_kernel,
        scale_total=float(scale_total), h=h, ds=ds, pq=pq, pv=pv,
    )
    fq = h * (ds + 3 * pq)
    flops_per_design = (
        2 * L * d * (2 * fq + h * (ds + 3 * pv))  # projections
        + 2 * h * L * L * (ds + 3 * pq + 3)  # logits
        + 2 * h * L * L * (ds + 3 * pv)  # weighted sums
        + 2 * L * d * (h * ds + h * 3 * pv + h * pv)  # output projections
    )
    acc, attn = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, L, d), dt),
            jax.ShapeDtypeStruct((b, h, L, L), dt),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_design,
            bytes_accessed=(
                b * L * d * 2 * x.dtype.itemsize
                + b * h * L * L * x.dtype.itemsize
                + bp * h * L * L * bias.dtype.itemsize
            ),
            transcendentals=b * h * L * L,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, rot_r, trg, trv, nk, wq, wk, wv, bias, w_os_c, w_op_r, w_on_c)
    return acc, attn


def _layer_core_jnp(
    x, rot, trans, mask,
    w_qs, w_ks, w_vs, w_qp, w_kp, w_vp, w_os, w_op, w_on,
    bias, gamma, scale_scalar, scale_point, scale_total,
):
    """jnp mirror of the fused layer kernel (identical math, native
    layouts) — the VJP recompute target and the correctness-diff
    reference."""
    from diffab_pytorch_tpu.models.ipa import (
        frames_apply, frames_apply_inverse,
    )

    b, L, d = x.shape
    h = gamma.shape[0]
    ds = w_qs.shape[1] // h
    pq = w_qp.shape[1] // (h * 3)
    pv = w_vp.shape[1] // (h * 3)
    q_s = (x @ w_qs).reshape(b, L, h, ds)
    k_s = (x @ w_ks).reshape(b, L, h, ds)
    v_s = (x @ w_vs).reshape(b, L, h, ds)
    q_p = frames_apply((x @ w_qp).reshape(b, L, h, pq, 3), rot, trans)
    k_p = frames_apply((x @ w_kp).reshape(b, L, h, pq, 3), rot, trans)
    v_p = frames_apply((x @ w_vp).reshape(b, L, h, pv, 3), rot, trans)

    out_s_t, attn, out_p = _attention_core_raw_jnp(
        q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
        scale_scalar, scale_point, scale_total,
    )
    acc = jax.lax.dot_general(
        out_s_t.reshape(b, h * ds, L), w_os,
        dimension_numbers=(((1,), (0,)), ((), ())),
    )  # (b, L, d)
    out_p = frames_apply_inverse(out_p, rot, trans)
    nrm = jnp.sqrt(jnp.sum(out_p**2, axis=-1) + 1e-8)
    acc = acc + out_p.reshape(b, L, h * pv * 3) @ w_op
    acc = acc + nrm.reshape(b, L, h * pv) @ w_on
    return acc, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def fused_ipa_layer(
    x, rot, trans, mask,
    w_qs, w_ks, w_vs, w_qp, w_kp, w_vp, w_os, w_op, w_on,
    bias, gamma, scale_scalar, scale_point, scale_total,
):
    """Fully fused IPA layer (projections + frames + attention + output
    projections in one VMEM-resident kernel).  Weight matrices are passed
    in their NATIVE column orders (matching the flax Dense kernels); the
    wrapper reorders/pre-scales them outside the kernel.  Returns
    (acc (b, L, d), attn (b, h, L, L)); acc excludes the pair contribution
    and the to_out bias row."""
    return _pallas_layer(
        x, rot, trans, mask,
        w_qs, w_ks, w_vs, w_qp, w_kp, w_vp, w_os, w_op, w_on,
        bias, gamma, scale_scalar, scale_point, scale_total,
    )


def _fwd_layer(x, rot, trans, mask, w_qs, w_ks, w_vs, w_qp, w_kp, w_vp,
               w_os, w_op, w_on, bias, gamma,
               scale_scalar, scale_point, scale_total):
    out = _pallas_layer(
        x, rot, trans, mask, w_qs, w_ks, w_vs, w_qp, w_kp, w_vp,
        w_os, w_op, w_on, bias, gamma,
        scale_scalar, scale_point, scale_total,
    )
    return out, (x, rot, trans, mask, w_qs, w_ks, w_vs, w_qp, w_kp, w_vp,
                 w_os, w_op, w_on, bias, gamma)


def _bwd_layer(scale_scalar, scale_point, scale_total, residuals, grads):
    """Backward differentiates the identical jnp computation (recompute)."""
    _, vjp = jax.vjp(
        lambda *args: _layer_core_jnp(
            *args, scale_scalar=scale_scalar, scale_point=scale_point,
            scale_total=scale_total,
        ),
        *residuals,
    )
    return vjp(grads)


fused_ipa_layer.defvjp(_fwd_layer, _bwd_layer)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_ipa_attention(
    q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
    scale_scalar, scale_point, scale_total,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused IPA attention core.  Returns (out_s, out_pair, out_p) shaped
    (b, L, h, ds) / (b, L, h, dp) / (b, L, h, P, 3)."""
    return _pallas_forward(
        q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
        scale_scalar, scale_point, scale_total,
    )


def _fwd(q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
         scale_scalar, scale_point, scale_total):
    out = _pallas_forward(
        q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
        scale_scalar, scale_point, scale_total,
    )
    return out, (q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask)


def _bwd(scale_scalar, scale_point, scale_total, residuals, grads):
    """Backward differentiates the identical jnp computation (recompute)."""
    q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask = residuals
    _, vjp = jax.vjp(
        lambda *args: _attention_core_jnp(
            *args, scale_scalar=scale_scalar, scale_point=scale_point,
            scale_total=scale_total,
        ),
        q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
    )
    return vjp(grads)


fused_ipa_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_ipa_attention_raw(
    q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
    scale_scalar, scale_point, scale_total,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused IPA attention core, RAW outputs (no pair reduction):
    out_s in the kernel's (b, h, ds, L) layout, attn (b, h, L, L), and
    out_p (b, L, h, P, 3).  Lets the caller consume out_s and attn in
    layouts that avoid the design-major relayouts of the fan-out path
    (models/ipa.py applies the output projection as sliced partial
    matmuls; DESIGN.md §3)."""
    out_s, out_p, attn = _pallas_raw(
        q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
        scale_scalar, scale_point, scale_total,
    )
    b, L = q_s.shape[:2]
    pv = v_p.shape[3]
    out_p = jnp.transpose(out_p, (0, 3, 1, 2)).reshape(b, L, -1, pv, 3)
    return out_s, attn, out_p


def _fwd_raw(q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
             scale_scalar, scale_point, scale_total):
    out = fused_ipa_attention_raw(
        q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
        scale_scalar, scale_point, scale_total,
    )
    return out, (q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask)


def _bwd_raw(scale_scalar, scale_point, scale_total, residuals, grads):
    """Backward differentiates the identical jnp computation (recompute)."""
    q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask = residuals
    _, vjp = jax.vjp(
        lambda *args: _attention_core_raw_jnp(
            *args, scale_scalar=scale_scalar, scale_point=scale_point,
            scale_total=scale_total,
        ),
        q_s, k_s, v_s, q_p, k_p, v_p, bias, gamma, mask,
    )
    return vjp(grads)


fused_ipa_attention_raw.defvjp(_fwd_raw, _bwd_raw)
