"""Fused Pallas TPU kernel for the IPA attention core.

The hot loop of the denoiser (reference diffab_pytorch.py:389-465, executed
6 layers x T=100 steps per design) fused into one VMEM-resident kernel per
batch element:

    scalar logits + pair bias + point-distance logits -> masked softmax ->
    three attention-weighted reductions (scalar values, pair rows, points)

without ever materializing the (b, h, L, L) attention tensor in HBM.  The
pair-bias projection stays OUTSIDE the kernel (it is one well-shaped MXU
matmul that XLA handles, and it is invariant across scan steps); the pair
tensor enters the kernel TRANSPOSED to (b, L, d_pair, L) so its lane
dimension is L = 128 (Mosaic requires 128-aligned lanes on batch-sliced
blocks — d_pair = 64 is not).  The point-distance term uses the same
|q|^2+|k|^2-2qk expansion as the jnp path (models/ipa.py), so outputs are
bit-comparable.

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
    correctness diffing of the kernel)."""
    b, L, h, ds = q_s.shape
    pq = q_p.shape[3]

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
    q_s_ref, k_s_ref, v_s_ref,  # (h, ds, L) — transposed: L is the lane dim
    q_p_ref, k_p_ref, v_p_ref,  # (h, P*3, L)
    pair_t_ref,  # (L, dp, L) — pair transposed
    bias_ref,  # (h, L, L) — precomputed pair-bias logits
    gamma_ref,  # (1, h)
    mask_ref,  # (1, L)
    out_s_ref,  # (h, ds, L)
    out_pair_ref,  # (L, h, dp)
    out_p_ref,  # (h, P*3, L)
    *,
    scale_scalar: float,
    scale_point: float,
    scale_total: float,
):
    """Head-BATCHED formulation: every contraction is one dot_general with
    the head axis as a batch dimension (no per-head Python loop — Mosaic
    unrolls loops into h separate small ops, while batched dots pipeline on
    the MXU).  Matmuls run in the INPUT dtype (bf16 on TPU) with f32
    accumulation; logit algebra and softmax stay f32.  The (features, L)
    layout keeps L as the lane dimension (Mosaic requires 128-aligned lane
    slices; per-head feature widths like 192 cannot satisfy that)."""
    f32 = jnp.float32
    dt_in = q_s_ref.dtype

    mask_row = mask_ref[0, :]  # (L,)
    neg = jnp.where(mask_row > 0, 0.0, _NEG_INF)[None, None, :]  # (1, 1, L)
    gamma = gamma_ref[0, :].astype(f32)  # (h,)

    # logit[h, i, j] = sum_d q[h, d, i] k[h, d, j]
    qk_dot = lambda a, b_: jax.lax.dot_general(
        a, b_, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (h, L, L)

    logit = qk_dot(q_s_ref[:], k_s_ref[:]) * scale_scalar  # (h, L, L) f32

    qp = q_p_ref[:]  # (h, p3, L)
    kp = k_p_ref[:]
    cross = qk_dot(qp, kp)  # (h, L, L)
    qp32 = qp.astype(f32)
    kp32 = kp.astype(f32)
    q_sq = jnp.sum(qp32 * qp32, axis=1)  # (h, L)
    k_sq = jnp.sum(kp32 * kp32, axis=1)
    sq_dist = q_sq[:, :, None] + k_sq[:, None, :] - 2.0 * cross
    logit = logit - (0.5 * scale_point) * gamma[:, None, None] * sq_dist

    logit = (logit + bias_ref[:].astype(f32)) * scale_total
    logit = logit + neg  # mask padded keys

    m = jnp.max(logit, axis=-1, keepdims=True)
    e = jnp.exp(logit - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)  # (h, i, j) f32
    attn_in = attn.astype(dt_in)

    # out[h, d, i] = sum_j v[h, d, j] attn[h, i, j]
    v_dot = lambda v_t: jax.lax.dot_general(
        v_t, attn_in, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    out_s_ref[:] = v_dot(v_s_ref[:]).astype(out_s_ref.dtype)
    out_p_ref[:] = v_dot(v_p_ref[:]).astype(out_p_ref.dtype)

    # attended pair rows, ALL heads in one batched-over-queries dot:
    # out[i, h, d] = sum_j attn[h, i, j] pair_t[i, d, j]
    attn_ib = jnp.transpose(attn_in, (1, 0, 2))  # (i, h, j)
    out_pair = jax.lax.dot_general(
        attn_ib, pair_t_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (i, h, dp)
    out_pair_ref[:] = out_pair.astype(out_pair_ref.dtype)


def _pallas_forward(
    q_s, k_s, v_s, q_p, k_p, v_p, pair, bias, gamma, mask,
    scale_scalar, scale_point, scale_total,
):
    b, L, h, ds = q_s.shape
    pq = q_p.shape[3]
    pv = v_p.shape[3]
    dp = pair.shape[-1]
    if pq != pv:
        raise ValueError("pallas kernel assumes n_query_points == n_value_points")
    dt = q_s.dtype

    pair_t = jnp.swapaxes(pair, -1, -2)  # (b, L, dp, L): lane dim = L

    # head-batched (h, features, L) layout so L is always the lane dimension
    head_t = lambda x: jnp.transpose(x.reshape(b, L, h, -1), (0, 2, 3, 1))
    kernel = functools.partial(
        _kernel,
        scale_scalar=float(scale_scalar),
        scale_point=float(scale_point),
        scale_total=float(scale_total),
    )

    def head_spec(height):
        return pl.BlockSpec((1, h, height, L), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            head_spec(ds), head_spec(ds), head_spec(ds),
            head_spec(pq * 3), head_spec(pq * 3), head_spec(pv * 3),
            pl.BlockSpec((1, L, dp, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            head_spec(L),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            head_spec(ds),
            pl.BlockSpec((1, L, h, dp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            head_spec(pv * 3),
        ],
    )

    # block shapes carry a leading 1 (batch); squeeze inside via index 0
    def kernel_wrap(qs, ks, vs, qp, kp, vp, prt, bi, g, m, os, op, opt):
        kernel(
            qs.at[0], ks.at[0], vs.at[0], qp.at[0], kp.at[0], vp.at[0],
            prt.at[0], bi.at[0], g, m.at[0], os.at[0], op.at[0], opt.at[0],
        )

    out_shapes = [
        jax.ShapeDtypeStruct((b, h, ds, L), dt),
        jax.ShapeDtypeStruct((b, L, h, dp), dt),
        jax.ShapeDtypeStruct((b, h, pv * 3, L), dt),
    ]
    flops_per_b = 2 * h * L * L * (2 * ds + 2 * pq * 3 + dp)
    out_s, out_pair, out_p = pl.pallas_call(
        kernel_wrap,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_b,
            bytes_accessed=pair_t.size * pair_t.dtype.itemsize
            + b * h * L * L * bias.dtype.itemsize,
            transcendentals=b * h * L * L,
        ),
        # interpret on CPU so the kernel is testable on the faked mesh
        interpret=jax.default_backend() == "cpu",
    )(
        head_t(q_s), head_t(k_s), head_t(v_s),
        head_t(q_p), head_t(k_p), head_t(v_p),
        pair_t, bias, gamma.reshape(1, h),
        mask.astype(dt)[:, None, :],
    )
    unhead = lambda x: jnp.transpose(x, (0, 3, 1, 2))  # (b, L, h, f)
    return (
        unhead(out_s),
        out_pair,
        unhead(out_p).reshape(b, L, h, pv, 3),
    )


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
