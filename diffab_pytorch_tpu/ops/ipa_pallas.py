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
    q_s_ref, k_s_ref, v_s_ref,  # (h*ds, L) — transposed: L is the lane dim
    q_p_ref, k_p_ref, v_p_ref,  # (h*P*3, L)
    pair_t_ref,  # (L, dp, L) — pair transposed
    bias_ref,  # (h*L, L) — precomputed pair-bias logits
    gamma_ref,  # (1, h)
    mask_ref,  # (1, L)
    out_s_ref,  # (h*ds, L)
    out_pair_ref,  # (h*dp, L)
    out_p_ref,  # (h*P*3, L)
    *,
    n_head: int,
    d_scalar: int,
    n_point: int,
    d_pair: int,
    scale_scalar: float,
    scale_point: float,
    scale_total: float,
):
    """Everything lives in (features, L) layout: per-head access is an
    8-aligned SUBLANE slice (Mosaic requires 128-aligned LANE slices, which
    per-head feature widths like 192 cannot satisfy)."""
    L = mask_ref.shape[1]
    p3 = n_point * 3
    f32 = jnp.float32

    pair_t = pair_t_ref[:].astype(f32)  # (L, dp, L), read once, all heads
    mask_row = mask_ref[0, :]  # (L,)
    neg = jnp.where(mask_row > 0, 0.0, _NEG_INF)[None, :]  # (1, L)

    contract_first = lambda a, b_: jax.lax.dot_general(
        a, b_, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    for head in range(n_head):
        sl_s = slice(head * d_scalar, (head + 1) * d_scalar)
        sl_p = slice(head * p3, (head + 1) * p3)

        qs = q_s_ref[sl_s, :].astype(f32)  # (ds, L)
        ks = k_s_ref[sl_s, :].astype(f32)
        # logit[i, j] = sum_d qs[d, i] ks[d, j]
        logit = contract_first(qs, ks) * scale_scalar  # (L, L)

        qp = q_p_ref[sl_p, :].astype(f32)  # (p3, L)
        kp = k_p_ref[sl_p, :].astype(f32)
        cross = contract_first(qp, kp)  # (L, L)
        q_sq = jnp.sum(qp * qp, axis=0)[:, None]  # (L, 1)
        k_sq = jnp.sum(kp * kp, axis=0)[None, :]  # (1, L)
        sq_dist = q_sq + k_sq - 2.0 * cross
        g = gamma_ref[0, head]
        logit = logit - (0.5 * scale_point) * g * sq_dist

        bias_h = bias_ref[head * L : (head + 1) * L, :].astype(f32)  # (L, L)
        logit = (logit + bias_h) * scale_total
        logit = logit + neg  # mask padded keys

        m = jnp.max(logit, axis=-1, keepdims=True)
        e = jnp.exp(logit - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)  # (L, L) rows = queries

        # out_t[d, i] = sum_j v_t[d, j] attn[i, j]
        attn_t_mm = lambda v_t: jax.lax.dot_general(
            v_t, attn, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        out_s_ref[sl_s, :] = attn_t_mm(v_s_ref[sl_s, :].astype(f32)).astype(
            out_s_ref.dtype
        )
        out_p_ref[sl_p, :] = attn_t_mm(v_p_ref[sl_p, :].astype(f32)).astype(
            out_p_ref.dtype
        )

        # attended pair rows: out[i, d] = sum_j attn[i, j] pair_t[i, d, j]
        # — batched over i; the singleton lhs dim matters (Mosaic cannot
        # lower a batched dot whose lhs has no non-contracting dims)
        out_pair_h = jax.lax.dot_general(
            attn[:, None, :],
            pair_t,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        )[:, 0, :]  # (L, dp)
        out_pair_ref[head * d_pair : (head + 1) * d_pair, :] = (
            out_pair_h.T.astype(out_pair_ref.dtype)
        )


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

    # transposed (features, L) layout so L is always the lane dimension
    flat_t = lambda x: jnp.swapaxes(x.reshape(b, L, -1), -1, -2)
    kernel = functools.partial(
        _kernel,
        n_head=h,
        d_scalar=ds,
        n_point=pq,
        d_pair=dp,
        scale_scalar=float(scale_scalar),
        scale_point=float(scale_point),
        scale_total=float(scale_total),
    )

    def col_spec(height):
        return pl.BlockSpec((1, height, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            col_spec(h * ds), col_spec(h * ds), col_spec(h * ds),
            col_spec(h * pq * 3), col_spec(h * pq * 3), col_spec(h * pv * 3),
            pl.BlockSpec((1, L, dp, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            col_spec(h * L),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            col_spec(h * ds), col_spec(h * dp), col_spec(h * pv * 3),
        ],
    )

    # block shapes carry a leading 1 (batch); squeeze inside via index 0
    def kernel_wrap(qs, ks, vs, qp, kp, vp, prt, bi, g, m, os, op, opt):
        kernel(
            qs.at[0], ks.at[0], vs.at[0], qp.at[0], kp.at[0], vp.at[0],
            prt.at[0], bi.at[0], g, m.at[0], os.at[0], op.at[0], opt.at[0],
        )

    out_shapes = [
        jax.ShapeDtypeStruct((b, h * ds, L), dt),
        jax.ShapeDtypeStruct((b, h * dp, L), dt),
        jax.ShapeDtypeStruct((b, h * pv * 3, L), dt),
    ]
    out_s, out_pair, out_p = pl.pallas_call(
        kernel_wrap,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        # interpret on CPU so the kernel is testable on the faked mesh
        interpret=jax.default_backend() == "cpu",
    )(
        flat_t(q_s), flat_t(k_s), flat_t(v_s),
        flat_t(q_p), flat_t(k_p), flat_t(v_p),
        pair_t, bias.reshape(b, h * L, L), gamma.reshape(1, h),
        mask.astype(dt)[:, None, :],
    )
    unflat = lambda x: jnp.swapaxes(x, -1, -2)
    return (
        unflat(out_s).reshape(b, L, h, ds),
        unflat(out_pair).reshape(b, L, h, dp),
        unflat(out_p).reshape(b, L, h, pv, 3),
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
