"""IGSO(3) (isotropic Gaussian on SO(3)) angular density tables and sampling.

TPU-native re-design of the reference's `diffab_pytorch/so3.py:9-126` (class
SO3).  The reference precomputes, per sigma in the diffusion schedule, an
8192-bin histogram of the IGSO(3) angular pdf with a Python loop over sigmas
and caches it to disk keyed by Python hash() (fragile — SURVEY.md §2.9#14).
Here:

  * The whole (n_sigmas, n_bins) table is one float64 numpy matmul at init
    ((2l+1)e^{-l(l+1)sigma^2} terms against sin((l+1/2)theta)/sin(theta/2)
    angle terms), deterministic and fast enough (~10 ms) that no disk cache
    is needed.  Semantics of so3.py:52-72 incl. the NaN-scrub and clamp >= 0
    (so3.py:61).
  * Sampling is pure jax.random, shape-static and jit/scan-friendly: the
    angle is drawn from a precomputed piecewise-linear inverse CDF (one
    gather + lerp; same distribution as the reference's torch.multinomial
    over bin masses + uniform jitter, so3.py:74-84), or —
    for sigma >= 0.1 — from N(2 sigma, sigma^2) folded mod pi
    (so3.py:86-96).  The branch select is a jnp.where on a precomputed
    per-sigma mask (so3.py:122-125).
  * The axis is uniform on S^2 via a normalized 3D Gaussian (so3.py:110-114).

The resulting axis-angle vectors feed `so3.vector_to_rotation_matrix` exactly
as in the reference's OrientationDiffuser (diffusion.py:284-289).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_N_BINS = 8192
DEFAULT_N_TERMS = 1024
DEFAULT_SIGMA_THRESHOLD = 0.1


class IGSO3Table(NamedTuple):
    """Precomputed per-sigma angular distribution tables (device arrays).

    Attributes:
      sigmas:   (S,)  the sigma grid (typically sqrt(1 - alpha_bar) of the
                diffusion schedule, indexed by timestep — diffusion.py:254-255).
      probs:    (S, n_bins) normalized bin masses of the IGSO(3) angular pdf.
      cdf:      (S, n_bins) inclusive cumulative masses (last column == 1).
      inv_cdf:  (S, n_bins + 1) theta at evenly spaced quantiles — the
                piecewise-linear inverse of the CDF, so sampling is ONE
                gather + lerp instead of a 13-step on-device binary search
                (which cost ~0.5 ms per reverse step in the sampler scan).
      use_hist: (S,) bool, True where sigma < sigma_threshold (histogram
                branch), False for the folded-Gaussian branch.
    """

    sigmas: jax.Array
    probs: jax.Array
    cdf: jax.Array
    inv_cdf: jax.Array
    use_hist: jax.Array

    @property
    def n_bins(self) -> int:
        return self.probs.shape[-1]


def igso3_angular_pdf(
    theta: np.ndarray, sigmas: np.ndarray, n_terms: int = DEFAULT_N_TERMS
) -> np.ndarray:
    """IGSO(3) angular density f(theta | sigma) on a (S, len(theta)) grid.

    f(theta|sigma) = (1-cos theta)/pi * sum_{l=0}^{n_terms-1}
                     (2l+1) e^{-l(l+1) sigma^2} sin((l+1/2) theta)/sin(theta/2)

    Float64 on host.  Semantics of reference so3.py:65-72, vectorized over
    all sigmas at once as a (S, L) x (L, B) matmul.
    """
    theta = np.asarray(theta, dtype=np.float64)
    sigmas = np.asarray(sigmas, dtype=np.float64)
    ls = np.arange(n_terms, dtype=np.float64)

    # (S, n_terms): series coefficients per sigma.
    coef = (2.0 * ls + 1.0) * np.exp(-ls * (ls + 1.0) * sigmas[:, None] ** 2)
    # (n_terms, B): angle-dependent factor.
    with np.errstate(divide="ignore", invalid="ignore"):
        ang = np.sin((ls[:, None] + 0.5) * theta[None, :]) / np.sin(theta[None, :] / 2.0)
    series = coef @ ang  # (S, B)
    pdf = (1.0 - np.cos(theta))[None, :] / np.pi * series
    pdf = np.nan_to_num(pdf)
    return np.clip(pdf, 0.0, None)


def build_igso3_table(
    sigmas: np.ndarray,
    n_bins: int = DEFAULT_N_BINS,
    n_terms: int = DEFAULT_N_TERMS,
    sigma_threshold: float = DEFAULT_SIGMA_THRESHOLD,
    dtype=jnp.float32,
) -> IGSO3Table:
    """Build the sampling tables for a sigma grid (host compute, device output).

    Bin layout matches reference so3.py:56-57: n_bins equal bins over
    [0, pi), pdf evaluated at bin centers.
    """
    sigmas = np.asarray(sigmas, dtype=np.float64).reshape(-1)
    binsize = np.pi / n_bins
    bin_centers = np.arange(n_bins, dtype=np.float64) * binsize + binsize / 2.0

    probs = igso3_angular_pdf(bin_centers, sigmas, n_terms=n_terms)  # (S, B)

    row_sum = probs.sum(axis=-1, keepdims=True)
    # Degenerate rows fall back to a point mass at theta ~ 0, the correct
    # sigma -> 0 limit.  At sigma ~ 0 the truncated series (n_terms) is an
    # unconverged Dirichlet-kernel partial sum whose clipped values are junk
    # spread over [0, pi) — the reference samples from that junk (so3.py:61
    # only NaN-scrubs); we detect it via the convergence radius instead:
    # terms decay like e^{-l^2 sigma^2}, so sigma * n_terms >> 1 is required.
    degenerate = (row_sum <= 0.0) | (sigmas[:, None] * n_terms < 6.0)
    fallback = np.zeros_like(probs)
    fallback[:, 0] = 1.0
    probs = np.where(degenerate, fallback, probs / np.where(degenerate, 1.0, row_sum))

    cdf = np.cumsum(probs, axis=-1)
    cdf = cdf / cdf[:, -1:]

    # piecewise-linear inverse CDF on an even quantile grid.  theta(u) for
    # u in [0, 1): the CDF is a step function over bins; its exact inverse
    # with the reference's uniform-jitter-within-bin semantics is the
    # piecewise-linear interpolant through (cdf[k], bin_edge[k+1]) —
    # np.interp against the bin EDGES reproduces it up to quantile
    # resolution (n_bins + 1 quantiles keeps that resolution at bin level).
    n_q = n_bins + 1
    quantiles = np.linspace(0.0, 1.0, n_q)
    edges = np.arange(n_bins + 1, dtype=np.float64) * binsize
    inv = np.empty((sigmas.size, n_q), np.float64)
    for i in range(sigmas.size):
        inv[i] = np.interp(quantiles, np.concatenate([[0.0], cdf[i]]), edges)

    return IGSO3Table(
        sigmas=jnp.asarray(sigmas, dtype=dtype),
        probs=jnp.asarray(probs, dtype=dtype),
        cdf=jnp.asarray(cdf, dtype=dtype),
        inv_cdf=jnp.asarray(inv, dtype=dtype),
        use_hist=jnp.asarray(sigmas < sigma_threshold),
    )


def _quantile_pair_select(
    inv_rows: jax.Array, i0: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(inv_rows[..., i0], inv_rows[..., i0 + 1]) per sample, via two-level
    one-hot contractions instead of element gathers.

    inv_rows: (S, n_q); i0: (S, M) int32 in [0, n_q - 2].  Returns two
    (S, M) arrays.  TPU has no hardware gather — the r4 trace of the
    reverse scan showed each 16k-element take_along_axis over the
    (128, 8193) inverse-CDF costing 166 us (two of them = 11% of the whole
    scan, runs/profile_r4/sample_top_ops.json), while the equivalent
    one-hot matmuls are microseconds of MXU time.  The index factors as
    i = hi * W2 + lo: level 1 selects the hi-block of W2 consecutive
    quantiles with a (M, W1) one-hot batched matmul; level 2 selects
    within the block with an elementwise one-hot reduce.  The shifted
    (t1) values reuse the SAME one-hots against the rows shifted by one
    quantile — selection by 1.0-products is exact in f32."""
    S, n_q = inv_rows.shape
    M = i0.shape[-1]
    n = n_q - 1  # valid i0 range [0, n-1]; i0+1 reaches n
    W1 = 128 if n >= 128 else n
    W2 = -(-n // W1)  # ceil
    pad = W1 * W2 - n
    base = inv_rows[:, :-1]  # theta at quantiles 0..n-1
    shift = inv_rows[:, 1:]  # theta at quantiles 1..n
    if pad:
        base = jnp.pad(base, ((0, 0), (0, pad)), mode="edge")
        shift = jnp.pad(shift, ((0, 0), (0, pad)), mode="edge")
    base = base.reshape(S, W1, W2)
    shift = shift.reshape(S, W1, W2)
    dtype = inv_rows.dtype
    oh_hi = jax.nn.one_hot(i0 // W2, W1, dtype=dtype)  # (S, M, W1)
    oh_lo = jax.nn.one_hot(i0 % W2, W2, dtype=dtype)  # (S, M, W2)
    blk0 = jnp.einsum("smh,shw->smw", oh_hi, base)
    blk1 = jnp.einsum("smh,shw->smw", oh_hi, shift)
    return (blk0 * oh_lo).sum(-1), (blk1 * oh_lo).sum(-1)


def sample_angle(
    key: jax.Array,
    table: IGSO3Table,
    sigma_idx: jax.Array,
    sample_shape: tuple[int, ...],
) -> jax.Array:
    """Sample rotation angles theta for each sigma index.

    sigma_idx: integer array of shape S_; returns angles of shape
    S_ + sample_shape, each drawn from the distribution of
    sigmas[sigma_idx[...]] — histogram branch for small sigma, folded
    Gaussian otherwise (reference so3.py:74-96,118-125).
    """
    k_bin, k_gauss = jax.random.split(key, 2)
    out_shape = tuple(sigma_idx.shape) + tuple(sample_shape)

    # --- histogram branch: piecewise-linear inverse-CDF lookup ---
    # (distributionally equivalent to bin-by-mass + uniform jitter).  The
    # per-sample quantile reads are one-hot contractions, not gathers —
    # see _quantile_pair_select.
    n_q = table.inv_cdf.shape[-1]
    inv_rows = table.inv_cdf[sigma_idx.reshape(-1)]  # (S, n_q) row gather
    u = jax.random.uniform(k_bin, out_shape, dtype=table.inv_cdf.dtype)
    pos = u * (n_q - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, n_q - 2)
    frac = pos - i0.astype(pos.dtype)
    m = int(np.prod(sample_shape)) if sample_shape else 1
    t0, t1 = _quantile_pair_select(inv_rows, i0.reshape(len(inv_rows), m))
    t0, t1 = t0.reshape(out_shape), t1.reshape(out_shape)
    theta_hist = t0 * (1.0 - frac) + t1 * frac

    # --- Gaussian branch: N(2 sigma, sigma^2) folded into [0, pi) ---
    sig = table.sigmas[sigma_idx].reshape(
        tuple(sigma_idx.shape) + (1,) * len(sample_shape)
    )
    eps = jax.random.normal(k_gauss, out_shape, dtype=table.sigmas.dtype)
    theta_gauss = jnp.mod(2.0 * sig + sig * eps, jnp.pi)

    use_hist = table.use_hist[sigma_idx].reshape(
        tuple(sigma_idx.shape) + (1,) * len(sample_shape)
    )
    return jnp.where(use_hist, theta_hist, theta_gauss)


def sample_angle_continuous(
    key: jax.Array,
    table: IGSO3Table,
    sigma: jax.Array,
    sample_shape: tuple[int, ...],
    sigma_threshold: float = DEFAULT_SIGMA_THRESHOLD,
) -> jax.Array:
    """Sample rotation angles for ARBITRARY sigma values (not just the
    table's grid rows).

    Needed by the posterior-variance orientation reverse step
    (diffusion/orientation.py): the rotational beta-tilde analogue
    sigma_tilde(t, s) falls between schedule sigmas.  For
    sigma >= sigma_threshold the folded-Gaussian branch is EXACT at the
    requested sigma (no table involved); below it, theta is drawn from the
    piecewise-linear inverse CDFs of the two bracketing table rows at the
    same quantile and lerped by sigma — monotone in sigma, so the
    interpolated quantile function stays a valid quantile function.
    Requires table.sigmas sorted ascending (true for schedule tables:
    sqrt(1 - abar_t) increases with t)."""
    k_bin, k_gauss = jax.random.split(key, 2)
    out_shape = tuple(sigma.shape) + tuple(sample_shape)
    expand = tuple(sigma.shape) + (1,) * len(sample_shape)

    srt = table.sigmas
    n_rows = srt.shape[0]
    hi = jnp.clip(jnp.searchsorted(srt, sigma), 1, n_rows - 1)
    lo = hi - 1
    w = (sigma - srt[lo]) / jnp.maximum(srt[hi] - srt[lo], 1e-12)
    w = jnp.clip(w, 0.0, 1.0).reshape(expand)

    n_q = table.inv_cdf.shape[-1]
    u = jax.random.uniform(k_bin, out_shape, dtype=table.inv_cdf.dtype)
    pos = u * (n_q - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_q - 2)
    frac = pos - i0.astype(pos.dtype)
    m = int(np.prod(sample_shape)) if sample_shape else 1
    i0_flat = i0.reshape(-1, m)

    def row_theta(idx):
        rows = table.inv_cdf[idx.reshape(-1)]  # (S, n_q) row gather
        t0, t1 = _quantile_pair_select(rows, i0_flat)
        t0, t1 = t0.reshape(out_shape), t1.reshape(out_shape)
        return t0 * (1.0 - frac) + t1 * frac

    theta_hist = (1.0 - w) * row_theta(lo) + w * row_theta(hi)

    sig = sigma.reshape(expand).astype(table.sigmas.dtype)
    eps = jax.random.normal(k_gauss, out_shape, dtype=table.sigmas.dtype)
    theta_gauss = jnp.mod(2.0 * sig + sig * eps, jnp.pi)

    return jnp.where(sig < sigma_threshold, theta_hist, theta_gauss)


def sample_axis_angle_continuous(
    key: jax.Array,
    table: IGSO3Table,
    sigma: jax.Array,
    sample_shape: tuple[int, ...],
    sigma_threshold: float = DEFAULT_SIGMA_THRESHOLD,
) -> jax.Array:
    """Axis-angle IGSO3(I, sigma) samples at arbitrary sigma (see
    sample_angle_continuous).  Returns sigma.shape + sample_shape + (3,)."""
    k_axis, k_theta = jax.random.split(key)
    out_shape = tuple(sigma.shape) + tuple(sample_shape)
    axis = jax.random.normal(k_axis, out_shape + (3,), dtype=table.sigmas.dtype)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    theta = sample_angle_continuous(
        k_theta, table, sigma, sample_shape, sigma_threshold=sigma_threshold
    )
    return axis * theta[..., None]


def sample_axis_angle(
    key: jax.Array,
    table: IGSO3Table,
    sigma_idx: jax.Array,
    sample_shape: tuple[int, ...],
) -> jax.Array:
    """Sample axis-angle rotation vectors from IGSO3(I, sigmas[sigma_idx]).

    Returns shape sigma_idx.shape + sample_shape + (3,).  Matches the
    reference's SO3.sample_isotropic_gaussian (so3.py:98-126): uniform axis
    on S^2 times an angle from `sample_angle`.
    """
    k_axis, k_theta = jax.random.split(key)
    out_shape = tuple(sigma_idx.shape) + tuple(sample_shape)
    axis = jax.random.normal(k_axis, out_shape + (3,), dtype=table.sigmas.dtype)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    theta = sample_angle(k_theta, table, sigma_idx, sample_shape)
    return axis * theta[..., None]
