"""Designed-loop geometry relaxation (lightweight loop closure).

At noise_scale = 1.0 the exact-posterior reverse chain re-injects noise in
every step; the designed loop it produces is near-native at the scored
positions but routinely carries one or two CA-CA steps outside the
[2.7, 4.3] A continuity window — typically at the loop ANCHORS, where a
designed residue must meet an immovable context residue
(QUALITY.md validity rates; the peptide-bond idealization pass deliberately
does not mask these).  The reference has no design post-processing at all
(its sampler is a stub, diffab_pytorch.py:770-776).

`relax_ca` is a damped Jacobi projection onto the stereochemistry gate's
CA-level constraints (evaluation.metrics.backbone_validity):

  * chain continuity — each chain-successor edge whose length falls
    outside the validity window is shortened/lengthened along its current
    direction toward an inner target window (margin for convergence);
  * clash repulsion — each non-bonded CA pair closer than the clash
    cutoff is pushed apart.

Corrections are split between a constraint's endpoints in proportion to
which of them are designed; context residues NEVER move.  Constraints fire
ONLY on gate-violating geometry, so anything that already passes the gate
is an exact fixed point (valid designs pass through bit-identical).  The
pass is jit-compatible (fixed iteration count, no data-dependent shapes)
and runs inside the fused quality-eval program.

Moving a CA translates its whole residue rigidly (N/C/O are frame-local
offsets in structure/reconstruct.py), so the pass composes with the
designed-edge peptide-bond idealization, which runs after it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Repair targets sit INSIDE the validity windows (metrics.CA_CA_RANGE =
# [2.70, 4.30], CLASH_DIST = 3.0) so repaired geometry passes with margin;
# the chain window still admits cis-peptides (~2.95 A).
RELAX_CA_RANGE = (2.90, 4.10)
RELAX_CLASH_TARGET = 3.15
_GATE_CA_RANGE = (2.70, 4.30)  # = metrics.CA_CA_RANGE
_GATE_CLASH = 3.0  # = metrics.CLASH_DIST


def relax_ca(
    translations: jax.Array,  # (b, L, 3) CA positions, model units
    residue_mask: jax.Array,  # (b, L)
    chain_idx: jax.Array,  # (b, L) int
    residue_idx: jax.Array,  # (b, L) int — position along the chain
    gen_mask: jax.Array,  # (b, L) — designed positions (only these move)
    coord_scale: float = 1.0,  # multiply model units by this for angstroms
    n_iters: int = 200,
    damping: float = 0.5,
) -> jax.Array:
    """Project designed CA positions onto the chain-continuity and clash
    constraints of the stereochemistry gate.

    Chain adjacency comes from (chain_idx, residue_idx) — patch rows are
    k-NN selections, not chain-contiguous (same convention as
    evaluation.metrics.backbone_validity).  Returns translations with ONLY
    designed rows updated; context rows are returned byte-identical, and
    gate-valid geometry is returned unchanged (constraints fire only on
    violations)."""
    x0 = translations
    x = translations.astype(jnp.float32)
    rm = residue_mask.astype(bool)
    gm = gen_mask.astype(bool) & rm

    same_chain = (chain_idx[:, :, None] == chain_idx[:, None, :]) & (
        rm[:, :, None] & rm[:, None, :]
    )
    dseq = residue_idx[:, None, :] - residue_idx[:, :, None]
    succ = same_chain & (dseq == 1)  # (b, i, j): j is i's chain successor
    succ_idx = jnp.argmax(succ, axis=2)  # (b, L) — j for each i (or 0)
    has_succ = succ.any(axis=2)
    gm_j = jnp.take_along_axis(gm, succ_idx, axis=1)
    edge = has_succ & (gm | gm_j)  # edges touching a designed residue

    # split each constraint's correction between its movable endpoints
    def _shares(g_a, g_b):
        wa = g_a.astype(jnp.float32)
        wb = g_b.astype(jnp.float32)
        tot = jnp.maximum(wa + wb, 1.0)
        return wa / tot, wb / tot

    w_i, w_j = _shares(gm, gm_j)

    # non-bonded designed pairs (the clash gate's pair set)
    bonded_or_self = same_chain & (jnp.abs(dseq) <= 1)
    nonbonded = (rm[:, :, None] & rm[:, None, :]) & ~bonded_or_self
    pair_active = nonbonded & (gm[:, :, None] | gm[:, None, :])
    # row i's share of each (i, j) pair correction
    w_pair, _ = _shares(gm[:, :, None], gm[:, None, :])

    gate_lo = _GATE_CA_RANGE[0] / coord_scale
    gate_hi = _GATE_CA_RANGE[1] / coord_scale
    lo = RELAX_CA_RANGE[0] / coord_scale
    hi = RELAX_CA_RANGE[1] / coord_scale
    clash_gate = _GATE_CLASH / coord_scale
    clash_target = RELAX_CLASH_TARGET / coord_scale
    b_idx = jnp.arange(x.shape[0])[:, None]

    # ---- chord-initialization pre-pass -------------------------------
    # A designed run whose geometry is EXTREME (any edge beyond 2x the
    # window — scattered output from an undertrained model, or a torn
    # loop) converges too slowly under local projection, and a run whose
    # anchors sit near full stretch (span ~ n_edges * 4.3 A) converges
    # asymptotically because neighboring edge corrections fight.  In both
    # cases the constrained optimum is (near) the straight anchor-anchor
    # chord with even spacing — so place such runs there directly and let
    # the iterative pass polish.  Runs with only small violations keep
    # their sampled shape (the common trained-model case).
    ctx = rm & ~gm
    ri_f = residue_idx.astype(jnp.float32)
    big = jnp.float32(1e9)
    prev_cand = same_chain & ctx[:, None, :] & (dseq < 0)  # j before i
    next_cand = same_chain & ctx[:, None, :] & (dseq > 0)  # j after i
    prev_idx = jnp.argmax(
        jnp.where(prev_cand, ri_f[:, None, :], -big), axis=2
    )
    next_idx = jnp.argmin(
        jnp.where(next_cand, ri_f[:, None, :], big), axis=2
    )
    has_anchors = prev_cand.any(axis=2) & next_cand.any(axis=2)
    # run key: a designed residue belongs to the run of its previous
    # context anchor; a context residue anchors its own run
    key = jnp.where(gm, prev_idx, jnp.arange(x.shape[1])[None, :])
    # per-edge run key (the designed endpoint's), then per-run extremeness
    edge_key = jnp.where(gm, key, jnp.take_along_axis(key, succ_idx, axis=1))
    xj0 = jnp.take_along_axis(x, succ_idx[..., None], axis=1)
    elen = jnp.sqrt(jnp.sum((xj0 - x) ** 2, axis=-1) + 1e-12)
    extreme_edge = edge & (elen > 2.0 * gate_hi)
    # run_extreme[r] = any extreme edge with that residue's run key
    same_key = key[:, :, None] == edge_key[:, None, :]
    run_extreme = (same_key & extreme_edge[:, None, :]).any(axis=2)

    takes = lambda a, idx: jnp.take_along_axis(a, idx[..., None], axis=1)
    ri_prev = jnp.take_along_axis(ri_f, prev_idx, axis=1)
    ri_next = jnp.take_along_axis(ri_f, next_idx, axis=1)
    frac = (ri_f - ri_prev) / jnp.maximum(ri_next - ri_prev, 1.0)
    chord = takes(x, prev_idx) + frac[..., None] * (
        takes(x, next_idx) - takes(x, prev_idx)
    )
    x = jnp.where(
        (gm & has_anchors & run_extreme)[..., None], chord, x
    )

    def body(_, x):
        # chain continuity: project violating successor edges to the
        # inner window
        xj = jnp.take_along_axis(x, succ_idx[..., None], axis=1)
        dvec = xj - x
        d = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1) + 1e-12)
        viol = edge & ((d < gate_lo) | (d > gate_hi))
        target = jnp.clip(d, lo, hi)
        # delta points the way J must move to make the edge length = target
        delta = ((target - d) / d)[..., None] * dvec * viol[..., None]
        upd = -delta * w_i[..., None]  # i takes its share, opposite sign
        upd = upd.at[b_idx, succ_idx].add(delta * w_j[..., None])

        # clash repulsion: push violating non-bonded pairs apart.  Each
        # (i, j) ordered pair contributes row i's share; the (j, i) mirror
        # handles j — no scatter needed.
        diff = x[:, :, None, :] - x[:, None, :, :]
        pd = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        cviol = pair_active & (pd < clash_gate)
        push = ((clash_target - pd) / pd)[..., None] * diff  # moves i out
        upd = upd + jnp.sum(
            push * (cviol[..., None] * w_pair[..., None]), axis=2
        )
        return x + damping * upd

    x = jax.lax.fori_loop(0, n_iters, body, x)
    return jnp.where(gm[..., None], x.astype(x0.dtype), x0)
