"""Designed-CA continuity relaxation (structure/relax.py): the loop-closure
pass cli.sample ships by default.

Contracts pinned here:
  * valid geometry is a fixed point (native patches pass through unchanged);
  * context residues NEVER move, designed residues repair stretched or
    compressed chain edges into the validity window;
  * composes with the peptide-bond idealization inside
    evaluation.validity_from_result (relax=True) — a corrupted design that
    fails the raw gate passes the shipped gate;
  * jit-compatible (it runs inside the fused quality-eval program).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.evaluation.metrics import (
    CA_CA_RANGE, backbone_validity, validity_from_result,
)
from diffab_pytorch_tpu.structure.relax import relax_ca

L = 16


def _chain_batch():
    """One straight chain: residues 3.8 A apart, middle 6 designed."""
    x = np.zeros((1, L, 3), np.float32)
    x[0, :, 0] = np.arange(L) * 3.8
    rm = np.ones((1, L), bool)
    ci = np.zeros((1, L), np.int32)
    ri = np.arange(L, dtype=np.int32)[None]
    gm = np.zeros((1, L), bool)
    gm[0, 5:11] = True
    return (jnp.asarray(x), jnp.asarray(rm), jnp.asarray(ci),
            jnp.asarray(ri), jnp.asarray(gm))


def _ca_dists(x):
    x = np.asarray(x)[0]
    return np.linalg.norm(np.diff(x, axis=0), axis=-1)


class TestRelaxCA:
    def test_valid_geometry_is_fixed_point(self):
        x, rm, ci, ri, gm = _chain_batch()
        out = relax_ca(x, rm, ci, ri, gm)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_context_never_moves(self):
        x, rm, ci, ri, gm = _chain_batch()
        x = x.at[0, 7, 1].add(5.0)  # break the loop interior
        out = relax_ca(x, rm, ci, ri, gm)
        ctx = ~np.asarray(gm)[0]
        np.testing.assert_array_equal(
            np.asarray(out)[0][ctx], np.asarray(x)[0][ctx]
        )

    @pytest.mark.parametrize("kind", ["stretch", "compress", "anchor"])
    def test_breaks_repaired(self, kind):
        x, rm, ci, ri, gm = _chain_batch()
        if kind == "stretch":
            x = x.at[0, 7, 1].add(4.0)  # both edges of 7 stretched
        elif kind == "compress":
            x = x.at[0, 8, 0].add(-3.0)  # edge 7-8 compressed to 0.8 A
        else:  # anchor: designed residue 5 pulled away from context 4
            x = x.at[0, 5, 2].add(6.0)
        assert ((_ca_dists(x)[4:11] < CA_CA_RANGE[0])
                | (_ca_dists(x)[4:11] > CA_CA_RANGE[1])).any()
        out = relax_ca(x, rm, ci, ri, gm)
        d = _ca_dists(out)[4:11]  # all edges touching the designed span
        assert (d > CA_CA_RANGE[0]).all() and (d < CA_CA_RANGE[1]).all(), d

    def test_respects_chain_and_patch_order(self):
        """Patch rows are k-NN selections: adjacency must follow
        (chain_idx, residue_idx), not row order.  Rows here are shuffled
        and split across two chains."""
        rng = np.random.default_rng(0)
        perm = rng.permutation(L)
        x, rm, ci, ri, gm = _chain_batch()
        ci = ci.at[0, 8:].set(1)  # two chains -> no edge between 7 and 8
        x_np = np.asarray(x)[:, perm]
        out = relax_ca(
            jnp.asarray(x_np), rm[:, perm], ci[:, perm], ri[:, perm],
            gm[:, perm],
        )
        # unbroken input stays a fixed point under permutation + chains
        np.testing.assert_array_equal(np.asarray(out), x_np)

    def test_scale_parameter(self):
        """Thresholds are in angstroms; coordinates in model units."""
        s = 10.0
        x, rm, ci, ri, gm = _chain_batch()
        x_scaled = x / s
        broken = x_scaled.at[0, 7, 1].add(4.0 / s)
        out = relax_ca(broken, rm, ci, ri, gm, coord_scale=s)
        d = _ca_dists(out)[4:11] * s
        assert (d > CA_CA_RANGE[0]).all() and (d < CA_CA_RANGE[1]).all()

    def test_jit_compatible(self):
        x, rm, ci, ri, gm = _chain_batch()
        x = x.at[0, 7, 1].add(4.0)
        eager = relax_ca(x, rm, ci, ri, gm)
        jitted = jax.jit(relax_ca)(x, rm, ci, ri, gm)
        np.testing.assert_allclose(
            np.asarray(eager), np.asarray(jitted), atol=1e-6
        )


class TestShippedGate:
    """relax + idealize = the cli.sample default pipeline, mirrored in-jit
    by validity_from_result(relax=True, idealize=True)."""

    @pytest.fixture(scope="class")
    def batch(self):
        import os

        from diffab_pytorch_tpu.data.dataset import assemble_batch
        from diffab_pytorch_tpu.structure import antibody, patch
        from diffab_pytorch_tpu.structure.pdb import parse_pdb_file

        fixture = os.path.join(
            os.path.dirname(__file__), "fixtures", "ab1_chothia.pdb"
        )
        chains = parse_pdb_file(fixture, prefer_native=False)
        complex_ = antibody.from_chains(
            chains, "H", "L", ["A"], keep_fv_only=True
        )
        sample = patch.featurize_patch(complex_, patch_size=128)
        return assemble_batch([sample], cdrs_to_generate=("H3",))[0]

    def test_torn_anchor_passes_shipped_gate(self, batch):
        """A design whose loop tore off its anchor fails the raw gate and
        passes after relax + idealize."""
        from diffab_pytorch_tpu.data.dataset import COORD_SCALE
        from diffab_pytorch_tpu.sampling.sampler import SampleResult

        gen = np.asarray(batch.generation_mask[0] & batch.residue_mask[0])
        t = np.asarray(batch.translations).copy()
        # rigid shift of the designed loop: tears both anchor edges
        t[0][gen] += np.array([6.0, 0, 0], np.float32) / COORD_SCALE
        res = SampleResult(
            seq_idx=batch.seq_idx, translations=jnp.asarray(t),
            orientations=batch.orientations,
        )
        raw = validity_from_result(res, batch, coord_scale=COORD_SCALE)
        shipped = validity_from_result(
            res, batch, coord_scale=COORD_SCALE, idealize=True, relax=True
        )
        assert not bool(np.asarray(raw["valid"])[0])
        assert bool(np.asarray(shipped["valid"])[0]), {
            k: np.asarray(v) for k, v in shipped.items()
        }

    def test_native_passes_both_gates(self, batch):
        from diffab_pytorch_tpu.data.dataset import COORD_SCALE
        from diffab_pytorch_tpu.sampling.sampler import SampleResult

        res = SampleResult(
            seq_idx=batch.seq_idx, translations=batch.translations,
            orientations=batch.orientations,
        )
        raw = validity_from_result(res, batch, coord_scale=COORD_SCALE)
        shipped = validity_from_result(
            res, batch, coord_scale=COORD_SCALE, idealize=True, relax=True
        )
        assert bool(np.asarray(raw["valid"])[0])
        assert bool(np.asarray(shipped["valid"])[0])
