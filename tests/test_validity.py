"""Stereochemical validity gate (evaluation/metrics.py backbone_validity).

Round-1 VERDICT weak #6: a designed backbone can sit at 0.8 A CA-RMSD on the
scored positions and still be chemically broken between them.  These tests
pin the contract: native geometry passes, corrupted designs fail, and the
checks see through patch row order (k-NN patches are not chain-contiguous).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.constants import ATOM
from diffab_pytorch_tpu.data.dataset import (
    COORD_SCALE,
    assemble_batch,
    generation_mask_from_cdr,
)
from diffab_pytorch_tpu.evaluation import backbone_validity, validity_from_result
from diffab_pytorch_tpu.sampling.sampler import SampleResult
from diffab_pytorch_tpu.structure import antibody, patch
from diffab_pytorch_tpu.structure.pdb import parse_pdb_file

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ab1_chothia.pdb")


@pytest.fixture(scope="module")
def native_sample():
    chains = parse_pdb_file(FIXTURE, prefer_native=False)
    complex_ = antibody.from_chains(chains, "H", "L", ["A"], keep_fv_only=True)
    return patch.featurize_patch(complex_, patch_size=128)


def _validity_args(sample):
    xyz = sample["xyz"].astype(np.float32)
    amask = sample["atom_mask"].astype(bool)
    rm = sample["residue_mask"].astype(bool)
    has_bb = amask[:, ATOM.N] & amask[:, ATOM.CA] & amask[:, ATOM.C]
    gen = generation_mask_from_cdr(sample["cdr_idx"], ["H3"]) & rm
    return (
        xyz[None, :, ATOM.N, :],
        xyz[None, :, ATOM.CA, :],
        xyz[None, :, ATOM.C, :],
        (rm & has_bb)[None],
        sample["chain_idx"][None],
        sample["residue_idx"][None],
        gen[None],
    )


class TestBackboneValidity:
    def test_native_patch_passes(self, native_sample):
        """Real geometry from the fixture: ideal-ish peptide bonds,
        continuous chain, no clashes -> valid."""
        val = backbone_validity(*_validity_args(native_sample))
        assert int(val["bond_viol"][0]) == 0
        assert int(val["ca_break"][0]) == 0
        assert int(val["clash_count"][0]) == 0
        assert bool(val["valid"][0])
        # the max deviation is a real number reflecting real geometry,
        # not a masked-out zero: edges were actually scored
        assert 0.0 < float(val["bond_max_dev"][0]) < 0.25

    def test_translated_loop_fails_bonds(self, native_sample):
        """Rigidly shifting the designed CDR 5 A breaks the anchor bonds
        (and only edges touching designed residues are scored)."""
        args = list(_validity_args(native_sample))
        gen = np.asarray(args[6][0])
        shift = np.where(gen[:, None], 5.0, 0.0).astype(np.float32)
        for i in range(3):  # N, CA, C
            args[i] = args[i] + shift[None]
        val = backbone_validity(*args)
        assert int(val["bond_viol"][0]) >= 2  # both anchor bonds break
        assert not bool(val["valid"][0])

    def test_collapsed_loop_counts_clashes(self, native_sample):
        """Designed CAs piled onto the context centroid clash."""
        args = list(_validity_args(native_sample))
        gen = np.asarray(args[6][0])
        rm = np.asarray(args[3][0])
        ctx_ca = np.asarray(args[1][0])[rm & ~gen]
        centroid = ctx_ca.mean(axis=0)
        ca = np.array(args[1][0])
        ca[gen] = centroid  # all designed CAs at one context-dense point
        args[1] = jnp.asarray(ca)[None]
        val = backbone_validity(*args)
        assert int(val["clash_count"][0]) > 0
        assert not bool(val["valid"][0])

    def test_context_breakage_not_blamed_on_design(self, native_sample):
        """Corrupting a CONTEXT-only region far from the CDR leaves the
        design gate untouched — context geometry is the input's business."""
        args = list(_validity_args(native_sample))
        gen = np.asarray(args[6][0])
        rm = np.asarray(args[3][0])
        # pick context rows not adjacent (by chain/residue numbering) to
        # any designed row: corrupt the light chain (chain_idx differs)
        chain = np.asarray(args[4][0])
        gen_chains = set(np.unique(chain[gen]).tolist())
        target = (rm & ~gen) & ~np.isin(chain, list(gen_chains))
        assert target.any(), "fixture must have a non-designed chain"
        for i in range(3):
            arr = np.array(args[i][0])
            arr[target] += np.float32(7.0)
            args[i] = jnp.asarray(arr)[None]
        val = backbone_validity(*args)
        assert int(val["bond_viol"][0]) == 0
        assert int(val["ca_break"][0]) == 0

    def test_scoring_survives_row_shuffle(self, native_sample):
        """Adjacency comes from (chain_idx, residue_idx), not row order:
        shuffling patch rows must not change any count."""
        args = _validity_args(native_sample)
        base = backbone_validity(*args)
        rng = np.random.default_rng(0)
        perm = rng.permutation(args[0].shape[1])
        shuffled = [jnp.asarray(np.asarray(a[0])[perm])[None] for a in args]
        val = backbone_validity(*shuffled)
        for k in ("bond_viol", "ca_break", "clash_count"):
            assert int(val[k][0]) == int(base[k][0]), k


class TestValidityFromResult:
    def test_identity_result_on_native_batch_passes(self, native_sample):
        """A 'design' that reproduces the native frames exactly must pass
        the gate through the frame->backbone reconstruction path (model
        units + COORD_SCALE)."""
        batch, _ = assemble_batch([native_sample], cdrs_to_generate=("H3",))
        res = SampleResult(
            seq_idx=batch.seq_idx,
            translations=batch.translations,
            orientations=batch.orientations,
        )
        val = validity_from_result(res, batch, coord_scale=COORD_SCALE)
        assert int(val["bond_viol"][0]) == 0
        assert int(val["ca_break"][0]) == 0
        assert bool(val["valid"][0])

    def test_zeroed_design_fails(self, native_sample):
        """Designed translations collapsed to the origin (model units) are
        caught: broken anchors and/or clashes."""
        batch, _ = assemble_batch([native_sample], cdrs_to_generate=("H3",))
        gen = np.asarray(batch.generation_mask & batch.residue_mask)
        t = np.asarray(batch.translations).copy()
        t[gen] = 0.0
        res = SampleResult(
            seq_idx=batch.seq_idx,
            translations=jnp.asarray(t),
            orientations=batch.orientations,
        )
        val = validity_from_result(res, batch, coord_scale=COORD_SCALE)
        assert not bool(val["valid"][0])

    def test_evaluate_designs_carries_validity(self, native_sample):
        from diffab_pytorch_tpu.evaluation import evaluate_designs

        batch, _ = assemble_batch([native_sample], cdrs_to_generate=("H3",))
        res = SampleResult(
            seq_idx=batch.seq_idx,
            translations=batch.translations,
            orientations=batch.orientations,
        )
        out = evaluate_designs(res, batch, coord_scale=COORD_SCALE)
        assert bool(out["valid"][0])
        assert float(out["aar"][0]) == 1.0


class TestIdealization:
    """Designed-edge peptide-bond idealization: the write-time repair
    (structure.reconstruct.idealize_peptide_bonds) and its jit-compatible
    mirror inside validity_from_result(idealize=True)."""

    def _noisy_result(self, native_sample, sigma=0.03):
        """A 'design' = native frames with small orientation/translation
        noise on the designed rows — realistic model residual that breaks
        C-N bonds but not CA continuity."""
        batch, _ = assemble_batch([native_sample], cdrs_to_generate=("H3",))
        rng = np.random.default_rng(0)
        gen = np.asarray(batch.generation_mask & batch.residue_mask)
        t = np.array(batch.translations)
        t[gen] += rng.normal(scale=sigma, size=(gen.sum(), 3))
        return batch, SampleResult(
            seq_idx=batch.seq_idx,
            translations=jnp.asarray(t),
            orientations=batch.orientations,
        )

    def test_idealize_fixes_bonds_keeps_ca(self, native_sample):
        batch, res = self._noisy_result(native_sample)
        raw = validity_from_result(res, batch, coord_scale=COORD_SCALE)
        ideal = validity_from_result(
            res, batch, coord_scale=COORD_SCALE, idealize=True
        )
        # 0.3 A CA noise breaks bonds pre-repair, repair clears them
        assert int(raw["bond_viol"][0]) > 0
        assert int(ideal["bond_viol"][0]) == 0
        assert float(ideal["bond_max_dev"][0]) < 0.02

    def test_numpy_and_jnp_idealization_agree(self, native_sample):
        from diffab_pytorch_tpu.structure.reconstruct import (
            BACKBONE_LOCAL, idealize_peptide_bonds,
        )

        batch, res = self._noisy_result(native_sample)
        gen = np.asarray(batch.generation_mask & batch.residue_mask)[0]
        # rebuild full-atom arrays the way cli.sample does — in ANGSTROMS
        # (the CLI denormalizes before reconstruction; the numpy repair
        # uses the absolute 1.329 A constant)
        o = np.asarray(res.orientations[0])
        t = np.asarray(res.translations[0]) * COORD_SCALE
        local = BACKBONE_LOCAL
        xyz = np.zeros((t.shape[0], 15, 3), np.float32)
        for a in range(4):
            xyz[:, a] = np.einsum("i,lij->lj", local[a], o) + t
        am = np.zeros((t.shape[0], 15), bool)
        am[:, :4] = True
        fixed = idealize_peptide_bonds(
            xyz, am, np.asarray(batch.chain_idx[0]),
            np.asarray(batch.residue_idx[0]), edge_mask=gen,
        )
        # CA untouched everywhere; N moved only where a designed edge ends
        np.testing.assert_array_equal(fixed[:, ATOM.CA], xyz[:, ATOM.CA])
        moved = ~np.isclose(fixed[:, ATOM.N], xyz[:, ATOM.N]).all(-1)
        assert moved.any()
        chain = np.asarray(batch.chain_idx[0])
        ridx = np.asarray(batch.residue_idx[0])
        pred_of = {(int(c), int(r)): i for i, (c, r) in
                   enumerate(zip(chain, ridx))}
        for j in np.nonzero(moved)[0]:
            i = pred_of.get((int(chain[j]), int(ridx[j]) - 1))
            assert i is not None and (gen[i] or gen[j]), j
            d = np.linalg.norm(fixed[j, ATOM.N] - fixed[i, ATOM.C])
            np.testing.assert_allclose(d, 1.329, atol=1e-3)
