"""The learnable family corpus (data/synthetic.py): the invariants that make
trained-quality evaluation meaningful — H3 sequence is a deterministic
function of family (recoverable from the framework barcode), H3 conformation
separates families by much more than the intra-family jitter, and the whole
corpus flows through the real preprocess pipeline."""

import dataclasses
import os

import numpy as np
import pytest

from diffab_pytorch_tpu.constants import AA_THREE, CHOTHIA_CDR_RANGES
from diffab_pytorch_tpu.data.synthetic import (
    family_h3_motif,
    make_family_pdb,
    write_family_corpus,
)
from diffab_pytorch_tpu.structure import antibody


def _parse(tmp_path, fam, seed):
    p = tmp_path / f"f{fam}_{seed}.pdb"
    p.write_text(make_family_pdb(fam, seed))
    return antibody.from_pdb(
        str(p), heavy_chain_id="H", light_chain_id="L", antigen_chain_ids=["A"]
    )


def test_h3_sequence_is_family_determined(tmp_path):
    for fam in (0, 5):
        seqs = []
        for seed in (0, 1, 2):
            c = _parse(tmp_path, fam, seed)
            h3 = c.get_cdr_mask(["H3"])
            seqs.append([AA_THREE[i] for i in c.seq_idx[h3]])
        assert seqs[0] == seqs[1] == seqs[2] == family_h3_motif(fam)


def test_families_distinct_in_sequence_and_structure(tmp_path):
    c0 = _parse(tmp_path, 0, 0)
    c7 = _parse(tmp_path, 7, 0)
    h3_0 = c0.get_cdr_mask(["H3"])
    h3_7 = c7.get_cdr_mask(["H3"])
    assert list(c0.seq_idx[h3_0]) != list(c7.seq_idx[h3_7])

    # H3 CA geometry differs across families by angstroms (the family
    # bump), intra-family only by the jitter scale.  Each sample carries a
    # random global rotation, so compare after Kabsch superposition on the
    # non-CDR heavy-chain framework (evaluation.kabsch).
    def h3_rmsd(ca, cb):
        from diffab_pytorch_tpu.evaluation import aligned_ca_rmsd

        h3 = ca.get_cdr_mask(["H3"])
        fw = (ca.chain_idx == 1) & (ca.cdr_idx == 0)
        return float(
            aligned_ca_rmsd(
                ca.xyz[None, :, 1, :], cb.xyz[None, :, 1, :],
                h3[None], fw[None],
            )[0]
        )

    c0b = _parse(tmp_path, 0, 1)
    d_between = h3_rmsd(c0, c7)
    d_within = h3_rmsd(c0, c0b)
    assert d_between > 1.5
    assert d_within < 0.5
    assert d_between > 4 * d_within


def test_barcode_identifies_family(tmp_path):
    """The context flanks (Chothia 88-94, 103-109) differ across families —
    the information channel a trained model uses to recover the motif."""
    lo, hi = CHOTHIA_CDR_RANGES["H3"]
    flank = lambda c: [
        int(s)
        for s, r, ch in zip(c.seq_idx, c.residue_number, c.chain_idx)
        if ch == 1 and (88 <= r <= 94 or 103 <= r <= 109)
    ]
    c0 = _parse(tmp_path, 0, 0)
    c3 = _parse(tmp_path, 3, 0)
    assert flank(c0) != flank(c3)
    assert flank(c0) == flank(_parse(tmp_path, 0, 5))


@pytest.mark.slow
def test_corpus_flows_through_preprocess(tmp_path):
    from diffab_pytorch_tpu.cli import preprocess

    meta = write_family_corpus(str(tmp_path), n_families=2, n_per_family=2)
    out = tmp_path / "npz"
    rc = preprocess.main([
        "--meta", meta, "--data-dir", str(tmp_path / "pdb"),
        "--out-dir", str(out), "-j", "1",
    ])
    assert rc == 0
    assert len(list(out.glob("*.npz"))) == 4


def test_pallas_auto_gate_resolves_by_backend():
    """use_pallas_attention=None means auto: off on the CPU backend (same
    params, same outputs as the explicit-False config)."""
    import jax
    import jax.numpy as jnp

    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.models.ipa import InvariantPointAttentionLayer

    assert jax.default_backend() == "cpu"
    cfg_auto = ModelConfig(
        d_residue_emb=16, d_pair_emb=8, n_head=2, d_scalar_per_head=4,
        n_query_point_per_head=2, n_value_point_per_head=2,
    )
    assert cfg_auto.use_pallas_attention is None
    cfg_off = dataclasses.replace(cfg_auto, use_pallas_attention=False)

    b, L = 1, 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, L, 16))
    pair = jax.random.normal(key, (b, L, L, 8))
    rot = jnp.broadcast_to(jnp.eye(3), (b, L, 3, 3))
    trans = jax.random.normal(key, (b, L, 3))

    layer_auto = InvariantPointAttentionLayer(cfg_auto)
    layer_off = InvariantPointAttentionLayer(cfg_off)
    params = layer_auto.init(key, x, pair, rot, trans)
    out_auto = layer_auto.apply(params, x, pair, rot, trans)
    out_off = layer_off.apply(params, x, pair, rot, trans)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_off))


# ---------------------------------------------------------------------------
# Compositional corpus (VERDICT weak #5): the properties that make held-out-
# combination evaluation a real generalization probe.


def test_combo_motif_is_per_slot_local():
    """H3 position k depends ONLY on slot k mod N_SLOTS: combos agreeing on
    slot j agree exactly on positions k = j mod m and (for differing other
    slots) differ elsewhere."""
    from diffab_pytorch_tpu.data.synthetic import (
        N_SLOTS, combo_h3_motif,
    )

    a = combo_h3_motif((0, 1, 2, 3))
    b = combo_h3_motif((0, 3, 2, 1))  # shares slots 0 and 2
    for k in range(len(a)):
        j = k % N_SLOTS
        if j in (0, 2):
            assert a[k] == b[k], k
        else:
            assert a[k] != b[k], k


def test_split_combos_coverage_and_disjointness():
    from diffab_pytorch_tpu.data.synthetic import N_SLOTS, split_combos

    train, heldout = split_combos(4, 40, 12, seed=0)
    assert len(train) == 40 and len(heldout) == 12
    assert not set(train) & set(heldout)
    seen = {(j, v) for c in train for j, v in enumerate(c)}
    assert len(seen) == N_SLOTS * 4  # every (slot, value) answerable


def test_combo_barcode_expresses_each_slot(tmp_path):
    """Changing one slot changes ONLY that slot's framework positions (and
    the H3 positions it governs): the information channel is per-slot."""
    from diffab_pytorch_tpu.data.synthetic import (
        _SLOT_POSITIONS, make_combo_pdb,
    )

    def parse(combo, name):
        p = tmp_path / f"{name}.pdb"
        p.write_text(make_combo_pdb(combo, seed=0))
        return antibody.from_pdb(
            str(p), heavy_chain_id="H", light_chain_id="L",
            antigen_chain_ids=["A"],
        )

    c_a = parse((1, 2, 0, 3), "a")
    c_b = parse((1, 2, 3, 3), "b")  # slot 2 differs

    def heavy_seq_at(c, positions):
        out = {}
        for s, r, ch in zip(c.seq_idx, c.residue_number, c.chain_idx):
            if ch == 1 and r in positions:
                out.setdefault(r, int(s))
        return out

    all_barcode = [p for ps in _SLOT_POSITIONS for p in ps]
    sa, sb = heavy_seq_at(c_a, all_barcode), heavy_seq_at(c_b, all_barcode)
    for j, positions in enumerate(_SLOT_POSITIONS):
        for p in positions:
            if j == 2:
                assert sa[p] != sb[p], (j, p)
            else:
                assert sa[p] == sb[p], (j, p)


def test_combo_pdb_is_stereochemically_valid(tmp_path):
    """The compositional loop bump must not break the backbone the validity
    gate scores — otherwise trained RMSD numbers would be on broken data."""
    from diffab_pytorch_tpu.constants import ATOM
    from diffab_pytorch_tpu.data.synthetic import make_combo_pdb
    from diffab_pytorch_tpu.evaluation import backbone_validity

    p = tmp_path / "v.pdb"
    p.write_text(make_combo_pdb((3, 3, 3, 3), seed=0))  # max amplitude
    c = antibody.from_pdb(
        str(p), heavy_chain_id="H", light_chain_id="L",
        antigen_chain_ids=["A"],
    )
    gen = c.get_cdr_mask(["H3"])
    val = backbone_validity(
        c.xyz[None, :, ATOM.N, :], c.xyz[None, :, ATOM.CA, :],
        c.xyz[None, :, ATOM.C, :],
        c.atom_mask[None, :, :3].all(-1), c.chain_idx[None],
        c.residue_idx[None], gen[None],
    )
    assert int(val["bond_viol"][0]) == 0
    assert int(val["ca_break"][0]) == 0


def test_multicdr_combo_default_unchanged():
    """cdr_loops defaults to ("H3",) and reproduces the original corpus
    byte-for-byte — existing runs and their preprocessed caches stay
    valid."""
    from diffab_pytorch_tpu.data.synthetic import make_combo_pdb

    a = make_combo_pdb((1, 0, 3, 2), seed=7)
    b = make_combo_pdb((1, 0, 3, 2), seed=7, cdr_loops=("H3",))
    assert a == b


def test_multicdr_combo_loops_are_slot_driven(tmp_path):
    """With cdr_loops=(H1,H2,H3): each loop's sequence follows the per-slot
    rule with its own offset (loops differ from each other), and changing
    one slot moves every loop's governed positions in sequence AND
    displaces each loop's conformation."""
    from diffab_pytorch_tpu.data.synthetic import (
        CDR_LOOP_RANGES, N_SLOTS, combo_loop_motif, make_combo_pdb,
    )

    loops = ("H1", "H2", "H3")
    # per-slot locality of every loop's motif
    a = combo_loop_motif((0, 1, 2, 3), "H1")
    b = combo_loop_motif((0, 3, 2, 1), "H1")
    for k in range(len(a)):
        assert (a[k] == b[k]) == ((k % N_SLOTS) in (0, 2)), k
    # distinct motifs across loops at shared positions
    m = {lp: combo_loop_motif((1, 2, 3, 0), lp) for lp in loops}
    assert m["H1"][:5] != m["H2"][:5]
    assert m["H1"][:7] != m["H3"][:7]

    def parse(combo, name):
        p = tmp_path / f"{name}.pdb"
        p.write_text(make_combo_pdb(combo, seed=0, cdr_loops=loops))
        return antibody.from_pdb(
            str(p), heavy_chain_id="H", light_chain_id="L",
            antigen_chain_ids=["A"],
        )

    c_a = parse((1, 2, 0, 3), "ma")
    c_b = parse((1, 2, 3, 3), "mb")  # slot 2 differs

    from diffab_pytorch_tpu.constants import ATOM
    for loop in loops:
        lo, hi = CDR_LOOP_RANGES[loop]
        in_loop_a = (c_a.chain_idx == 1) & (c_a.residue_number >= lo) \
            & (c_a.residue_number <= hi)
        in_loop_b = (c_b.chain_idx == 1) & (c_b.residue_number >= lo) \
            & (c_b.residue_number <= hi)
        # slot 2 governs positions k = 2 mod 4 of every loop: sequences differ
        assert (np.asarray(c_a.seq_idx)[in_loop_a]
                != np.asarray(c_b.seq_idx)[in_loop_b]).any(), loop
        # conformation displaced (poses are random: compare loop shape in a
        # loop-local frame via pairwise distances to the loop start)
        xa = np.asarray(c_a.xyz)[in_loop_a, ATOM.CA]
        xb = np.asarray(c_b.xyz)[in_loop_b, ATOM.CA]
        da = np.linalg.norm(xa - xa[0], axis=-1)
        db_ = np.linalg.norm(xb - xb[0], axis=-1)
        assert np.abs(da - db_).max() > 0.05, loop


def test_multicdr_combo_pdb_is_stereochemically_valid(tmp_path):
    """Max-amplitude displacements on ALL THREE loops keep the backbone
    inside the validity gate (joint-design training data must be clean)."""
    from diffab_pytorch_tpu.constants import ATOM
    from diffab_pytorch_tpu.data.synthetic import make_combo_pdb
    from diffab_pytorch_tpu.evaluation import backbone_validity

    p = tmp_path / "mv.pdb"
    p.write_text(make_combo_pdb((3, 3, 3, 3), seed=0,
                                cdr_loops=("H1", "H2", "H3")))
    c = antibody.from_pdb(
        str(p), heavy_chain_id="H", light_chain_id="L",
        antigen_chain_ids=["A"],
    )
    gen = c.get_cdr_mask(["H1", "H2", "H3"])
    val = backbone_validity(
        c.xyz[None, :, ATOM.N, :], c.xyz[None, :, ATOM.CA, :],
        c.xyz[None, :, ATOM.C, :],
        c.atom_mask[None, :, :3].all(-1), c.chain_idx[None],
        c.residue_idx[None], gen[None],
    )
    assert int(val["bond_viol"][0]) == 0
    assert int(val["ca_break"][0]) == 0


def test_combo_corpus_manifest(tmp_path):
    from diffab_pytorch_tpu.data.synthetic import write_combo_corpus

    man = write_combo_corpus(
        str(tmp_path), n_values=3, n_train_combos=12, n_heldout_combos=4,
        n_per_combo=2, n_val_instances=1,
    )
    pdbs = os.listdir(tmp_path / "pdb")
    assert len(pdbs) == 12 * 2 + 4 * 1
    assert os.path.exists(tmp_path / "combos.json")
    assert len(man["train_combos"]) == 12
    held = {tuple(c) for c in man["heldout_combos"]}
    assert not held & {tuple(c) for c in man["train_combos"]}


def test_seq_degeneracy_default_byte_identical():
    """seq_degeneracy=1 consumes no extra randomness: existing corpora
    reproduce byte-for-byte."""
    from diffab_pytorch_tpu.data.synthetic import make_combo_pdb

    combo = (1, 0, 2, 3)
    assert make_combo_pdb(combo, seed=7) == make_combo_pdb(
        combo, seed=7, seq_degeneracy=1
    )


def test_seq_degeneracy_options_and_structure():
    """d=2: loop residues stay inside the valid option set, vary across
    instances, non-loop sequence is untouched, and the conformation is
    option-independent (same CA positions as d=1 modulo nothing — the
    choices only touch identities)."""
    import numpy as np

    from diffab_pytorch_tpu.data.synthetic import (
        CDR_LOOP_RANGES, loop_motif_index_options, make_combo_pdb,
    )
    from diffab_pytorch_tpu.structure.pdb import parse_pdb

    combo, d = (2, 1, 0, 3), 2
    options = loop_motif_index_options(combo, "H3", d)
    lo, hi = CDR_LOOP_RANGES["H3"]
    assert all(len(set(o)) == d for o in options)

    loop_ids = []
    for seed in range(6):
        chains = parse_pdb(make_combo_pdb(combo, seed=seed, seq_degeneracy=d))
        ids = [r.aa_index for r in chains["H"] if lo <= r.resseq <= hi]
        assert len(ids) == hi - lo + 1
        for j, a in enumerate(ids):
            assert a in options[j]
        loop_ids.append(tuple(ids))
    assert len(set(loop_ids)) > 1  # instances draw different options

    # structure rides only on the slots: the choices only touch residue
    # identities, so loop CA geometry STATISTICS (anchor-to-anchor span)
    # agree between d=1 and d=2 to the jitter scale (the rng stream
    # differs by the choice draw, so exact coords need not match)
    def loop_span(text):
        chains = parse_pdb(text)
        cas = np.array([
            r.xyz[1] for r in chains["H"] if lo <= r.resseq <= hi
        ])
        return np.linalg.norm(cas[0] - cas[-1])

    s1 = loop_span(make_combo_pdb(combo, seed=1))
    s2 = loop_span(make_combo_pdb(combo, seed=1, seq_degeneracy=d))
    assert abs(s1 - s2) < 1.0

    import pytest

    with pytest.raises(ValueError, match="seq_degeneracy"):
        make_combo_pdb(combo, seed=0, seq_degeneracy=9)


def test_decoupled_shape_corpus():
    """Round-4 attribution corpus (data/synthetic.py shape_combo): loop
    conformations ride ONLY on the shape barcode, sequences ONLY on the
    sequence barcode, and the shape barcode is expressed in its own
    framework positions — so conditioned geometry carries zero information
    about the sequence rule."""
    import numpy as np

    from diffab_pytorch_tpu.data.synthetic import (
        CDR_LOOP_RANGES, _SHAPE_SLOT_POSITIONS, make_combo_pdb,
    )
    from diffab_pytorch_tpu.structure.pdb import parse_pdb

    loops = ("H1", "H2", "H3")
    combo, combo2 = (1, 0, 3, 2), (2, 3, 0, 1)
    lo, hi = CDR_LOOP_RANGES["H3"]

    # default path byte-identical (existing corpora unaffected)
    assert make_combo_pdb(combo, seed=7, cdr_loops=loops) == make_combo_pdb(
        combo, seed=7, cdr_loops=loops, shape_combo=None
    )

    def h3_cas(text):
        chains = parse_pdb(text)
        return np.array([r.xyz[1] for r in chains["H"]
                         if lo <= r.resseq <= hi])

    def shape_slot_ids(text):
        chains = parse_pdb(text)
        pos = [p for tri in _SHAPE_SLOT_POSITIONS for p in tri]
        return [r.aa_index for r in chains["H"] if r.resseq in pos]

    def loop_ids(text):
        chains = parse_pdb(text)
        return [r.aa_index for r in chains["H"] if lo <= r.resseq <= hi]

    # same seq combo + seed, different shape barcodes: conformation moves,
    # the loop sequence does not, the shape barcode is visible in sequence
    a = make_combo_pdb(combo, seed=3, cdr_loops=loops,
                       shape_combo=(0, 0, 0, 0))
    b = make_combo_pdb(combo, seed=3, cdr_loops=loops,
                       shape_combo=(3, 3, 3, 3))
    assert np.abs(h3_cas(a) - h3_cas(b)).max() > 0.5
    assert loop_ids(a) == loop_ids(b)
    assert shape_slot_ids(a) != shape_slot_ids(b)  # barcode is visible

    # The rotation-invariant loop deviation profile (jitter off, so the
    # only remaining rng effect — the global rotation — cancels in the
    # norms): a decoupled corpus with shape barcode S has EXACTLY the
    # tied corpus's conformation for combo S, for ANY seq combo — i.e.
    # conformation is a function of the shape barcode alone.
    def chord_dev(text):
        cas = h3_cas(text)
        t = np.linspace(0.0, 1.0, len(cas))[:, None]
        chord = cas[0] * (1 - t) + cas[-1] * t
        return np.linalg.norm(cas - chord, axis=1)

    for shape in ((0, 0, 0, 0), (3, 3, 3, 3), (2, 0, 3, 1)):
        tied = chord_dev(make_combo_pdb(shape, seed=3, cdr_loops=loops,
                                        jitter=0.0))
        for seq_combo in (combo, combo2):
            dec = chord_dev(make_combo_pdb(seq_combo, seed=3,
                                           cdr_loops=loops,
                                           shape_combo=shape, jitter=0.0))
            # atol: PDB format rounds coords to 1e-3 under different
            # global rotations, so the invariant norms inherit ~1e-3
            np.testing.assert_allclose(dec, tied, atol=2e-3)
    # and the shape signal is real: the two extreme shapes separate
    d0 = chord_dev(make_combo_pdb(combo, seed=3, cdr_loops=loops,
                                  shape_combo=(0, 0, 0, 0), jitter=0.0))
    d3 = chord_dev(make_combo_pdb(combo, seed=3, cdr_loops=loops,
                                  shape_combo=(3, 3, 3, 3), jitter=0.0))
    assert np.abs(d0 - d3).max() > 0.1

    # sequences ride only on the seq barcode
    c = make_combo_pdb(combo2, seed=3, cdr_loops=loops,
                       shape_combo=(3, 3, 3, 3))
    assert loop_ids(b) != loop_ids(c)
    assert shape_slot_ids(b) == shape_slot_ids(c)


def test_decoupled_shape_corpus_manifest(tmp_path):
    """write_combo_corpus(decouple_shape=True) records the flag and draws
    per-instance shape barcodes (instances of one combo differ in
    conformation)."""
    import json

    import numpy as np

    from diffab_pytorch_tpu.data.synthetic import (
        CDR_LOOP_RANGES, write_combo_corpus,
    )
    from diffab_pytorch_tpu.structure.pdb import parse_pdb

    out = str(tmp_path / "corpus")
    m = write_combo_corpus(
        out, n_values=2, n_train_combos=6, n_heldout_combos=2,
        n_per_combo=3, n_val_instances=1, cdr_loops=("H1", "H2", "H3"),
        decouple_shape=True,
    )
    assert m["decouple_shape"] is True
    assert json.load(open(f"{out}/combos.json"))["decouple_shape"] is True

    lo, hi = CDR_LOOP_RANGES["H3"]

    def chord_dev(path):
        chains = parse_pdb(open(path).read())
        cas = np.array([r.xyz[1] for r in chains["H"]
                        if lo <= r.resseq <= hi])
        t = np.linspace(0.0, 1.0, len(cas))[:, None]
        chord = cas[0] * (1 - t) + cas[-1] * t
        return np.linalg.norm(cas - chord, axis=1)

    devs = [chord_dev(f"{out}/pdb/c0_s{i}.pdb") for i in range(3)]
    spread = max(
        np.abs(devs[i] - devs[j]).max()
        for i in range(3) for j in range(i + 1, 3)
    )
    assert spread > 0.3, "per-instance shape barcodes should vary"
