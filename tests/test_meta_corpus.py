"""The SAbDab-inventory-shaped corpus generator (round-5 dress rehearsal).

data/synthetic.py write_meta_shaped_corpus must preserve each meta.csv
row's chain composition exactly (multi-Fv files, multi-chain antigens,
absent heavy/light), reproduce byte-identically across processes (crc32
seeding, not salted hash()), and produce patches the bulk preprocessor
accepts.  The full 8,400-row sweep is measured in
runs/r5_dress/gen_preprocess.log (0 skips, 192 s); this pins the
semantics on a 60-row slice.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from diffab_pytorch_tpu.data.synthetic import write_meta_shaped_corpus

META = "/root/reference/data/meta.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(META), reason="reference meta.csv not present"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("meta_corpus")
    man = write_meta_shaped_corpus(
        str(out), META, n_heldout_targets=2, limit=60
    )
    return out, man


def test_row_chain_composition_preserved(corpus):
    out, man = corpus
    meta = pd.read_csv(META).iloc[:60]
    ours = pd.read_csv(os.path.join(out, "meta.csv"))
    assert len(ours) == 60
    for (_, a), (_, b) in zip(meta.iterrows(), ours.iterrows()):
        assert a.pdb_id == b.pdb_id
        for col in ("Hchain", "Lchain"):
            av, bv = a[col], b[col]
            assert (pd.isna(av) and pd.isna(bv)) or av == bv, (col, av, bv)
        aa = "" if pd.isna(a.antigen_chain) else a.antigen_chain
        bb = "" if pd.isna(b.antigen_chain) else b.antigen_chain
        assert aa == bb


def test_chains_present_in_pdb(corpus):
    out, man = corpus
    meta = pd.read_csv(META).iloc[:60]
    for rec in meta.itertuples():
        path = os.path.join(out, "pdb", f"{rec.pdb_id}.pdb")
        assert os.path.exists(path), rec.pdb_id
        chain_ids = {ln[21] for ln in open(path) if ln.startswith("ATOM")}
        want = set()
        for v in (rec.Hchain, rec.Lchain):
            if isinstance(v, str):
                want.add(v)
        if isinstance(rec.antigen_chain, str):
            want.update(c.strip() for c in rec.antigen_chain.split("|"))
        assert want <= chain_ids, (rec.pdb_id, want, chain_ids)


def test_reproducible_across_calls(corpus, tmp_path):
    out, man = corpus
    man2 = write_meta_shaped_corpus(
        str(tmp_path), META, n_heldout_targets=2, limit=60
    )
    assert man["heldout_pdbs"] == man2["heldout_pdbs"]
    # a multi-Fv file byte-identical across generations
    some = sorted(man["rows"].values(), key=lambda r: r["pdb_id"])[0]["pdb_id"]
    a = open(os.path.join(out, "pdb", f"{some}.pdb")).read()
    b = open(os.path.join(tmp_path, "pdb", f"{some}.pdb")).read()
    assert a == b


def test_heldout_combos_never_train(corpus):
    out, man = corpus
    heldout = {tuple(c) for c in man["heldout_combos"]}
    for row in man["rows"].values():
        if row["split"] == "train":
            assert tuple(row["combo"]) not in heldout
        elif row["split"] == "heldout":
            assert tuple(row["combo"]) in heldout
        else:
            assert row["combo"] is None  # no_heavy


def test_preprocess_accepts_generated_rows(corpus):
    out, man = corpus
    from diffab_pytorch_tpu.cli.preprocess import process_one

    meta = pd.read_csv(os.path.join(out, "meta.csv"))
    # one ordinary row, one multi-antigen row, one light-less row if present
    take = [0]
    multi = meta.index[meta.antigen_chain.fillna("").str.contains(r"\|")]
    if len(multi):
        take.append(int(multi[0]))
    nol = meta.index[meta.Lchain.isna()]
    if len(nol):
        take.append(int(nol[0]))
    for i in take:
        rec = meta.iloc[i]
        ag = "" if pd.isna(rec.antigen_chain) else "".join(
            c.strip() for c in rec.antigen_chain.split("|")
        )
        npz = os.path.join(out, f"t{i}.npz")
        process_one(
            os.path.join(out, "pdb", f"{rec.pdb_id}.pdb"), npz,
            None if pd.isna(rec.Hchain) else rec.Hchain,
            None if pd.isna(rec.Lchain) else rec.Lchain,
            ag or None, 128,
        )
        d = np.load(npz)
        assert d["seq_idx"].shape == (128,)
        assert d["residue_mask"].sum() > 0
