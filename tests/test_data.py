"""Data-pipeline tests: preprocess CLI -> .npz patches -> PatchDataset ->
ProteinBatch (the path the reference never connected, SURVEY.md §3.2) —
unlike the reference's tests/test_data.py, none of these are skipped."""

import os

import numpy as np
import pytest

from diffab_pytorch_tpu.cli import preprocess as preprocess_cli
from diffab_pytorch_tpu.data.dataset import (
    COORD_SCALE,
    PatchDataset,
    assemble_batch,
    generation_mask_from_cdr,
)
from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    """Preprocess 4 synthetic complexes through the CLI (single mode)."""
    root = tmp_path_factory.mktemp("data")
    pdb_dir = root / "pdb"
    out_dir = root / "patches"
    pdb_dir.mkdir()
    out_dir.mkdir()
    for i in range(4):
        p = pdb_dir / f"syn{i}.pdb"
        p.write_text(make_synthetic_antibody_pdb(seed=i))
        rc = preprocess_cli.main([
            "-i", str(p), "-o", str(out_dir / f"syn{i}.npz"),
            "--heavy-chain-id", "H", "--light-chain-id", "L",
            "-a", "A", "-k", "96",
        ])
        assert rc == 0
    return str(out_dir)


def test_preprocess_cli_bulk(tmp_path):
    """Bulk mode over a meta.csv, including a bad row that must be skipped
    (--keep-going semantics, reference README.md:36-40)."""
    import pandas as pd

    pdb_dir = tmp_path / "pdb"
    out_dir = tmp_path / "out"
    pdb_dir.mkdir()
    (pdb_dir / "good.pdb").write_text(make_synthetic_antibody_pdb(seed=7))
    (pdb_dir / "bad.pdb").write_text("not a pdb at all\n")
    meta = pd.DataFrame(
        {
            "pdb_id": ["good", "bad", "missing"],
            "Hchain": ["H", "H", "H"],
            "Lchain": ["L", "nan", "L"],
            "antigen_chain": ["A", float("nan"), "A"],
        }
    )
    meta_path = tmp_path / "meta.csv"
    meta.to_csv(meta_path, index=False)
    rc = preprocess_cli.main([
        "--meta", str(meta_path), "--data-dir", str(pdb_dir),
        "--out-dir", str(out_dir), "-j", "2", "-k", "64",
    ])
    assert rc == 0
    files = os.listdir(out_dir)
    assert len(files) == 1 and files[0].startswith("good")


def test_dataset_batches(patch_dir):
    ds = PatchDataset.from_dir(patch_dir, cdrs_to_generate=["H3"])
    assert len(ds) == 4
    batch, info = next(ds.batches(batch_size=2, seed=0, epochs=1))
    assert batch.seq_idx.shape == (2, 96)
    assert batch.xyz.shape == (2, 96, 15, 3)
    # pairwise dihedrals are derived in-model by default
    assert batch.pairwise_dihedrals is None
    assert batch.generation_mask.any()
    # H3 only: 95-102 inclusive = 8 residues per sample
    assert int(batch.generation_mask.sum()) == 2 * 8
    assert info.scale == COORD_SCALE


def test_normalization(patch_dir):
    """Context CA centroid ~ 0 in diffusion space; denormalize round-trips."""
    ds = PatchDataset.from_dir(patch_dir)
    batch, info = next(ds.batches(batch_size=2, seed=0, epochs=1, normalize=True))
    ctx = np.asarray(batch.residue_mask & ~batch.generation_mask)
    ca = np.asarray(batch.translations)
    for b in range(2):
        centroid = ca[b][ctx[b]].mean(axis=0)
        np.testing.assert_allclose(centroid, 0.0, atol=1e-5)
    # typical coordinates are O(1), matching the N(0, I) prior scale
    assert 0.05 < float(np.abs(ca[ctx]).mean()) < 5.0

    raw, _ = next(ds.batches(batch_size=2, seed=0, epochs=1, normalize=False))
    denorm = info.denormalize(ca)
    np.testing.assert_allclose(denorm, np.asarray(raw.translations), atol=1e-4)


def test_all_cdr_modes(patch_dir):
    """One preprocessed dataset serves any cdrs_to_generate subset."""
    ds = PatchDataset.from_dir(patch_dir)
    sample = ds[0]
    for subset, count in [(["H1"], 7), (["L2"], 7), (["H1", "H2", "H3"], 20)]:
        gm = generation_mask_from_cdr(sample["cdr_idx"], subset)
        assert int(gm.sum()) == count, subset
    with pytest.raises(ValueError, match="unknown CDR"):
        generation_mask_from_cdr(sample["cdr_idx"], ["X1"])


def test_assemble_batch_garbage_proofing(patch_dir):
    """Masked atom slots carry exact zeros after assembly (NaN-proofing
    contract with the model layer)."""
    ds = PatchDataset.from_dir(patch_dir)
    batch, _ = assemble_batch([ds[0], ds[1]])
    xyz = np.asarray(batch.xyz)
    mask = np.asarray(batch.atom_mask)
    assert np.all(xyz[~mask] == 0.0)
    assert np.isfinite(xyz).all()


def test_pairwise_dihedrals_device_matches_host(patch_dir):
    """The in-model jnp derivation equals the host numpy featurization."""
    import jax.numpy as jnp

    from diffab_pytorch_tpu.models import pairwise_dihedrals_from_xyz

    ds = PatchDataset.from_dir(patch_dir)
    host_batch, _ = assemble_batch([ds[0], ds[1]], host_pairwise_dihedrals=True)
    derived = np.asarray(
        pairwise_dihedrals_from_xyz(jnp.asarray(host_batch.xyz))
    )
    bb_ok = np.asarray(host_batch.atom_mask)[:, :, :3].all(-1)
    pair_ok = bb_ok[:, :, None] & bb_ok[:, None, :]
    np.testing.assert_allclose(
        derived[pair_ok], np.asarray(host_batch.pairwise_dihedrals)[pair_ok],
        atol=2e-3,
    )


def test_prefetch_loader(patch_dir):
    import jax

    from diffab_pytorch_tpu.data.loader import PrefetchLoader

    ds = PatchDataset.from_dir(patch_dir)
    loader = PrefetchLoader(ds.batches(batch_size=2, epochs=2, seed=1))
    batches = list(loader)
    assert len(batches) == 4  # 4 samples / bsz 2 x 2 epochs
    b0, info = batches[0]
    assert isinstance(b0.xyz, jax.Array)
    assert b0.xyz.shape == (2, 96, 15, 3)


def test_train_step_on_real_pipeline(patch_dir):
    """The preprocessed-data path drives the actual train step (the seam
    that is broken in the reference, SURVEY.md §2.9#3)."""
    import jax

    from diffab_pytorch_tpu.config import tiny_config
    from diffab_pytorch_tpu.train import DiffAb

    ds = PatchDataset.from_dir(patch_dir)
    batch, _ = next(ds.batches(batch_size=2, seed=0, epochs=1))
    harness = DiffAb(tiny_config())
    state = harness.init(jax.random.key(0), batch)
    step = harness.make_train_step(donate=False)
    _, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["train/loss"]))


def test_canonical_pose_quotients_global_rotation(patch_dir):
    """assemble_batch maps a globally rotated copy of a complex to the SAME
    normalized coordinates and frames (pose is a function of the context
    only, so it is reproducible at sampling time), and the full transform
    round-trips for both coordinates and orientations."""
    from diffab_pytorch_tpu.data.dataset import assemble_batch
    from diffab_pytorch_tpu.structure.patch import load_patch

    ds = PatchDataset.from_dir(patch_dir)
    s = ds[0]
    theta = 0.9
    q = np.array(
        [[np.cos(theta), -np.sin(theta), 0.0],
         [np.sin(theta), np.cos(theta), 0.0],
         [0.0, 0.0, 1.0]], np.float32)
    s_rot = dict(s)
    s_rot["xyz"] = (s["xyz"] + np.array([3.0, -1.0, 2.0], np.float32)) @ q
    s_rot["orientations"] = s["orientations"] @ q

    b1, i1 = assemble_batch([s])
    b2, i2 = assemble_batch([s_rot])
    np.testing.assert_allclose(
        np.asarray(b2.xyz), np.asarray(b1.xyz), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(b2.orientations), np.asarray(b1.orientations), atol=2e-4
    )

    # roundtrip: normalized -> native, coordinates AND frames
    back = i2.denormalize(np.asarray(b2.translations))
    np.testing.assert_allclose(back, s_rot["xyz"][None, :, 1, :], atol=1e-3)
    ori_back = i2.denormalize_orientations(np.asarray(b2.orientations))
    np.testing.assert_allclose(ori_back, s_rot["orientations"][None], atol=1e-3)

    # canonical pose is right-handed and really is a rotation
    det = np.linalg.det(i2.rot)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_cached_batches_identical(patch_dir):
    """cache=True (the VERDICT-#4 host-input fix) is a pure memoization:
    epoch-2 batches are bit-identical to the uncached dataset's, and the
    cache actually populates."""
    kw = dict(cdrs_to_generate=["H3"])
    plain = PatchDataset.from_dir(patch_dir, **kw)
    cached = PatchDataset.from_dir(patch_dir, cache=True, **kw)
    it_p = plain.batches(batch_size=2, seed=3, epochs=2)
    it_c = cached.batches(batch_size=2, seed=3, epochs=2)
    n = 0
    for (bp, ip), (bc, ic) in zip(it_p, it_c):
        for leaf_p, leaf_c in zip(
            np.asarray(bp.xyz), np.asarray(bc.xyz)
        ):
            np.testing.assert_array_equal(leaf_p, leaf_c)
        np.testing.assert_array_equal(
            np.asarray(bp.generation_mask), np.asarray(bc.generation_mask)
        )
        np.testing.assert_array_equal(
            np.asarray(bp.orientations), np.asarray(bc.orientations)
        )
        np.testing.assert_array_equal(ip.center, ic.center)
        np.testing.assert_array_equal(ip.rot, ic.rot)
        n += 1
    assert n == 4  # 2 epochs x 2 batches
    assert len(cached._norm_cache) == 4
    assert len(plain._norm_cache) == 0
