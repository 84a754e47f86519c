"""End-to-end exercise of the user-facing CLIs: preprocess -> train ->
checkpoint -> sample -> written artifacts re-parse.

This is the full design workflow a user of the reference would run (its
sample() was a stub, diffab_pytorch.py:770-776 — this framework's
cli.sample is the capability that replaces it), driven on the curated
Chothia fixture at tiny scale.
"""

import os

import numpy as np
import pytest

from diffab_pytorch_tpu.cli import sample as sample_cli
from diffab_pytorch_tpu.cli import train as train_cli
from diffab_pytorch_tpu.constants import AA_THREE, THREE_TO_ONE
from diffab_pytorch_tpu.structure import antibody, featurize_patch
from diffab_pytorch_tpu.structure.patch import load_patch, save_patch
from diffab_pytorch_tpu.structure.pdb import parse_pdb_file

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ab1_chothia.pdb")
N_DESIGNS = 4


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    data = root / "patches"
    data.mkdir()
    c = antibody.from_pdb(FIXTURE, "H", "L", ["A"], keep_fv_only=True)
    patch = featurize_patch(c, patch_size=128)
    for i in range(3):  # a few copies so the val split is non-degenerate
        save_patch(str(data / f"p{i}.npz"), patch)
    return root


@pytest.fixture(scope="module")
def trained(workdir):
    ckpt = workdir / "ckpt"
    rc = train_cli.main([
        "--data-dir", str(workdir / "patches"),
        "--tiny", "--max-steps", "2", "--bsz", "2", "--val-pct", "0",
        "--checkpoint-dir", str(ckpt),
        "--csv", str(workdir / "metrics.csv"),
    ])
    assert rc == 0
    return ckpt


@pytest.mark.slow
def test_cli_sample_end_to_end(workdir, trained):
    out = workdir / "designs"
    patch_path = str(workdir / "patches" / "p0.npz")
    rc = sample_cli.main([
        "--patch", patch_path,
        "--checkpoint-dir", str(trained),
        "--tiny", "-n", str(N_DESIGNS), "--cdrs", "H3",
        "-o", str(out), "-s", "3", "--rank",
    ])
    assert rc == 0

    # --rank: scores.json holds one finite score per design, ranks are a
    # permutation, and the FASTA headers carry score=
    import json

    with open(out / "scores.json") as fh:
        score_map = json.load(fh)
    assert len(score_map) == N_DESIGNS
    assert sorted(d["rank"] for d in score_map.values()) == list(range(N_DESIGNS))
    assert all(np.isfinite(d["score"]) for d in score_map.values())
    by_rank = sorted(score_map.values(), key=lambda d: d["rank"])
    assert all(a["score"] <= b["score"] for a, b in zip(by_rank, by_rank[1:]))

    src = load_patch(patch_path)
    gen = (src["cdr_idx"] == 3) & src["residue_mask"]
    res_mask = src["residue_mask"].astype(bool)

    # FASTA: one sequence per design, each exactly as long as the CDR mask
    fasta = (out / "designs.fasta").read_text().strip().splitlines()
    seqs = [l for l in fasta if not l.startswith(">")]
    assert len(seqs) == N_DESIGNS
    assert all(len(s) == int(gen.sum()) for s in seqs)
    assert all(" score=" in h and " rank=" in h
               for h in fasta if h.startswith(">"))

    # every written PDB re-parses; context residues keep their input
    # sequence and coordinates (to PDB %8.3f resolution)
    ctx = res_mask & ~gen
    for i in range(N_DESIGNS):
        path = out / f"design_{i:04d}.pdb"
        assert path.exists()
        chains = parse_pdb_file(str(path), prefer_native=False)
        flat = [r for cid in ("H", "L", "A") if cid in chains
                for r in chains[cid]]
        assert len(flat) == int(res_mask.sum())

        got_ca = np.stack([r.xyz[1] for r in flat])
        got_names = [r.resname for r in flat]
        src_ca = src["xyz"][res_mask, 1]
        src_names = [AA_THREE[s] for s in src["seq_idx"][res_mask]]
        ctx_rows = ctx[res_mask]
        np.testing.assert_allclose(got_ca[ctx_rows], src_ca[ctx_rows], atol=2e-3)
        assert all(
            g == s for g, s, keep in zip(got_names, src_names, ctx_rows) if keep
        )

    # stochastic designs differ in SEQUENCE.  (Designed coordinates from a
    # barely-trained checkpoint are catastrophically scattered, so the
    # default relax pass chord-initializes every design onto the same
    # anchor-anchor chord — geometries legitimately converge to one fixed
    # point; sequence draws are untouched by relaxation.)
    assert len(set(seqs)) > 1
    # ... and the designed CDR actually moved off the native coordinates
    h_ca = np.stack([r.xyz[1] for r in
                     parse_pdb_file(str(out / "design_0000.pdb"),
                                    prefer_native=False)["H"]])
    src_h = src["xyz"][res_mask & (src["chain_idx"] == 1), 1]
    assert np.abs(h_ca - src_h).max() > 0.1

    # FASTA letters come from the 20-AA alphabet
    aa_letters = set(THREE_TO_ONE.values()) | {"X"}
    assert all(set(s) <= aa_letters for s in seqs)


@pytest.mark.slow
def test_cli_sample_from_raw_pdb(workdir, trained):
    out = workdir / "designs_pdb"
    rc = sample_cli.main([
        "--pdb", FIXTURE, "--heavy-chain-id", "H", "--light-chain-id", "L",
        "--antigen-chain-ids", "A",
        "--checkpoint-dir", str(trained),
        "--tiny", "-n", "2", "--cdrs", "H3", "--t-restart", "20",
        "-o", str(out),
    ])
    assert rc == 0
    assert (out / "design_0001.pdb").exists()
    chains = parse_pdb_file(str(out / "design_0001.pdb"), prefer_native=False)
    assert "H" in chains and len(chains["H"]) > 50


@pytest.mark.slow
def test_cli_evaluate_closes_the_loop(workdir, trained):
    """preprocess -> sample -> EVALUATE: the metrics CLI reads the written
    designs back against the native patch and produces sane numbers."""
    import json

    from diffab_pytorch_tpu.cli import evaluate as evaluate_cli

    out = workdir / "designs_eval"
    patch_path = str(workdir / "patches" / "p0.npz")
    rc = sample_cli.main([
        "--patch", patch_path,
        "--checkpoint-dir", str(trained),
        "--tiny", "-n", "3", "--cdrs", "H3",
        "--t-restart", "10",  # shallow renoise: context-close designs
        "-o", str(out), "-s", "11", "--rank",
    ])
    assert rc == 0

    json_path = str(workdir / "eval.json")
    rc = evaluate_cli.main([
        "--native-patch", patch_path,
        "--designs", str(out),
        "--cdrs", "H3",
        "--json", json_path,
    ])
    assert rc == 0

    with open(json_path) as fh:
        report = json.load(fh)
    agg = report["aggregate"]
    assert agg["n_designs"] == 3
    assert 0.0 <= agg["aar_mean"] <= 1.0
    # shallow t-restart: designs stay near the native CDR (angstroms, not
    # tens of), and the context-aligned RMSD cannot exceed the unaligned
    # one by much (Kabsch can only help)
    assert 0.0 <= agg["ca_rmsd_mean"] < 20.0
    assert agg["ca_rmsd_aligned_mean"] < agg["ca_rmsd_mean"] + 1.0
    for row in report["designs"]:
        assert row["ca_rmsd"] >= 0.0
    # scores.json was auto-detected: per-design model scores + the ranking
    # report (how well the oracle-free score tracked ground truth)
    assert all("model_score" in row for row in report["designs"])
    assert -1.0 <= agg["rank_spearman"] <= 1.0
    assert agg["ca_rmsd_best_of_n"] <= agg["ca_rmsd_top1_by_score"] + 1e-9
    assert agg["ca_rmsd_top1_by_score"] <= max(
        row["ca_rmsd"] for row in report["designs"]
    )


def test_cli_evaluate_rejects_mismatched_designs(tmp_path, workdir):
    """A design file with the wrong residue count is an error, not a
    silently wrong number."""
    from diffab_pytorch_tpu.cli import evaluate as evaluate_cli

    patch_path = str(workdir / "patches" / "p0.npz")
    (tmp_path / "design_0000.pdb").write_text(
        "ATOM      1  CA  ALA H   1      0.000   0.000   0.000  1.00  0.00"
        "           C\nEND\n"
    )
    with pytest.raises(ValueError, match="residues"):
        evaluate_cli.main([
            "--native-patch", patch_path,
            "--designs", str(tmp_path),
        ])


def test_sample_cli_noise_and_clip_flag_parsing():
    """--x0-clip auto/float/none and --noise-scale reach the sampler kwargs
    with the right types (the string->value mapping lives in main, so pin
    it at the parse layer + mapping expression)."""
    args = sample_cli.parse_args([
        "--patch", "x.npz", "--checkpoint-dir", "c",
    ])
    assert args.x0_clip == "auto" and args.noise_scale == 1.0

    for raw, want in (("none", None), ("0", None), ("auto", "auto"),
                      ("3.5", 3.5)):
        args = sample_cli.parse_args([
            "--patch", "x.npz", "--checkpoint-dir", "c", "--x0-clip", raw,
        ])
        mapped = (
            None if str(args.x0_clip).lower() in ("none", "0")
            else "auto" if args.x0_clip == "auto"
            else float(args.x0_clip)
        )
        assert mapped == want, raw


def test_train_cli_production_preset_resolution():
    """--production fills the recipe knobs from production_config()
    (every piece quality-gated — QUALITY.md); explicit flags override;
    the plain path keeps the reference defaults."""
    plain = train_cli.build_config(
        train_cli.parse_args(["--data-dir", "x"]), horizon=1000)
    assert plain.train.batch_size == 16 and plain.train.lr == 1e-4
    assert plain.train.lr_decay_steps == 0 and plain.train.mode_dropout == 0
    assert plain.model.dist_atoms is None and plain.model.d_pair_emb == 64
    assert plain.model.compute_dtype == "float32"
    # the robust optimizer knobs are default-on everywhere (seed matrix)
    assert plain.train.update_clip_rms == 1.0
    assert plain.train.ema_decay == 0.999

    prod = train_cli.build_config(
        train_cli.parse_args(["--data-dir", "x", "--production"]),
        horizon=12000)
    assert prod.train.batch_size == 32 and prod.train.lr == 6e-4
    assert prod.train.lr_warmup_steps == 100
    assert prod.train.lr_decay_steps == 12000
    assert prod.train.grad_clip_norm == 1.0
    assert prod.train.mode_dropout == 0.15
    assert prod.model.dist_atoms == 4 and prod.model.d_pair_emb == 48
    assert prod.model.compute_dtype == "bfloat16"

    over = train_cli.build_config(
        train_cli.parse_args([
            "--data-dir", "x", "--production", "-l", "3e-4",
            "--dist-atoms", "0", "--d-pair", "64", "-b", "64",
        ]), horizon=5000)
    assert over.train.lr == 3e-4 and over.train.batch_size == 64
    assert over.model.dist_atoms is None and over.model.d_pair_emb == 64
    assert over.train.lr_decay_steps == 5000


@pytest.mark.slow
def test_cli_sample_restores_sc_checkpoint(workdir):
    """A self-conditioning checkpoint has a wider fuse layer; cli.sample
    must rebuild it from the recorded model_config.json instead of the
    default template."""
    ckpt = workdir / "ckpt_sc"
    rc = train_cli.main([
        "--data-dir", str(workdir / "patches"),
        "--tiny", "--self-conditioning", "--max-steps", "1", "--bsz", "2",
        "--val-pct", "0", "--checkpoint-dir", str(ckpt),
    ])
    assert rc == 0
    out = workdir / "designs_sc"
    rc = sample_cli.main([
        "--patch", str(workdir / "patches" / "p0.npz"),
        "--checkpoint-dir", str(ckpt),
        "--tiny", "-n", "2", "--cdrs", "H3", "--n-steps", "8",
        "-o", str(out),
    ])
    assert rc == 0
    assert (out / "design_0001.pdb").exists()


def test_noise_t_max_auto_rule():
    """The measured deferred-noise default (DESIGN.md round-3 scatter
    study): T//2 for full-length stochastic chains only; few-step and
    deterministic chains stay off; 0 forces off; explicit values pass."""
    r = sample_cli.resolve_noise_t_max
    # auto: full-length stochastic -> T//2
    assert r(None, T=100, n_steps=None, noise_scale=1.0) == 50
    # auto: few-step / deterministic -> off
    assert r(None, T=100, n_steps=25, noise_scale=1.0) is None
    assert r(None, T=100, n_steps=None, noise_scale=0.0) is None
    # 0 / negative force off even on the recipe chain
    assert r(0, T=100, n_steps=None, noise_scale=1.0) is None
    assert r(-1, T=100, n_steps=None, noise_scale=1.0) is None
    # explicit thresholds pass through everywhere
    assert r(30, T=100, n_steps=25, noise_scale=1.0) == 30
    assert r(30, T=100, n_steps=None, noise_scale=0.0) == 30
