"""Bulk preprocessing at scale (round-1 VERDICT missing #2): the reference
pipeline fans out over 8,400 meta rows (pipelines/preprocess.smk:12-30);
the bulk CLI here had only been exercised on toy metas.  This test chews a
1,000-row synthetic meta in ONE process pool and pins what toy runs cannot:
skip accounting stays exact at scale, every output is loadable, and worker
memory does not grow unboundedly across hundreds of files.

Marked slow (several minutes on the single-core container); run with
  python -m pytest tests/test_preprocess_scale.py -m slow -q
"""

import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from diffab_pytorch_tpu.data.synthetic import make_combo_pdb

N_ROWS = 1000
N_MISSING = 5  # meta rows whose pdb file does not exist
N_TRUNCATED = 5  # files cut off mid-atom
N_BADCHAIN = 5  # heavy chain id absent from the file
N_BAD = N_MISSING + N_TRUNCATED + N_BADCHAIN


@pytest.mark.slow
def test_bulk_preprocess_1k(tmp_path):
    pdb_dir = tmp_path / "pdb"
    out_dir = tmp_path / "npz"
    pdb_dir.mkdir()

    # 20 distinct complexes cycled over the rows: realistic parser work per
    # file without paying 1,000 corpus generations
    texts = [make_combo_pdb((i % 4, (i // 4) % 4, 1, 2), seed=i)
             for i in range(20)]
    rows = ["pdb_id,Hchain,Lchain,antigen_chain"]
    for i in range(N_ROWS):
        pdb_id = f"p{i:04d}"
        kind = "ok"
        if i % 200 == 13 and N_MISSING:
            kind = "missing"
        elif i % 200 == 57:
            kind = "truncated"
        elif i % 200 == 101:
            kind = "badchain"
        text = texts[i % len(texts)]
        if kind == "truncated":
            (pdb_dir / f"{pdb_id}.pdb").write_text(text[: len(text) // 3][:-40])
        elif kind != "missing":
            (pdb_dir / f"{pdb_id}.pdb").write_text(text)
        heavy = "Q" if kind == "badchain" else "H"
        rows.append(f"{pdb_id},{heavy},L,A")
    meta = tmp_path / "meta.csv"
    meta.write_text("\n".join(rows) + "\n")

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    proc = subprocess.Popen(
        [sys.executable, "-m", "diffab_pytorch_tpu.cli.preprocess",
         "--meta", str(meta), "--data-dir", str(pdb_dir),
         "--out-dir", str(out_dir), "-j", "2", "-k", "128"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )

    # sample worker RSS while the pool runs: memory must be flat-ish, not
    # growing per file (a leak at 8,400-file SAbDab scale would OOM)
    samples = []
    try:
        import psutil

        parent = psutil.Process(proc.pid)

        def poll():
            while proc.poll() is None:
                try:
                    kids = parent.children(recursive=True)
                    if kids:
                        samples.append(
                            (time.time(),
                             max(k.memory_info().rss for k in kids))
                        )
                except psutil.Error:
                    pass
                time.sleep(2.0)

        t = threading.Thread(target=poll, daemon=True)
        t.start()
    except ImportError:
        pass

    out, err = proc.communicate(timeout=3600)
    assert proc.returncode == 0, err[-2000:]

    # exact skip accounting: truncated files still parse down to a usable
    # (if shorter) complex OR fail featurization — either way the final
    # tally must add up and every skip must be logged with a traceback
    n_out = len([f for f in os.listdir(out_dir) if f.endswith(".npz")])
    last = [l for l in out.splitlines() if l.startswith("preprocessed")][-1]
    n_ok = int(last.split()[1])
    n_skip = int(last.split()[4])
    assert n_ok == n_out
    assert n_ok + n_skip == N_ROWS
    assert n_skip >= N_MISSING + N_BADCHAIN  # these can never succeed
    assert n_skip <= N_BAD
    assert err.count("[skip]") == n_skip

    # spot-check loadability across the run, not just the first file
    from diffab_pytorch_tpu.structure.patch import load_patch

    outs = sorted(os.listdir(out_dir))
    for f in (outs[0], outs[len(outs) // 2], outs[-1]):
        s = load_patch(str(out_dir / f))
        assert s["xyz"].shape[0] == 128
        assert np.isfinite(s["xyz"][s["atom_mask"] > 0]).all()
        assert (s["cdr_idx"] > 0).any()

    # memory flatness: compare peak worker RSS in the second quarter of the
    # run vs the last quarter — growth beyond 300 MB means per-file leakage
    if len(samples) >= 8:
        q = len(samples) // 4
        early = max(r for _, r in samples[q:2 * q])
        late = max(r for _, r in samples[-q:])
        assert late - early < 300e6, (
            f"worker RSS grew {(late - early) / 1e6:.0f} MB across the run"
        )
