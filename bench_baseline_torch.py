"""Measure the PyTorch reference baseline: CDR-H3 design throughput on CPU.

The reference publishes no numbers (BASELINE.md) and its DiffAb.sample() is
an unimplemented stub, so per BASELINE.md the baseline sampler is the
reference's own forward path driven T=100 times per sample: encode_context
once + 100 Denoiser forwards, on torch CPU (the only torch device here).

The reference package is imported AS-IS from /root/reference (not copied);
its missing external deps (pytorch_lightning, protstruc) are satisfied with
minimal import shims, since only nn.Module behavior is exercised.

Writes baseline_torch.json: {"samples_per_sec": ..., "config": {...}}.
Run once; bench.py reads the cached value.
"""

import json
import sys
import time
import types

import torch


def _install_shims():
    # pytorch_lightning shim: the reference only subclasses pl.LightningModule
    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = torch.nn.Module
    sys.modules.setdefault("pytorch_lightning", pl)

    # protstruc shim: only the ATOM/AA enums are touched at import/forward
    import enum

    protstruc = types.ModuleType("protstruc")
    general = types.ModuleType("protstruc.general")

    class ATOM(enum.IntEnum):
        N = 0
        CA = 1
        C = 2
        O = 3
        CB = 4

    class AA(enum.IntEnum):
        UNK = 20

    general.ATOM = ATOM
    general.AA = AA
    protstruc.general = general
    sys.modules.setdefault("protstruc", protstruc)
    sys.modules.setdefault("protstruc.general", general)


def main():
    _install_shims()
    sys.path.insert(0, "/root/reference")
    from diffab_pytorch.diffab_pytorch import Denoiser, PairEmbedding, ResidueEmbedding

    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())

    # reference training hyperparameters (train.py:62-80) and data shapes
    # (K=128 patches, n_atoms=15, T=100)
    d_res, d_pair = 128, 64
    n_layers, d_scalar, n_head, n_qp, n_vp = 6, 32, 8, 8, 8
    A, L, T = 15, 128, 100
    bsz = 4

    res_emb_mod = ResidueEmbedding(A, d_res)
    pair_emb_mod = PairEmbedding(A, d_pair, 32)
    denoiser = Denoiser(d_res, d_pair, n_layers, d_scalar, n_qp, n_vp, n_head, 21)
    res_emb_mod.eval(), pair_emb_mod.eval(), denoiser.eval()

    seq = torch.randint(0, 21, (bsz, L))
    xyz = torch.randn(bsz, L, A, 3)
    ori = torch.eye(3).expand(bsz, L, 3, 3).contiguous()
    dihedrals = torch.rand(bsz, L, 3)
    chain_idx = torch.ones(bsz, L, dtype=torch.long)
    residue_idx = torch.arange(L).unsqueeze(0).expand(bsz, L)
    atom_mask = torch.ones(bsz, L, A)
    distmat = torch.rand(bsz, L, L, A, A) * 10
    pair_dihedrals = torch.rand(bsz, L, L, 2)
    translations = xyz[:, :, 1]
    beta = torch.full((bsz,), 0.01)

    def one_sample_batch():
        with torch.no_grad():
            re = res_emb_mod(seq, xyz, ori, dihedrals, chain_idx, atom_mask)
            pe = pair_emb_mod(
                seq, distmat, pair_dihedrals, residue_idx, chain_idx, atom_mask,
                None, None,
            )
            for _ in range(T):
                denoiser(seq, translations, ori, re, pe, beta, None, None)

    # warmup
    t0 = time.time()
    one_sample_batch()
    warm = time.time() - t0
    n_iters = max(1, int(30.0 / max(warm, 1e-3)))
    n_iters = min(n_iters, 3)

    t0 = time.time()
    for _ in range(n_iters):
        one_sample_batch()
    dt = time.time() - t0

    samples_per_sec = bsz * n_iters / dt
    out = {
        "samples_per_sec": samples_per_sec,
        "config": {
            "device": "cpu",
            "torch": torch.__version__,
            "bsz": bsz,
            "L": L,
            "T": T,
            "model": "reference default (d=128, 6 IPA layers, 8 heads)",
            "threads": torch.get_num_threads(),
        },
    }
    with open("baseline_torch.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
