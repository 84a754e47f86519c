# Snakemake fan-out over a SAbDab meta.csv — workflow parity with the
# reference's pipelines/preprocess.smk (SURVEY.md §2 #18) for users who keep
# their snakemake setup; `python -m diffab_pytorch_tpu.cli.preprocess --meta
# ... -j N` is the equivalent built-in bulk mode.
#
#   snakemake -s pipelines/preprocess.smk -j 16 --keep-going \
#       --config meta=data/meta.csv pdb_dir=data/all_structures/chothia \
#                out_dir=data/preprocessed k=128

import csv

META = config.get("meta", "data/meta.csv")
PDB_DIR = config.get("pdb_dir", "data/all_structures/chothia")
OUT_DIR = config.get("out_dir", "data/preprocessed")
K = int(config.get("k", 128))


def _norm(v):
    v = (v or "").strip()
    return None if v.lower() in ("", "nan", "none") else v


ROWS = {}
with open(META) as f:
    for rec in csv.DictReader(f):
        heavy = _norm(rec.get("Hchain"))
        light = _norm(rec.get("Lchain"))
        ag = _norm(rec.get("antigen_chain"))
        antigens = "".join(ag.split(" | ")) if ag else None
        name = "_".join([rec["pdb_id"], heavy or "na", light or "na",
                         antigens or "na"])
        ROWS[name] = (rec["pdb_id"], heavy, light, antigens)


rule all:
    input:
        expand(OUT_DIR + "/{name}.npz", name=ROWS)


rule preprocess:
    input:
        pdb=lambda wc: f"{PDB_DIR}/{ROWS[wc.name][0]}.pdb",
    output:
        OUT_DIR + "/{name}.npz",
    params:
        heavy=lambda wc: ROWS[wc.name][1],
        light=lambda wc: ROWS[wc.name][2],
        antigens=lambda wc: ROWS[wc.name][3],
    run:
        args = ["-i", input.pdb, "-o", output[0], "-k", str(K)]
        if params.heavy:
            args += ["--heavy-chain-id", params.heavy]
        if params.light:
            args += ["--light-chain-id", params.light]
        if params.antigens:
            args += ["-a", params.antigens]
        from diffab_pytorch_tpu.cli.preprocess import main as pp
        rc = pp(args)
        if rc != 0:
            raise RuntimeError(f"preprocess failed for {wildcards.name}")
