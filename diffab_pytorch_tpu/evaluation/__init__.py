from diffab_pytorch_tpu.evaluation.metrics import (
    amino_acid_recovery,
    ca_rmsd,
    evaluate_designs,
)
