from diffab_pytorch_tpu.evaluation.metrics import (
    aligned_ca_rmsd,
    amino_acid_recovery,
    backbone_validity,
    ca_rmsd,
    evaluate_designs,
    kabsch,
    sequence_diversity,
    spearman_corr,
    validity_from_result,
)
