from diffab_pytorch_tpu.train.harness import DiffAb, NoisedSample, TrainState
from diffab_pytorch_tpu.train.losses import (
    diffab_losses,
    kl_divergence_from_logits,
    orientation_discrepancy,
)
