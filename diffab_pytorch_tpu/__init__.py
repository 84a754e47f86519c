"""diffab_pytorch_tpu — a TPU-native antibody-diffusion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
dohlee/diffab-pytorch (DiffAb, Luo et al., NeurIPS 2022): IGSO(3) rotational
+ Gaussian translational + multinomial sequence diffusion over antibody CDR
loops, an AlphaFold2-style Invariant Point Attention denoiser, SAbDab patch
preprocessing, training, and the on-device reverse sampler for CDR design
and optimization (which the reference leaves unimplemented).

Unlike the reference's empty __init__ (SURVEY.md §2.9#6), the documented
imports work:

    from diffab_pytorch_tpu import DiffAb, DiffAbConfig
"""

__version__ = "0.1.0"

from diffab_pytorch_tpu.config import (
    DataConfig,
    DiffAbConfig,
    DiffusionConfig,
    ModelConfig,
    TrainConfig,
    default_config,
    production_config,
    tiny_config,
)
from diffab_pytorch_tpu.constants import AA, ATOM, CDR, CDR_NAMES
from diffab_pytorch_tpu.data.batch import ProteinBatch, synthetic_batch
from diffab_pytorch_tpu.models.diffab import DiffAbModel
from diffab_pytorch_tpu.train.harness import DiffAb, TrainState
from diffab_pytorch_tpu.sampling.sampler import SampleResult, optimize, sample
