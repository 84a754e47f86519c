from diffab_pytorch_tpu.sampling.sampler import SampleResult, optimize, sample
from diffab_pytorch_tpu.sampling.scoring import (
    DesignScores,
    rank_per_target,
    score_designs,
)
