from diffab_pytorch_tpu.sampling.sampler import SampleResult, optimize, sample
