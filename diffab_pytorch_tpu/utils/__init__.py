from diffab_pytorch_tpu.utils.logging import MetricLogger
