from diffab_pytorch_tpu.diffusion.schedule import (
    DiffusionSchedule,
    cosine_variance_schedule,
)
from diffab_pytorch_tpu.diffusion import sequence
from diffab_pytorch_tpu.diffusion import coordinate
from diffab_pytorch_tpu.diffusion import orientation
from diffab_pytorch_tpu.diffusion.sequence import SequenceDiffuser
from diffab_pytorch_tpu.diffusion.coordinate import CoordinateDiffuser
from diffab_pytorch_tpu.diffusion.orientation import (
    OrientationDiffuser,
    OrientationDiffusionTables,
    make_orientation_tables,
)
