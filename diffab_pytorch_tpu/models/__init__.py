from diffab_pytorch_tpu.models.encoding import (
    angular_encode,
    angular_encoding_dim,
    beta_encode,
)
from diffab_pytorch_tpu.models.embedding import (
    PairEmbedding,
    ResidueEmbedding,
    pairwise_dihedrals_from_xyz,
    pairwise_sq_distances,
)
from diffab_pytorch_tpu.models.ipa import (
    InvariantPointAttentionLayer,
    InvariantPointAttentionModule,
    frames_apply,
    frames_apply_inverse,
)
from diffab_pytorch_tpu.models.denoiser import Denoiser
from diffab_pytorch_tpu.models.diffab import DiffAbModel
