from diffab_pytorch_tpu.structure.pdb import (
    Residue,
    parse_pdb,
    parse_pdb_file,
    write_pdb,
)
from diffab_pytorch_tpu.structure.antibody import (
    AntibodyComplex,
    fetch_pdb,
    from_arrays,
    from_chains,
    from_pdb,
    from_pdb_id,
)
from diffab_pytorch_tpu.structure.patch import (
    PATCH_KEYS,
    extract_patch_mask,
    featurize_patch,
    load_patch,
    save_patch,
)
from diffab_pytorch_tpu.structure import geometry
from diffab_pytorch_tpu.structure.reconstruct import reconstruct_backbone
