from diffab_pytorch_tpu.geometry.so3 import (
    compose,
    exp_skew_symmetric_mat,
    hat,
    identity_like,
    log_rotmat,
    matrix_to_quaternion,
    quaternion_to_matrix,
    rotation_matrix_to_vector,
    scale_rot,
    skew_symmetric_mat_to_vector,
    tensor_trace,
    uniform,
    vector_to_rotation_matrix,
    vector_to_skew_symmetric_mat,
    vee,
)
from diffab_pytorch_tpu.geometry.igso3 import (
    IGSO3Table,
    build_igso3_table,
    igso3_angular_pdf,
    sample_angle,
    sample_axis_angle,
)
