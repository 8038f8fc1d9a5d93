from banet_tpu.eval.associate import associate  # noqa: F401
from banet_tpu.eval.trajectory import (  # noqa: F401
    Trajectory,
    load_tum_trajectory,
    save_tum_trajectory,
    pose_matrix,
)
from banet_tpu.eval.ate import horn_align, ate_rmse, evaluate_ate  # noqa: F401
from banet_tpu.eval.rpe import evaluate_rpe  # noqa: F401
