from banet_tpu.ba.residuals import warp_residuals, WarpResult  # noqa: F401
from banet_tpu.ba.camera_solver import (  # noqa: F401
    pose_gn_step,
    solve_pose_level,
    solve_pose_pyramid,
)
from banet_tpu.ba.bundle_solver import (  # noqa: F401
    bundle_gn_step,
    solve_bundle_pyramid,
)
