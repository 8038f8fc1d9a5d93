from banet_tpu.geometry.se3 import (  # noqa: F401
    exp_so3,
    left_jacobian,
    se3_update,
    compose,
    invert,
    rotation_to_quaternion,
    quaternion_to_rotation,
    rotation_geodesic_angle,
)
from banet_tpu.geometry.camera import (  # noqa: F401
    Intrinsics,
    backproject,
    project,
    warp_points,
    crop_remap,
    crop_adjusted_intrinsics,
)
from banet_tpu.geometry.jacobians import (  # noqa: F401
    camera_jacobian,
    depth_jacobian,
)
