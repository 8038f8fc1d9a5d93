from banet_tpu.tracking.tracker import TwoViewTracker  # noqa: F401
from banet_tpu.tracking.odometry import OdometryRunner  # noqa: F401
from banet_tpu.tracking.hybrid import HybridTracker  # noqa: F401
