from banet_tpu.models.drn import DRN  # noqa: F401
from banet_tpu.models.dla import DLA  # noqa: F401
from banet_tpu.models.pyramid import FeaturePyramid  # noqa: F401
from banet_tpu.models.damping import DampingNet  # noqa: F401
from banet_tpu.models.banet import BANet  # noqa: F401
