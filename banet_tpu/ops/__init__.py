from banet_tpu.ops.grad2d import spatial_gradient, append_spatial_gradient  # noqa: F401
from banet_tpu.ops.resample import (  # noqa: F401
    bilinear_sample,
    bilinear_sample_with_mask,
    inbounds_mask,
)
from banet_tpu.ops.normal_eq import build_normal_equations  # noqa: F401
from banet_tpu.ops.solve import damped_solve  # noqa: F401
from banet_tpu.ops.upsample import upsample2x_bilinear  # noqa: F401
