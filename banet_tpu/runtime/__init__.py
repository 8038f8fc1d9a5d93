from banet_tpu.runtime.native import (  # noqa: F401
    native_available,
    decode_rgb,
    decode_depth,
    png_dims,
    Prefetcher,
    sobel_select_points,
)
