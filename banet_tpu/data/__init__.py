from banet_tpu.data.synthetic import (  # noqa: F401
    smooth_feature_map,
    make_two_view_problem,
    make_synthetic_image_pair,
)
