from banet_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    optimistic_restore,
)
from banet_tpu.utils.profiling import time_jitted, cost_summary  # noqa: F401
from banet_tpu.utils.logging import MetricsLogger  # noqa: F401
