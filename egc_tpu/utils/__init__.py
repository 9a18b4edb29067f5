from egc_tpu.utils.logging import JSONLLogger, ThroughputMeter  # noqa: F401
from egc_tpu.utils.debug import (  # noqa: F401
    enable_determinism, check_finite, seed_all,
)
from egc_tpu.utils.profiling import profile_trace  # noqa: F401
