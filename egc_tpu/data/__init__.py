from egc_tpu.data.loaders import GraphLoader, padding_budget  # noqa: F401
from egc_tpu.data import synthetic  # noqa: F401
