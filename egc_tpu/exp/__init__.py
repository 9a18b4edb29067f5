from egc_tpu.exp.hyperparams import (  # noqa: F401
    ChoiceHyperParam, LogUniformHyperParam, UniformHyperParam, default_hparams,
)
from egc_tpu.exp.config import (  # noqa: F401
    ExperimentConfig, ExperimentSettings, Metric, TrialResources,
)
from egc_tpu.exp.runner import run_trial, check_config, train_final_models  # noqa: F401
from egc_tpu.exp.search import (  # noqa: F401
    RandomSearchStrategy, GridSearchStrategy, run_search,
)
