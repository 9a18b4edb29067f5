from egc_tpu.train.optim import (  # noqa: F401
    make_optimizer, PlateauState, plateau_init, plateau_update, set_lr, get_lr,
)
from egc_tpu.train.state import TrainState  # noqa: F401
from egc_tpu.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from egc_tpu.train import metrics  # noqa: F401
