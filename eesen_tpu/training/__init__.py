from eesen_tpu.training.optim import (
    OptimizerConfig,
    make_optimizer,
)
from eesen_tpu.training.schedule import NewbobScheduler, NewbobConfig

__all__ = [
    "OptimizerConfig",
    "make_optimizer",
    "NewbobScheduler",
    "NewbobConfig",
]
