from gdmcf_tpu.train.state import TrainState, create_train_state
from gdmcf_tpu.train.trainer import Trainer

__all__ = ["TrainState", "create_train_state", "Trainer"]
