from hip_llama_tpu.train.model import make_train_forward, cross_entropy_loss
from hip_llama_tpu.train.trainer import TrainConfig, Trainer

__all__ = ["make_train_forward", "cross_entropy_loss", "TrainConfig", "Trainer"]
