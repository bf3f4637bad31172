from gecco_tpu.train.trainer import Trainer, ema_update, make_train_step, train

__all__ = ["Trainer", "ema_update", "make_train_step", "train"]
