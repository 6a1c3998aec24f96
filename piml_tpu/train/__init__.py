from piml_tpu.train import losses  # noqa: F401

# Trainer imports engine.simulator which imports train.losses; keep the
# trainer import lazy to break the package-level cycle.
_TRAINER_NAMES = {
    "TrainState", "Trainer", "checkpoint_path", "load_params",
    "make_batches", "make_optimizer", "merge_pretrained", "save_params",
}


def __getattr__(name):
    if name in _TRAINER_NAMES:
        from piml_tpu.train import trainer as _trainer

        return getattr(_trainer, name)
    raise AttributeError(name)

from piml_tpu.train import checkpoint  # noqa: F401
