from yolort_tpu.trainer.task import DefaultTask, TrainState, make_train_step  # noqa: F401
