from ultra_pytorch_tpu.run.experiment import Experiment, create_algorithm  # noqa: F401
