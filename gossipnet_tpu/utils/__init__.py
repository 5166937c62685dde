from gossipnet_tpu.utils.metrics import MetricsLogger, StepTimer  # noqa: F401
