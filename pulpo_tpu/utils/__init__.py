from pulpo_tpu.utils.profiling import trace, StepTimer  # noqa: F401
