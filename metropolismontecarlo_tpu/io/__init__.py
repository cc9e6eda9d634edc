from metropolismontecarlo_tpu.io import configs  # noqa: F401
