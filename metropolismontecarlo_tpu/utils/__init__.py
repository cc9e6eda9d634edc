from metropolismontecarlo_tpu.utils import constants  # noqa: F401
