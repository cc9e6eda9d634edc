from metropolismontecarlo_tpu.models.system import System, RunParams, SimState  # noqa: F401
