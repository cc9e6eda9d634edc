from metropolismontecarlo_tpu.mc import driver, moves, adjust  # noqa: F401
