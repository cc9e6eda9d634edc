from metropolismontecarlo_tpu.parallel import mesh, remc  # noqa: F401
