from metropolismontecarlo_tpu.ops import pbc, quaternions  # noqa: F401
