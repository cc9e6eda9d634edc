"""Symmetric checkpoint/resume of the full simulation state.

The reference has write-only checkpoints (PrintOutput dumps COM+quat,
`Ewald/initialConfigurations.jl:183-237`, with no reader; restart files
are its TODO, `Ewald/main.jl:46`).  Here: one .npz holds EVERY SimState
field — coordinates, orientations, box, Ewald structure factors, RNG keys,
adaptive step sizes, counters, and the global move counter — so a resumed
run continues the exact same stochastic trajectory.
"""

import numpy as np

from metropolismontecarlo_tpu.models.system import SimState


def save_state(path, state, metadata=None):
    arrays = {f: np.asarray(getattr(state, f)) for f in SimState._fields}
    if metadata:
        for k, v in metadata.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_state(path, dtype=None):
    with np.load(path) as data:
        fields = {}
        for f in SimState._fields:
            arr = data[f]
            if dtype is not None and arr.dtype.kind == "f":
                arr = arr.astype(dtype)
            fields[f] = arr
        meta = {k[5:]: data[k] for k in data.files if k.startswith("meta_")}
    return SimState(**{k: np.asarray(v) for k, v in fields.items()}), meta
