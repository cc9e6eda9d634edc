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


def save_ensemble_state(path, state, metadata=None):
    """Checkpoint ANY ensemble-app state (GCMCState, MolGCMCState,
    MolGibbsState, OsmoticState — any NamedTuple of arrays).  Every
    field is saved, including the per-chain PRNG keys, so a resumed run
    continues the exact same stochastic trajectory (gated bitwise by
    tests/test_gcmc_mol.py::test_gcmc_mol_checkpoint_resume)."""
    arrays = {f: np.asarray(getattr(state, f))
              for f in type(state)._fields}
    arrays["state_kind"] = np.asarray(type(state).__name__)
    if metadata:
        for k, v in metadata.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_ensemble_state(path, state_cls, dtype=None):
    """Load a `save_ensemble_state` checkpoint as `state_cls` (the
    matching ensemble State class; a mismatch raises)."""
    with np.load(path) as data:
        kind = str(data["state_kind"])
        if kind != state_cls.__name__:
            raise ValueError(f"checkpoint holds a {kind}, not a "
                             f"{state_cls.__name__}")
        fields = {}
        for f in state_cls._fields:
            arr = data[f]
            if dtype is not None and arr.dtype.kind == "f":
                arr = arr.astype(dtype)
            fields[f] = np.asarray(arr)
        meta = {k[5:]: data[k] for k in data.files if k.startswith("meta_")}
    return state_cls(**fields), meta
