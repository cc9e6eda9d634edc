"""Debug-mode state validation (sanitizer parity, SURVEY section 5).

The reference sprinkles runtime invariants through the hot loop: box-
bounds checks (`Ewald/main.jl:632-639`), quaternion-norm exits
(`Ewald/quaternions.jl:20-25`), charge-neutrality and r_cut asserts
(`Ewald/main.jl:358,483-485`).  Here they are one host-side call on a
SimState — cheap enough to run at block boundaries during debugging, off
the hot path by construction.
"""

import numpy as np


def validate_state(state, system, params, strict=True):
    """Returns a list of violation strings (empty = healthy).

    Checks: finite energies/coords, COMs inside the box, unit
    quaternions, rebuilt-coordinate consistency would be the drift check
    (run_block does that), r_cut < box/2, charge neutrality.
    """
    problems = []
    coords = np.asarray(state.coords)
    com = np.asarray(state.com)
    quat = np.asarray(state.quat)
    box = np.asarray(state.box)
    energy = np.asarray(state.energy)

    if not np.all(np.isfinite(energy)):
        problems.append(f"non-finite energies in {np.sum(~np.isfinite(energy))} chains")
    A = system.n_atoms
    if not np.all(np.isfinite(coords[:, :, :A])):
        problems.append("non-finite coordinates")
    if np.any(com < -1e-6) or np.any(com > box[:, None, None] + 1e-6):
        problems.append("molecule COM outside the box")
    norms = np.linalg.norm(quat, axis=-1)
    if np.max(np.abs(norms - 1.0)) > 1e-3:
        problems.append(f"quaternion norm drift {np.max(np.abs(norms - 1.0)):.2e}")
    if np.any(params.r_cut >= box / 2.0 + 1e-9):
        problems.append("r_cut >= box/2 (minimum image invalid)")
    qtot = float(np.sum(system.charges))
    if abs(qtot) > 1e-6:
        problems.append(f"system not charge neutral: {qtot:.3e}")
    if strict and problems:
        raise AssertionError("; ".join(problems))
    return problems
