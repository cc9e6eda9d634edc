"""Monatomic Lennard-Jones fluid (reduced units).

Capability parity with reference `Monatomic/mainMonatomic.jl`: N LJ atoms,
NVT (or NPT), truncated unshifted potential with tail corrections,
single-particle translation moves.  In this framework a monatomic system
is simply the degenerate P=1 molecule: zero body frame, no charges, no
rotations (p_translate = 1).

Published anchor: 48% acceptance at N=256, rho=0.75, T=1.0,
dr_max=box/30 (`Monatomic/mainMonatomic.jl:351`).
"""

import functools

import numpy as np

from metropolismontecarlo_tpu.models.system import System


@functools.lru_cache(maxsize=None)
def lj_system(n_atoms, eps=1.0, sigma=1.0):
    """Reduced-unit monatomic LJ fluid of n_atoms particles."""
    return System(
        n_mol=n_atoms,
        atoms_per_mol=1,
        body=np.zeros((n_atoms, 1, 3)),
        masses=np.ones((n_atoms, 1)),
        charges=np.zeros((n_atoms, 1)),
        type_ids=np.zeros((n_atoms, 1), np.int32),
        eps_table=np.array([[eps]]),
        sig_table=np.array([[sigma]]),
        name="lj_fluid",
    )


def lj_box_for_density(n_atoms, rho):
    return (n_atoms / rho) ** (1.0 / 3.0)
