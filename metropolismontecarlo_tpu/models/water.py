"""Rigid water models: SPC/E and TIP3P system builders.

Capability parity with the reference's flagship Ewald water app
(`Ewald/main.jl` "crystal" and "nist" paths): SPC/E parameters match the
NIST reference-calculation constants the reference hardcodes at
`Ewald/main.jl:242-246`; TIP3P parameters come from the GROMACS topology
(`water.top`) route once parsed (io.topology).
"""

import functools

import numpy as np

from metropolismontecarlo_tpu.io.configs import read_nist
from metropolismontecarlo_tpu.models.system import System

# SPC/E (Berendsen et al. 1987; NIST SRSW constants)
SPCE_SIGMA_OO = 3.16555789      # Angstrom
SPCE_EPS_OO = 78.19743111       # K (epsilon / kB)
SPCE_Q_O = -0.8476              # e
SPCE_Q_H = 0.4238               # e
SPCE_R_OH = 1.0                 # Angstrom
SPCE_THETA = 109.47             # degrees
MASS_O = 15.999
MASS_H = 1.008

# TIP3P (Jorgensen 1983); GROMACS water.top values (`water.top:11-13`):
# sigma 0.315061 nm, eps 0.6364 kJ/mol, qO -0.834, r_OH 0.9572 A, 104.52 deg
TIP3P_SIGMA_OO = 3.15061
TIP3P_EPS_OO = 0.6364 * 120.272236695  # kJ/mol -> K
TIP3P_Q_O = -0.834
TIP3P_Q_H = 0.417
TIP3P_R_OH = 0.9572
TIP3P_THETA = 104.52


def water_body_frame(r_oh, theta_deg):
    """Rigid 3-site water template (O, H, H) with COM at the origin.

    O on the -z side, H's symmetric in the xz-plane.
    """
    th = np.deg2rad(theta_deg) / 2.0
    o = np.array([0.0, 0.0, 0.0])
    h1 = np.array([r_oh * np.sin(th), 0.0, r_oh * np.cos(th)])
    h2 = np.array([-r_oh * np.sin(th), 0.0, r_oh * np.cos(th)])
    pts = np.stack([o, h1, h2])
    m = np.array([MASS_O, MASS_H, MASS_H])
    com = (pts * m[:, None]).sum(0) / m.sum()
    return pts - com


def _water_system(n_mol, sigma, eps, q_o, q_h, r_oh, theta, name):
    body = np.broadcast_to(water_body_frame(r_oh, theta), (n_mol, 3, 3)).copy()
    masses = np.broadcast_to(np.array([MASS_O, MASS_H, MASS_H]), (n_mol, 3)).copy()
    charges = np.broadcast_to(np.array([q_o, q_h, q_h]), (n_mol, 3)).copy()
    type_ids = np.broadcast_to(np.array([0, 1, 1], np.int32), (n_mol, 3)).copy()
    eps_t = np.array([[eps, 0.0], [0.0, 0.0]])
    sig_t = np.array([[sigma, 1.0], [1.0, 1.0]])
    return System(
        n_mol=n_mol, atoms_per_mol=3, body=body, masses=masses,
        charges=charges, type_ids=type_ids, eps_table=eps_t,
        sig_table=sig_t, name=name,
    )


@functools.lru_cache(maxsize=None)
def spce_system(n_mol):
    """Cached so identical systems share one instance (and one jit cache
    entry — System is static-by-identity).  Arrays are read-only by
    convention."""
    return _water_system(n_mol, SPCE_SIGMA_OO, SPCE_EPS_OO, SPCE_Q_O,
                         SPCE_Q_H, SPCE_R_OH, SPCE_THETA, "spce")


@functools.lru_cache(maxsize=None)
def tip3p_system(n_mol):
    return _water_system(n_mol, TIP3P_SIGMA_OO, TIP3P_EPS_OO, TIP3P_Q_O,
                         TIP3P_Q_H, TIP3P_R_OH, TIP3P_THETA, "tip3p")


# TIP4P/2005 (Abascal & Vega, J. Chem. Phys. 123, 234505 (2005)):
# 4-site rigid water with the negative charge on a massless M site
# displaced from O along the HOH bisector.  Beyond the reference (its
# models are all 3-site), but trivially inside this engine: the data
# model already carries arbitrary rigid bodies (11-site MEA), and a
# zero-mass site simply carries zero weight in every COM/Kabsch
# computation while its charge participates fully in the
# electrostatics (pads are marked by mol_id, never by mass).
TIP4P2005_SIGMA_OO = 3.1589
TIP4P2005_EPS_OO = 93.2         # K (epsilon / kB)
TIP4P2005_Q_H = 0.5564
TIP4P2005_Q_M = -2.0 * TIP4P2005_Q_H
TIP4P2005_R_OH = 0.9572
TIP4P2005_THETA = 104.52
TIP4P2005_R_OM = 0.1546


def tip4p_body_frame(r_oh, theta_deg, r_om):
    """Rigid 4-site template (O, H, H, M) with the MASS center at the
    origin; M sits on the HOH bisector (+z side, toward the hydrogens)."""
    th = np.deg2rad(theta_deg) / 2.0
    o = np.array([0.0, 0.0, 0.0])
    h1 = np.array([r_oh * np.sin(th), 0.0, r_oh * np.cos(th)])
    h2 = np.array([-r_oh * np.sin(th), 0.0, r_oh * np.cos(th)])
    mm = np.array([0.0, 0.0, r_om])
    pts = np.stack([o, h1, h2, mm])
    m = np.array([MASS_O, MASS_H, MASS_H, 0.0])
    com = (pts * m[:, None]).sum(0) / m.sum()
    return pts - com


# TIP4P-Ew (Horn et al. 2004) and TIP4P/Ice (Abascal et al. 2005):
# the same 4-site topology reparameterized for Ewald liquids and for
# ice phases / melting respectively.  eps in K = kJ/mol * 120.272...
TIP4PEW_SIGMA_OO = 3.16435
TIP4PEW_EPS_OO = 0.680946 * 120.272236695     # 81.90 K
TIP4PEW_Q_H = 0.52422
TIP4PEW_R_OM = 0.125

TIP4PICE_SIGMA_OO = 3.1668
TIP4PICE_EPS_OO = 0.882169 * 120.272236695    # 106.1 K
TIP4PICE_Q_H = 0.5897
TIP4PICE_R_OM = 0.1577


def _tip4p_system(n_mol, sigma, eps, q_h, r_om, name):
    body = np.broadcast_to(
        tip4p_body_frame(TIP4P2005_R_OH, TIP4P2005_THETA, r_om),
        (n_mol, 4, 3)).copy()
    masses = np.broadcast_to(np.array([MASS_O, MASS_H, MASS_H, 0.0]),
                             (n_mol, 4)).copy()
    charges = np.broadcast_to(
        np.array([0.0, q_h, q_h, -2.0 * q_h]), (n_mol, 4)).copy()
    type_ids = np.broadcast_to(np.array([0, 1, 1, 1], np.int32),
                               (n_mol, 4)).copy()
    eps_t = np.array([[eps, 0.0], [0.0, 0.0]])
    sig_t = np.array([[sigma, 1.0], [1.0, 1.0]])
    return System(
        n_mol=n_mol, atoms_per_mol=4, body=body, masses=masses,
        charges=charges, type_ids=type_ids, eps_table=eps_t,
        sig_table=sig_t, name=name,
    )


@functools.lru_cache(maxsize=None)
def tip4p2005_system(n_mol):
    return _tip4p_system(n_mol, TIP4P2005_SIGMA_OO, TIP4P2005_EPS_OO,
                         TIP4P2005_Q_H, TIP4P2005_R_OM, "tip4p2005")


@functools.lru_cache(maxsize=None)
def tip4pew_system(n_mol):
    return _tip4p_system(n_mol, TIP4PEW_SIGMA_OO, TIP4PEW_EPS_OO,
                         TIP4PEW_Q_H, TIP4PEW_R_OM, "tip4pew")


@functools.lru_cache(maxsize=None)
def tip4pice_system(n_mol):
    return _tip4p_system(n_mol, TIP4PICE_SIGMA_OO, TIP4PICE_EPS_OO,
                         TIP4PICE_Q_H, TIP4PICE_R_OM, "tip4pice")


def spce_from_nist(path):
    """Load a NIST SPC/E sample configuration as (system, coords, com, box).

    coords (A,3) and com (M,3) are float64 NumPy; intramolecular wrapping
    in the stored files is healed with minimum image when computing COMs.
    """
    coords, species, box = read_nist(path)
    assert species[0] == "O" and species[1] == "H"
    n_mol = len(species) // 3
    system = spce_system(n_mol)
    mp = coords.reshape(n_mol, 3, 3)
    # heal PBC-split molecules relative to O before mass-weighting
    rel = mp - mp[:, :1, :]
    rel = rel - box * np.round(rel / box)
    m = np.array([MASS_O, MASS_H, MASS_H])
    com = mp[:, 0, :] + (rel * m[None, :, None]).sum(1) / m.sum()
    return system, coords, com, box
