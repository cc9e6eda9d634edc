"""Rigid linear molecules: TraPPE CO2 and N2 system builders.

A new geometric class for the engine (the reference's rigid bodies are
all bent 3-site or larger, `Ewald/structs.jl:217-245`): collinear sites
whose inertia tensor is rank-2.  Nothing in the move path cares — the
quaternion machinery rotates arbitrary point sets, and the Kabsch fit
(`ops/quaternions.py:fit_quaternions`) remains exact for rank-1 site
clouds because the det-sign-corrected SVD still maps the body axis onto
the observed axis.  Rotations about the molecular axis are identity
operations that sample nothing, which is statistically harmless (they
are self-moves accepted with probability 1 in the limit, and the
adaptive controller sees ordinary off-axis proposals).

Parameters are the published TraPPE values (Potoff & Siepmann, AIChE J.
47, 1676 (2001)):

* CO2 — 3 LJ sites, C-O bond 1.16 A, linear; eps_C/k 27.0 K sig_C
  2.80 A, eps_O/k 79.0 K sig_O 3.05 A, q_C +0.70 e, q_O -0.35 e,
  Lorentz-Berthelot C-O cross terms.
* N2 — 2 LJ sites at +-0.55 A (N-N 1.10 A), eps_N/k 36.0 K sig_N
  3.31 A, q_N -0.482 e, plus a MASSLESS charge site at the COM with
  q_M +0.964 e (same zero-mass virtual-site mechanics as the TIP4P M
  site: zero weight in COM/Kabsch, full participation in
  electrostatics).
"""

import functools

import numpy as np

from metropolismontecarlo_tpu.models.system import System

MASS_C = 12.011
MASS_O = 15.999
MASS_N = 14.007

# TraPPE CO2
CO2_R_CO = 1.16          # Angstrom
CO2_EPS_C = 27.0         # K
CO2_SIG_C = 2.80         # Angstrom
CO2_EPS_O = 79.0
CO2_SIG_O = 3.05
CO2_Q_C = 0.70           # e
CO2_Q_O = -0.35

# TraPPE N2
N2_R_NN = 1.10
N2_EPS_N = 36.0
N2_SIG_N = 3.31
N2_Q_N = -0.482
N2_Q_M = 0.964


def _lb_tables(eps, sig):
    """Lorentz-Berthelot (T, T) pair tables from per-type (eps_i, sig_i);
    zero-eps entries stay zero rows/columns (pad types)."""
    eps = np.asarray(eps, np.float64)
    sig = np.asarray(sig, np.float64)
    eps_t = np.sqrt(eps[:, None] * eps[None, :])
    sig_t = 0.5 * (sig[:, None] + sig[None, :])
    # pad types (eps 0) must also carry a harmless sigma so the
    # distance-floored r^-12 of a coincident pad pair stays finite-huge
    # rather than 0*inf (see CLAUDE.md numeric contract)
    sig_t = np.where(eps_t > 0.0, sig_t, 1.0)
    return eps_t, sig_t


def co2_body_frame():
    """(3, 3) body template (C, O, O) along z, COM at the origin (which
    is the carbon, by symmetry)."""
    pts = np.array([[0.0, 0.0, 0.0],
                    [0.0, 0.0, +CO2_R_CO],
                    [0.0, 0.0, -CO2_R_CO]])
    m = np.array([MASS_C, MASS_O, MASS_O])
    com = (pts * m[:, None]).sum(0) / m.sum()
    return pts - com


@functools.lru_cache(maxsize=None)
def co2_system(n_mol):
    """TraPPE CO2: uniform 3-site linear species, two LJ types."""
    body = np.broadcast_to(co2_body_frame(), (n_mol, 3, 3)).copy()
    masses = np.broadcast_to(np.array([MASS_C, MASS_O, MASS_O]),
                             (n_mol, 3)).copy()
    charges = np.broadcast_to(np.array([CO2_Q_C, CO2_Q_O, CO2_Q_O]),
                              (n_mol, 3)).copy()
    type_ids = np.broadcast_to(np.array([0, 1, 1], np.int32),
                               (n_mol, 3)).copy()
    eps_t, sig_t = _lb_tables([CO2_EPS_C, CO2_EPS_O, 0.0],
                              [CO2_SIG_C, CO2_SIG_O, 1.0])
    return System(n_mol=n_mol, atoms_per_mol=3, body=body, masses=masses,
                  charges=charges, type_ids=type_ids, eps_table=eps_t,
                  sig_table=sig_t, name="co2")


def co2_n2_system(n_co2, n_n2):
    """TraPPE CO2 + N2 two-species-block mixture (both P = 3): the
    flue-gas separation pair, with Lorentz-Berthelot cross terms over
    the union type set [C, O(CO2), N, charge-site/pad].  Species blocks
    (("co2", n_co2, 3), ("n2", n_n2, 3)) — directly usable by the
    two-block ensembles (mc/gcmc_binary.py, mc/gcmc_osmotic.py)."""
    M = n_co2 + n_n2
    body = np.concatenate(
        [np.broadcast_to(co2_body_frame(), (n_co2, 3, 3)),
         np.broadcast_to(n2_body_frame(), (n_n2, 3, 3))])
    masses = np.concatenate(
        [np.broadcast_to(np.array([MASS_C, MASS_O, MASS_O]), (n_co2, 3)),
         np.broadcast_to(np.array([MASS_N, MASS_N, 0.0]), (n_n2, 3))])
    charges = np.concatenate(
        [np.broadcast_to(np.array([CO2_Q_C, CO2_Q_O, CO2_Q_O]),
                         (n_co2, 3)),
         np.broadcast_to(np.array([N2_Q_N, N2_Q_N, N2_Q_M]), (n_n2, 3))])
    type_ids = np.concatenate(
        [np.broadcast_to(np.array([0, 1, 1], np.int32), (n_co2, 3)),
         np.broadcast_to(np.array([2, 2, 3], np.int32), (n_n2, 3))])
    eps_t, sig_t = _lb_tables([CO2_EPS_C, CO2_EPS_O, N2_EPS_N, 0.0],
                              [CO2_SIG_C, CO2_SIG_O, N2_SIG_N, 1.0])
    return System(n_mol=M, atoms_per_mol=3, body=body.copy(),
                  masses=masses.copy(), charges=charges.copy(),
                  type_ids=type_ids.copy(), eps_table=eps_t,
                  sig_table=sig_t, name="co2+n2",
                  species=(("co2", n_co2, 3), ("n2", n_n2, 3)))


def n2_body_frame():
    """(3, 3) body template (N, N, M) along z; the M charge site is
    massless and sits exactly at the COM (bond midpoint)."""
    return np.array([[0.0, 0.0, +0.5 * N2_R_NN],
                     [0.0, 0.0, -0.5 * N2_R_NN],
                     [0.0, 0.0, 0.0]])


@functools.lru_cache(maxsize=None)
def n2_system(n_mol):
    """TraPPE N2: 2 LJ sites + massless COM charge site (type 1 is the
    zero-eps charge-only type, doubling as the pad type)."""
    body = np.broadcast_to(n2_body_frame(), (n_mol, 3, 3)).copy()
    masses = np.broadcast_to(np.array([MASS_N, MASS_N, 0.0]),
                             (n_mol, 3)).copy()
    charges = np.broadcast_to(np.array([N2_Q_N, N2_Q_N, N2_Q_M]),
                              (n_mol, 3)).copy()
    type_ids = np.broadcast_to(np.array([0, 0, 1], np.int32),
                               (n_mol, 3)).copy()
    eps_t, sig_t = _lb_tables([N2_EPS_N, 0.0], [N2_SIG_N, 1.0])
    return System(n_mol=n_mol, atoms_per_mol=3, body=body, masses=masses,
                  charges=charges, type_ids=type_ids, eps_table=eps_t,
                  sig_table=sig_t, name="n2")
