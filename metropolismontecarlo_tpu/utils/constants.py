"""Physical constants and unit conventions.

Unit system (matching the reference's Ewald generation, cf. reference
`Ewald/constants.jl:24-28`): distances in Angstrom, energies in Kelvin
(E/kB), charges in elementary-charge units.  The Coulomb conversion factor
is e^2/(4 pi eps0 kB) in K*Angstrom so that q_i q_j * FACTOR / r_ij is an
energy in Kelvin.

CODATA-2018 exact SI values are used.
"""

import math

# CODATA 2018 (exact, post-2019 SI redefinition)
ELEMENTARY_CHARGE = 1.602176634e-19  # C
BOLTZMANN = 1.380649e-23  # J/K
AVOGADRO = 6.02214076e23  # 1/mol
EPS0 = 8.8541878128e-12  # F/m  (CODATA 2018 measured)

# e^2/(4 pi eps0) in J*m -> J*Angstrom -> K*Angstrom
_E2_OVER_4PIEPS0_JM = ELEMENTARY_CHARGE**2 / (4.0 * math.pi * EPS0)
COULOMB_FACTOR = _E2_OVER_4PIEPS0_JM * 1.0e10 / BOLTZMANN  # ~1.671009e5 K*Angstrom

# kJ/mol -> K  (used when reading GROMACS force fields whose epsilons are kJ/mol)
KJ_PER_MOL_TO_K = 1000.0 / (AVOGADRO * BOLTZMANN)  # ~120.272

# GROMACS lengths are nm; we work in Angstrom
NM_TO_ANGSTROM = 10.0
