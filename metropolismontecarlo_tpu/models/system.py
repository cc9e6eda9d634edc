"""System description and simulation state.

The reference holds its state in mutable StructArrays (`soa`/`moa`,
`Ewald/structs.jl:283-321`) updated in place.  The TPU-native design splits
that into:

* `System` — static structure & force field (shapes, body frames, charge/
  type tables).  A plain frozen dataclass of host arrays; jitted programs
  close over it, so its contents are compile-time constants.
* `RunParams` — static run configuration (temperature, cutoffs, move
  probabilities, Coulomb style...).  Honors the reference's own TODO of a
  real config layer (`Ewald/main.jl:49`).
* `SimState` — the per-chain dynamic state threaded through `lax.scan`:
  every field has a leading chains axis `C` and the whole thing is a
  pytree (NamedTuple), so accept/reject is `jnp.where` selection and
  checkpointing is one tree flatten.

Molecules are uniform-width: every molecule has `P` atom slots; mixed
species (e.g. TIP3P water + MEA) pad smaller molecules with slots of zero
mass, zero charge, and a zero-epsilon LJ type, which contribute exactly
zero energy without any masking in the kernels.
"""

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True, eq=False)
class System:
    """Static structure + force field (host arrays, closed over by jit).

    `eq=False` keeps identity hashing so a System instance can be a
    static jit argument.

    Reference analogue: FFParameters/Tables/soa/moa construction in
    `Ewald/setup.jl:446-673`.
    """

    n_mol: int                 # M
    atoms_per_mol: int         # P (padded width)
    body: np.ndarray           # (M, P, 3) body-fixed coords (COM at origin)
    masses: np.ndarray         # (M, P); 0.0 marks padding slots
    charges: np.ndarray        # (M, P)
    type_ids: np.ndarray       # (M, P) int32 LJ-type index
    eps_table: np.ndarray      # (T, T) epsilon_ij in K (pre-mixed)
    sig_table: np.ndarray      # (T, T) sigma_ij in Angstrom
    name: str = "system"

    @property
    def n_atoms(self):
        return self.n_mol * self.atoms_per_mol

    @property
    def n_atoms_padded(self):
        """Atom-axis storage width: n_atoms rounded up to a TPU lane
        multiple.  Pad columns hold dummy atoms (molecule id -1, zero
        charge, pad LJ type) that every kernel excludes by mask."""
        gran = 256 if self.n_atoms >= 256 else 128
        return -(-self.n_atoms // gran) * gran

    @property
    def mol_of_atom_padded(self):
        """(A_pad,) molecule index per atom column; -1 marks padding."""
        out = np.full(self.n_atoms_padded, -1, np.int32)
        out[: self.n_atoms] = np.repeat(
            np.arange(self.n_mol, dtype=np.int32), self.atoms_per_mol)
        return out

    @property
    def is_uniform(self):
        """True when every molecule shares one body/charge/type pattern
        (enables the mega kernel and static per-row work flags)."""
        t = np.asarray(self.type_ids)
        q = np.asarray(self.charges)
        b = np.asarray(self.body)
        return bool((t == t[0]).all() and (q == q[0]).all()
                    and np.allclose(b, b[0]))

    @property
    def tid_row_padded(self):
        """(A_pad,) per-atom LJ type id; -1 marks lane padding."""
        out = np.full(self.n_atoms_padded, -1, np.int64)
        out[: self.n_atoms] = self.type_ids.reshape(-1)
        return out

    @property
    def type_counts(self):
        t = np.zeros(self.eps_table.shape[0])
        np.add.at(t, self.type_ids.reshape(-1), 1.0)
        return t

    def flat(self, arr):
        """(M, P, ...) -> (A, ...)."""
        return arr.reshape((self.n_atoms,) + arr.shape[2:])


@dataclasses.dataclass(frozen=True)
class RunParams:
    """Static run configuration (compile-time constants)."""

    temperature: float = 298.15       # K (or reduced units)
    r_cut: float = 10.0               # LJ cutoff, Angstrom
    qq_r_cut: Optional[float] = None  # real-space Coulomb cutoff (default r_cut)
    cutoff_mode: str = "site"         # "site" | "com" | "first" (see ops.pairs)
    lj_shift: str = "none"            # "none" | "linear" (ops.lj)
    use_lrc: bool = True              # LJ tail corrections
    coulomb: str = "none"             # "none" | "ewald" | "wolf" | "bare"
    kappa_L: float = 5.6              # Ewald/Wolf damping: kappa = kappa_L / box
    nk: int = 5                       # Ewald k-space range
    ksq_max: int = 27                 # 0 < |k|^2 < ksq_max (integer units)
    p_translate: float = 0.5          # move-type probability (rest: rotation)
    dr_max: float = 0.3               # initial max displacement, Angstrom
    dphi_max: float = 0.05            # initial max rotation angle, rad
    move_accept: float = 0.5          # adaptive-step target acceptance
    d2_overlap: float = 0.5           # hard-overlap veto distance^2
    # NPT (pressure in K/Angstrom^3 i.e. P/kB; NVT if pressure is None)
    pressure: Optional[float] = None
    p_volume: float = 0.0             # probability of a volume move
    dv_max: float = 0.05              # max fractional ln-volume step
    # molecule-level Verlet neighbor lists (EXPERIMENTAL, jnp path only):
    # nlist_width = max neighbor molecules kept per molecule (0 = off);
    # lists rebuild every sweep with radius max(r_cut, qq_cut) +
    # nlist_skin + 2*max-atom-to-COM-distance; exact while
    # dr_max <= nlist_skin/2, and overflow is detected at block
    # boundaries.  MEASURED on TPU v5e: per-chain dynamic gathers are
    # ~20x SLOWER than the dense Pallas kernels, so this is a
    # correctness-validated reference implementation; the TPU-native
    # sparsity plan is spatially SORTED molecule storage (contiguous
    # neighbor slabs), future work.
    nlist_width: int = 0
    nlist_skin: float = 2.0

    @property
    def qq_cut(self):
        return self.r_cut if self.qq_r_cut is None else self.qq_r_cut


class SimState(NamedTuple):
    """Per-chain dynamic MC state (all fields lead with the chains axis C)."""

    com: jnp.ndarray        # (C, M, 3) molecular centers of mass
    quat: jnp.ndarray       # (C, M, 4) orientations
    coords: jnp.ndarray     # (C, 3, A) atom positions, TRANSPOSED layout:
                            #   atoms on the minor (lane) axis so dense
                            #   pair grids and Pallas tiles are (8,128)-
                            #   shaped without padding waste (A = M*P)
    box: jnp.ndarray        # (C,) box edge length
    sfac: jnp.ndarray       # (C, K, 2) Ewald structure factors ([re, im]); (C,1,2) dummy otherwise
    energy: jnp.ndarray     # (C,) running total potential energy (K)
    virial: jnp.ndarray     # (C,) running molecular virial sum(rij.fij)
    key: jnp.ndarray        # (C, 2) uint32 per-chain RNG keys
    temp: jnp.ndarray       # (C,) per-chain temperature (REMC ladders, annealing)
    step: jnp.ndarray       # () int32 global move counter (RNG stream position)
    dr_max: jnp.ndarray     # (C,) adaptive max translation
    dphi_max: jnp.ndarray   # (C,) adaptive max rotation
    dv_max: jnp.ndarray     # (C,) adaptive max volume step
    acc: jnp.ndarray        # (C, 3) int32 accepted [trans, rot, vol] since adjust
    att: jnp.ndarray        # (C, 3) int32 attempted [trans, rot, vol] since adjust
    nbr: jnp.ndarray        # (C, M, NB) int32 neighbor-molecule lists
                            #   (self-index padded; (C,1,1) dummy when off)
    nbr_needed: jnp.ndarray  # (C,) int32 running max molecules within the
                            #   list radius (overflow detection)
