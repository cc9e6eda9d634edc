"""Build simulation Systems from GROMACS topologies + PDB templates.

Capability parity with the reference's setup pipeline (`Ewald/main.jl:
158-186`: ReadTopFile -> ReadPDB -> BodyFixed -> MakeAtomArrays ->
MakeTables with Lorentz-Berthelot mixing and kJ/mol->K, nm->Angstrom unit
fixups), generalized to MIXED SPECIES: molecules of different sizes are
padded to a common atom-slot width with zero-mass, zero-charge,
zero-epsilon slots that contribute exactly zero energy — no masking
needed in the kernels.
"""

from typing import Dict, List, Optional, Tuple

import numpy as np

from metropolismontecarlo_tpu.io.topology import FFTopology, lorentz_berthelot
from metropolismontecarlo_tpu.models.system import System
from metropolismontecarlo_tpu.utils.constants import KJ_PER_MOL_TO_K, NM_TO_ANGSTROM

PAD_TYPE = "__pad__"


def body_frame_from_template(coords, masses):
    """Template coords (P,3) -> COM-at-origin body frame."""
    m = np.asarray(masses, float)
    com = (coords * m[:, None]).sum(0) / m.sum()
    return coords - com


def system_from_topology(
    top: FFTopology,
    templates: Dict[str, np.ndarray],
    molecules: Optional[List[Tuple[str, int]]] = None,
    name: str = "topology",
) -> System:
    """Assemble a System.

    templates: moltype name -> (P_i, 3) template coordinates (Angstrom),
    e.g. from io.pdb.read_pdb on the reference's tip3p.pdb / mea.pdb.
    molecules: optional [(moltype, count)] override of the topology's
    [molecules] section.
    """
    molecules = molecules or top.molecules
    used_mols = [nm for nm, cnt in molecules if cnt > 0]

    # LJ type registry: the union of atom types used, + one padding type
    type_names: List[str] = []
    for nm in used_mols:
        for (tname, _q, _m, _an) in top.mol_types[nm].atoms:
            if tname not in type_names:
                type_names.append(tname)
    type_names.append(PAD_TYPE)
    t_index = {t: i for i, t in enumerate(type_names)}
    T = len(type_names)

    sig_a = np.ones(T)   # Angstrom; pad sigma=1 avoids 0/0
    eps_k = np.zeros(T)  # Kelvin
    for t, i in t_index.items():
        if t == PAD_TYPE:
            continue
        at = top.atom_types[t]
        sig_a[i] = at.sigma_nm * NM_TO_ANGSTROM
        eps_k[i] = at.epsilon_kj * KJ_PER_MOL_TO_K

    comb = int(top.defaults.get("comb_rule", 2))
    eps_table = np.zeros((T, T))
    sig_table = np.ones((T, T))
    for i in range(T):
        for j in range(T):
            s, e = lorentz_berthelot(sig_a[i], eps_k[i], sig_a[j], eps_k[j], comb)
            sig_table[i, j] = s
            eps_table[i, j] = e
    # padding type interacts with nothing
    eps_table[t_index[PAD_TYPE], :] = 0.0
    eps_table[:, t_index[PAD_TYPE]] = 0.0

    p_max = max(len(top.mol_types[nm].atoms) for nm in used_mols)

    bodies, masses, charges, type_ids, species = [], [], [], [], []
    for mol_name, count in molecules:
        if count <= 0:
            continue
        mt = top.mol_types[mol_name]
        p = len(mt.atoms)
        tmpl = np.asarray(templates[mol_name], float)
        if tmpl.shape != (p, 3):
            raise ValueError(
                f"template for {mol_name} has shape {tmpl.shape}, "
                f"topology expects ({p}, 3)"
            )
        m = np.array([a[2] for a in mt.atoms])
        q = np.array([a[1] for a in mt.atoms])
        t = np.array([t_index[a[0]] for a in mt.atoms], np.int32)
        body = body_frame_from_template(tmpl, m)
        # per-molecule arrays stay padded to p_max (shape regularity);
        # the ATOM axis is ragged — the species metadata below makes each
        # molecule own only its p real atom columns (System docstring)
        bp = np.zeros((p_max, 3)); bp[:p] = body
        mp = np.zeros(p_max); mp[:p] = m
        qp = np.zeros(p_max); qp[:p] = q
        tp = np.full(p_max, t_index[PAD_TYPE], np.int32); tp[:p] = t
        for _ in range(count):
            bodies.append(bp); masses.append(mp); charges.append(qp)
            type_ids.append(tp)
        species.append((mol_name, count, p))

    return System(
        n_mol=len(bodies),
        atoms_per_mol=p_max,
        body=np.asarray(bodies),
        masses=np.asarray(masses),
        charges=np.asarray(charges),
        type_ids=np.asarray(type_ids, np.int32),
        eps_table=eps_table,
        sig_table=sig_table,
        name=name,
        species=tuple(species),
    )


def templates_from_pdbs(top: FFTopology, pdb_by_mol: Dict[str, str]):
    """Load per-moltype templates from PDB files (first `P` atoms of each)."""
    from metropolismontecarlo_tpu.io.pdb import read_pdb

    out = {}
    for mol_name, path in pdb_by_mol.items():
        p = len(top.mol_types[mol_name].atoms)
        data = read_pdb(path)
        out[mol_name] = data["coords"][:p]
    return out
