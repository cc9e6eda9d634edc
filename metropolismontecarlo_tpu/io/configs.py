"""Starting-configuration readers and generators (host-side NumPy).

Capability parity with reference `Ewald/initialConfigurations.jl`:
  * ReadNIST  (:282-355) — NIST SPC/E sample configurations
  * ReadCNF   (:239-280) — Allen & Tildesley CNF format (COM + quaternion)
  * InitCubicGrid (:10-53) / Initialize (:106-158) — lattice starts

All readers return NumPy float64; device placement and dtype selection
happen in the model factories.
"""

import numpy as np


def read_nist(path):
    """Read a NIST SPC/E sample configuration.

    Format (reference `Ewald/spce_sample_config_periodic1.txt:1-2`):
      line 1: box lengths (x y z, cubic);  line 2: number of molecules;
      then one line per atom: index x y z species(O|H), molecules grouped
      O,H,H.

    Returns (coords (A,3) float64 Angstrom, species list[str], box float).
    """
    with open(path) as f:
        lines = [ln for ln in (l.strip() for l in f) if ln]
    box = float(lines[0].split()[0])
    n_mol = int(lines[1].split()[0])
    coords, species = [], []
    for ln in lines[2 : 2 + 3 * n_mol]:
        parts = ln.split()
        coords.append([float(parts[1]), float(parts[2]), float(parts[3])])
        species.append(parts[4])
    return np.asarray(coords, dtype=np.float64), species, box


def read_cnf(path):
    """Read an Allen & Tildesley CNF configuration (COM + quaternion).

    Format (reference `Poly/cnf_input.inp:1-2`): line 1: N molecules,
    line 2: box length, then per molecule: x y z qw qx qy qz.

    Returns (com (M,3), quat (M,4), box) float64.
    """
    with open(path) as f:
        lines = [ln for ln in (l.strip() for l in f) if ln]
    n = int(lines[0].split()[0])
    box = float(lines[1].split()[0])
    rows = np.asarray(
        [[float(x) for x in lines[2 + i].split()] for i in range(n)],
        dtype=np.float64,
    )
    return rows[:, 0:3], rows[:, 3:7], box


def write_cnf(path, com, quat, box):
    """Write an Allen & Tildesley CNF configuration (COM + quaternion) —
    the symmetric counterpart of read_cnf, covering the reference's
    `PrintOutput` role (`Ewald/initialConfigurations.jl:183-237`, whose
    format the reference itself cannot read back)."""
    com = np.asarray(com)
    quat = np.asarray(quat)
    with open(path, "w") as f:
        f.write(f"{com.shape[0]:>13d}\n")
        f.write(f"{float(box):>15.8f}\n")
        for c, q in zip(com, quat):
            f.write("".join(f"{v:>15.10f}" for v in (*c, *q)) + "\n")


def cubic_lattice(n_mol, box, jitter=0.0, rng=None):
    """Simple-cubic lattice of n_mol sites in a cubic box (reference
    `InitCubicGrid`, `Ewald/initialConfigurations.jl:10-53`)."""
    n_side = int(np.ceil(n_mol ** (1.0 / 3.0)))
    spacing = box / n_side
    idx = np.arange(n_side)
    grid = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), axis=-1).reshape(-1, 3)
    pts = (grid[:n_mol] + 0.5) * spacing
    if jitter:
        rng = rng or np.random.default_rng(0)
        pts = pts + rng.uniform(-jitter, jitter, size=pts.shape)
    return pts.astype(np.float64)
