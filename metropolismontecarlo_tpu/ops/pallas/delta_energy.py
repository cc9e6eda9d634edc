"""Fused per-move delta-energy Pallas TPU kernel.

Computes, for every chain, the interaction energy of one molecule's OLD
and NEW atom positions against all atoms — LJ + real-space Coulomb
(erfc/Wolf/bare) + cutoff masking + hard-overlap detection — in a single
pass over the coordinate planes.  This is the hot op of the whole
framework (reference counterpart: the `LJ_poly_ΔU` + `EwaldReal` pair
loops, `Ewald/energy.jl:209-290`, `Ewald/ewalds.jl:293-376`).

Shapes and layout (all compute is (cb chains, L atoms) VPU tiles):
  * coordinate planes x/y/z: (C, A) f32 — chains on sublanes, atoms on
    lanes; a grid cell processes cb chains x one L-wide atom tile (big
    cells: per-cell grid overhead dominates small ones).
  * the moved-atom axis is a STATIC unrolled loop over 2P rows
    ([P old; P new]); per-row LJ/charge work is skipped entirely at trace
    time when the system is molecule-uniform and the row's type has no
    LJ (e.g. water H sites) or no charge.
  * per-pair LJ parameters are reconstructed IN-KERNEL from the per-atom
    type row ((1, L) selects, T unrolled) — the only O(A) inputs besides
    coordinates are three static rows (type id, charge, molecule id).
  * grid is (C/CB, A/L); the atom-tile axis is innermost, accumulating
    into the (C, R) outputs (TPU grid order guarantees sequential
    revisiting of the output block).

Outputs: e_lj (C, R), e_coul (C, R), ovr (C, R) overlap counts on the
NEW rows.  Split old/new and sum outside.  e_coul excludes the Coulomb
unit factor (applied by the caller).

Lane-padding atoms carry molecule id -1 and are excluded by every mask;
distances are floored at 1e-4 A^2 so coincident pad/core pairs produce
large-but-finite f32 energies (guaranteed rejection, never NaN).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _recip_nr(x):
    """Fast reciprocal: hardware approximation + one Newton-Raphson step
    (~1e-7 relative), cheaper than a full-precision divide on the VPU."""
    y = pl.reciprocal(x, approx=True)
    return y * (2.0 - x * y)


def _erfc_f32(x):
    """Rational erfc, t*exp(-x^2 + poly7(t)) with t = 1/(1 + x/2):
    5.7e-7 relative error (f64) on x in [0, 4.2] — every reachable
    kappa*r with the in-range kappa_L conventions — degrading gracefully
    beyond (erfc(4.2) = 3e-9; -x^2 keeps the tail collapsing to 0, never
    inf).  In f32 the evaluation floor is exp(-x^2) rounding (~4e-6
    relative), identical to the classic degree-9 fit this replaces, so
    the two shorter fma steps are free accuracy-wise."""
    t = _recip_nr(1.0 + 0.5 * x)
    poly = (-1.2675331 + t * (1.0241885 + t * (0.26143169
            + t * (0.3302113 + t * (-0.25207224 + t * (-0.4289608
            + t * (0.45703287 + t * -0.12429877)))))))
    return t * jnp.exp(-x * x + poly)


def _kernel(coulomb, n_types, n_used, row_has_lj, row_has_q,
            d2_overlap, kappa_l, rc2, qrc2, wolf_rc, cb,
            # refs:
            m_ref, box_ref, mx_ref, my_ref, mz_ref, eps_ref, sig2_ref, q8_ref,
            tid_ref, molid_ref, q_ref, x_ref, y_ref, z_ref,
            elj_ref, ecoul_ref, ovr_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        elj_ref[:] = jnp.zeros_like(elj_ref)
        ecoul_ref[:] = jnp.zeros_like(ecoul_ref)
        ovr_ref[:] = jnp.zeros_like(ovr_ref)

    mm = m_ref[0, 0]
    tid_row = tid_ref[0:1, :]      # (1, L) f32 type codes
    mol_row = molid_ref[0:1, :]    # (1, L) f32 molecule ids
    q_row = q_ref[0:1, :]          # (1, L)
    # lane-padding atoms carry molecule id -1 and must never be included
    other = (mol_row != mm) & (mol_row >= 0.0)   # (1, L)

    box = box_ref[:, 0:1]          # (cb, 1) per-chain box
    inv_box = 1.0 / box
    kappa = kappa_l * inv_box      # (CB, 1)

    xs = x_ref[:]                  # (CB, L) coordinate tiles
    ys = y_ref[:]
    zs = z_ref[:]

    def row_param(table_ref, p):
        """(1, L): LJ parameter of moved row p against each lane's type."""
        acc = jnp.zeros_like(tid_row)
        for t in range(n_types):
            acc = jnp.where(tid_row == float(t), table_ref[p, t], acc)
        return acc

    for p in range(n_used):
        mxp = mx_ref[:, p].reshape(cb, 1)
        myp = my_ref[:, p].reshape(cb, 1)
        mzp = mz_ref[:, p].reshape(cb, 1)
        dx = xs - mxp
        dy = ys - myp
        dz = zs - mzp
        dx = dx - box * jnp.round(dx * inv_box)
        dy = dy - box * jnp.round(dy * inv_box)
        dz = dz - box * jnp.round(dz * inv_box)
        d2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-4)   # (CB, L)

        mask_lj = other & (d2 < rc2)
        use_q = coulomb != "none" and row_has_q[p]
        if use_q and qrc2 == rc2:   # static: shared cutoff
            mask_qq = mask_lj
            mask_any = mask_lj
        elif use_q:
            mask_qq = other & (d2 < qrc2)
            mask_any = mask_lj | mask_qq
        else:
            mask_any = mask_lj
        # one rsqrt serves both: 1/d2 = inv_r^2, r = d2*inv_r
        inv_r = jnp.where(mask_any, jax.lax.rsqrt(d2), 1.0)
        inv_d2 = inv_r * inv_r

        if row_has_lj[p]:
            s2 = row_param(sig2_ref, p) * inv_d2
            s6 = s2 * s2 * s2
            pot = (4.0 * row_param(eps_ref, p)) * (s6 * s6 - s6)
            elj = jnp.sum(jnp.where(mask_lj, pot, 0.0), axis=1)
            elj_ref[:, p] += elj

        if use_q:
            qq = q8_ref[p, 0] * q_row                          # (1, L)
            r = d2 * inv_r
            if coulomb == "ewald":
                cpair = qq * (_erfc_f32(kappa * r) * inv_r)
            elif coulomb == "wolf":
                shift = _erfc_f32(kappa * wolf_rc) / wolf_rc   # (CB, 1)
                cpair = qq * (_erfc_f32(kappa * r) * inv_r - shift)
            elif coulomb == "wolf_ref":  # reference convention: no
                # pairwise shift (global constant cancels in deltas)
                cpair = qq * (_erfc_f32(kappa * r) * inv_r)
            else:  # bare
                cpair = qq * inv_r
            ecoul = jnp.sum(jnp.where(mask_qq, cpair, 0.0), axis=1)
            ecoul_ref[:, p] += ecoul
            bad = (d2 < d2_overlap) & (qq < 0.0) & mask_qq
            ovr_ref[:, p] += jnp.sum(bad.astype(jnp.float32), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("coulomb", "n_types", "n_used", "row_has_lj",
                     "row_has_q", "d2_overlap", "kappa_l", "rc2", "qrc2",
                     "wolf_rc", "l_tile", "cb", "interpret"),
)
def delta_energy_pallas(x, y, z, mx, my, mz, box, m, eps_pt, sig2_pt, q8,
                        tid_row, molid_row, q_row, *, coulomb, n_types,
                        n_used, row_has_lj, row_has_q, d2_overlap, kappa_l,
                        rc2, qrc2, wolf_rc=1.0, l_tile=4096, cb=32,
                        interpret=False):
    """Batched fused delta energies.

    x/y/z: (C, A) f32 coordinate planes (A padded to a lane multiple).
    mx/my/mz: (C, R) moved-atom coordinates ([P old; P new; pad]).
    box: (C,); m: () moved molecule index.
    eps_pt/sig2_pt: (R, T_pad) per-moved-row LJ params vs lane type.
    q8: (R,) moved-atom charges.  tid_row/molid_row/q_row: (A,) statics.
    n_used: number of live rows (2P).  row_has_lj/row_has_q: per-row
    static work flags (tuples, length R).
    Returns (e_lj (C, R), e_coul (C, R), ovr (C, R)).
    """
    C, A = x.shape
    n_rows = mx.shape[1]
    L = next(l for l in (min(l_tile, A), 2048, 1024, 512, 256, 128)
             if A % l == 0)
    cb = next(b for b in (min(cb, C), 16, 8) if C % b == 0)
    grid = (C // cb, A // L)

    t_pad = eps_pt.shape[1]
    kern = functools.partial(_kernel, coulomb, n_types, n_used, row_has_lj,
                             row_has_q, d2_overlap, kappa_l, rc2, qrc2,
                             wolf_rc, cb)

    plane = pl.BlockSpec((cb, L), lambda c, j: (c, j), memory_space=pltpu.VMEM)
    per_chain_r = pl.BlockSpec((cb, n_rows), lambda c, j: (c, 0),
                               memory_space=pltpu.VMEM)
    shared_row = pl.BlockSpec((1, L), lambda c, j: (0, j),
                              memory_space=pltpu.VMEM)
    shared_small = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda c, j: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((cb, n_rows), lambda c, j: (c, 0),
                            memory_space=pltpu.VMEM)

    e_lj, e_coul, ovr = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda c, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((cb, 1), lambda c, j: (c, 0), memory_space=pltpu.VMEM),
            per_chain_r, per_chain_r, per_chain_r,      # mx, my, mz
            shared_small(n_rows, t_pad),                # eps_pt
            shared_small(n_rows, t_pad),                # sig2_pt
            shared_small(n_rows, 1),                    # q8
            shared_row, shared_row, shared_row,         # tid, molid, q
            plane, plane, plane,                        # x, y, z
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((C, n_rows), jnp.float32),
            jax.ShapeDtypeStruct((C, n_rows), jnp.float32),
            jax.ShapeDtypeStruct((C, n_rows), jnp.float32),
        ),
        interpret=interpret,
    )(
        m.reshape(1, 1).astype(jnp.float32),
        box.reshape(C, 1).astype(jnp.float32),
        mx, my, mz,
        eps_pt, sig2_pt, q8.reshape(n_rows, 1),
        tid_row.reshape(1, A), molid_row.reshape(1, A), q_row.reshape(1, A),
        x, y, z,
    )
    return e_lj, e_coul, ovr
