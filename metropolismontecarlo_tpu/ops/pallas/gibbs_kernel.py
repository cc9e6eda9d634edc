"""Two-box Gibbs-ensemble mega-kernel: both boxes of every chain live
in ONE row, transfers run in-kernel.

The round-3 muVT kernel (sweep_kernel.py n_exch) eliminated the jnp
exchange scan that dominated the grand-canonical cycle (12.9x measured).
Gibbs transfers had the same bottleneck shape but couple TWO boxes, so
the folded (C, 2, ...) -> (2C, ...) sweep layout cannot host them: a
transfer deletes from one chain row and inserts into another.  This
kernel uses the round-4 layout instead — ONE chain row holds BOTH boxes:

  * atom planes are (C, 2*A_off): box 0 columns [0, A_off), box 1
    columns [A_off, 2*A_off), each half padded to the lane granule so
    every per-box slice is 128-aligned and static;
  * molecule planes are (C, 2*m_off) with PLANE-INDEXED molecule ids
    (box 1 slot j has id m_off + j) so slot ids, activity columns and
    atom-column arithmetic stay consistent with the muVT kernel's
    full-row one-hot machinery;
  * per-chain box lengths are a (C, 2) operand; each box keeps its own
    structure-factor planes and reciprocal coefficients (kappa =
    kappa_L / L differs between boxes — the box-dependent transfer
    constants that must NOT cancel, see mc/gibbs_mol.py).

The displacement/rotation sweep runs one fori_loop per box with that
box's constants and a STATIC half-plane pair scan (same cost as the
folded layout — no masking waste).  Each transfer attempt then picks a
direction (50/50), a uniform active molecule of the source box (argmax
of per-lane uniforms — the muVT trick), the first free slot of the
destination box, a fresh Shoemake pose uniform in the destination
volume, and accepts with

    min[1, N_s V_d / ((N_d + 1) V_s) exp(-beta (dU_d + dU_s))]

entirely in log space, where dU_d/dU_s carry each box's pair +
reciprocal deltas and its OWN self/intra + reference-Wolf constants
(`mc/gibbs_mol.py:239-248` is the jnp counterpart; reference has no
Gibbs ensemble at all — the method is Panagiotopoulos 1987, Frenkel &
Smit ch. 8).  Volume exchanges stay on the jnp path (rare, full-
recompute moves, like NPT).

Mosaic rules honored throughout (see sweep_kernel.py): no dynamic lane
bases except 128-aligned windows, no jnp.where on bools ((a & c) |
(~a & d) instead), uint32 bridged via int32, overlap vetoes ride the
energy as finite +1e30 penalties.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metropolismontecarlo_tpu.ops.pallas.delta_energy import _erfc_f32
from metropolismontecarlo_tpu.ops.pallas.sweep_kernel import (
    _sincos_npi,
    _uniform,
)
from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR

_TWO_PI = 6.283185307179586
_FACTOR = float(COULOMB_FACTOR)


def _rot_apply(w, xq, yq, zq, bx, by, bz):
    """R(q) @ b for (cb, 1) quaternion columns, scalar body (the
    sweep kernel's in-move rotation, lifted to module scope)."""
    ww, xx, yy, zz = w * w, xq * xq, yq * yq, zq * zq
    wx, wy, wz = w * xq, w * yq, w * zq
    xy, xz, yz = xq * yq, xq * zq, yq * zq
    ox = (ww + xx - yy - zz) * bx + 2.0 * ((xy - wz) * by + (xz + wy) * bz)
    oy = (ww - xx + yy - zz) * by + 2.0 * ((xy + wz) * bx + (yz - wx) * bz)
    oz = (ww - xx - yy + zz) * bz + 2.0 * ((xz - wy) * bx + (yz + wx) * by)
    return ox, oy, oz


def _make_gibbs_kernel(M, P, coulomb, n_types, has_lj, has_q, rc2, qrc2,
                       kappa_l, d2_overlap, p_translate, use_rot, K,
                       lj_shift, n_exch, m_start, a_start):
    """Kernel body builder; M is the PER-BOX slot capacity of ONE
    species BLOCK whose box-0 slots are [m_start, m_start+M) with atom
    columns starting at a_start (box-1 ids/columns offset by
    m_off/A_off) — m_start=a_start=0 with M = per-box capacity for a
    uniform system; a binary mixture runs one call per species block
    with the activity planes threaded between calls (the muVT
    multi-block pattern, sweep_kernel.py).

    stats columns: [d_e0, d_e1, acc_trans, acc_rot, att_trans, att_rot,
    acc_transfer, unused] (att_transfer = n_exch statically)."""

    def kernel(*refs):
        (seed_ref, ckey_ref, body_ref, qp_ref, eps_pt_ref, sig2_pt_ref,
         lam1_pt_ref, lam2_pt_ref, tid_ref, molid_ref, qrow_ref,
         kx_ref, ky_ref, kz_ref, kw_ref,
         x_in, y_in, z_in, cx_in, cy_in, cz_in,
         qw_in, qx_in, qy_in, qz_in,
         sre0_in, sim0_in, sre1_in, sim1_in, act_in, actm_in,
         box2_ref, temp_ref, drmax_ref, dphi_ref, si2_ref, wc2_ref,
         stats_in,
         x_o, y_o, z_o, cx_o, cy_o, cz_o, qw_o, qx_o, qy_o, qz_o,
         sre0_o, sim0_o, sre1_o, sim1_o, act_o, actm_o, stats_o,
         eps_rows, sig2_rows, lam1_rows, lam2_rows,
         cfac0_s, cfac1_s) = refs
        cb = x_in.shape[0]
        pltpu.prng_seed(seed_ref[0, 0], ckey_ref[0, 0])

        x_o[:] = x_in[:]
        y_o[:] = y_in[:]
        z_o[:] = z_in[:]
        cx_o[:] = cx_in[:]
        cy_o[:] = cy_in[:]
        cz_o[:] = cz_in[:]
        qw_o[:] = qw_in[:]
        qx_o[:] = qx_in[:]
        qy_o[:] = qy_in[:]
        qz_o[:] = qz_in[:]
        sre0_o[:] = sre0_in[:]
        sim0_o[:] = sim0_in[:]
        sre1_o[:] = sre1_in[:]
        sim1_o[:] = sim1_in[:]
        act_o[:] = act_in[:]
        actm_o[:] = actm_in[:]

        box2 = box2_ref[:]                       # (cb, 2)
        temp = temp_ref[:]
        dr_max = drmax_ref[:]
        dphi_max = dphi_ref[:]
        Lb = (box2[:, 0:1], box2[:, 1:2])
        inv_b = (1.0 / Lb[0], 1.0 / Lb[1])
        kap_b = (kappa_l * inv_b[0], kappa_l * inv_b[1])
        if coulomb == "wolf":
            qrc = jnp.sqrt(qrc2)
            shw_b = tuple(_erfc_f32(k * qrc) / qrc for k in kap_b)
        else:
            shw_b = (None, None)
        A2 = x_in.shape[1]
        A_off = A2 // 2
        M2 = cx_in.shape[1]
        m_off = M2 // 2
        W_m = min(128, M2)
        W_a = min(256, A2)
        wiota_m = jax.lax.broadcasted_iota(jnp.int32, (1, W_m), 1)
        wiota_a = jax.lax.broadcasted_iota(jnp.int32, (1, W_a), 1)
        mol_row = molid_ref[0:1, :]
        tid_row = tid_ref[0:1, :]

        # per-site LJ parameter rows over the full double-width plane
        # (one shared template — both boxes hold the same species)
        for p in range(P):
            er = jnp.zeros_like(tid_row)
            sr = jnp.zeros_like(tid_row)
            l1 = jnp.zeros_like(tid_row)
            l2 = jnp.zeros_like(tid_row)
            for t in range(n_types):
                er = jnp.where(tid_row == float(t), eps_pt_ref[p, t], er)
                sr = jnp.where(tid_row == float(t), sig2_pt_ref[p, t], sr)
                if lj_shift == "linear":
                    l1 = jnp.where(tid_row == float(t), lam1_pt_ref[p, t],
                                   l1)
                    l2 = jnp.where(tid_row == float(t), lam2_pt_ref[p, t],
                                   l2)
            eps_rows[p:p + 1, :] = er
            sig2_rows[p:p + 1, :] = sr
            if lj_shift == "linear":
                lam1_rows[p:p + 1, :] = l1
                lam2_rows[p:p + 1, :] = l2

        sres = ((sre0_o, sim0_o), (sre1_o, sim1_o))
        cfacs = (cfac0_s, cfac1_s)
        if coulomb == "ewald":
            k2 = (kx_ref[0:1, :] ** 2 + ky_ref[0:1, :] ** 2
                  + kz_ref[0:1, :] ** 2)                        # (1, K)
            for b in range(2):
                kt2 = (_TWO_PI * inv_b[b]) ** 2 * k2            # (cb, K)
                vol = Lb[b] * Lb[b] * Lb[b]
                cfacs[b][:] = kw_ref[0:1, :] * (_TWO_PI / vol) \
                    * jnp.exp(-kt2 / (4.0 * kap_b[b] * kap_b[b])) / kt2

        def body_pd(p, d):
            return body_ref[0, p * 3 + d]

        def make_move(b):
            """Sweep-move body for box b: identical to the muVT kernel's
            move (sweep_kernel.py:261-574) with box b's constants, sfac
            planes and a STATIC half-plane pair scan."""
            box = Lb[b]
            inv_box = inv_b[b]
            kappa = kap_b[b]
            sh_w = shw_b[b]
            sre_o, sim_o = sres[b]
            cfac_s = cfacs[b]
            csl = slice(b * A_off, (b + 1) * A_off)
            mol_sub = molid_ref[0:1, csl]
            valid_sub = mol_sub >= 0.0
            q_sub = qrow_ref[0:1, csl]

            def move(mi, stats):
                m = mi + m_start + b * m_off   # plane index == mol id
                bits = pltpu.prng_random_bits((cb, 128))
                u = _uniform(bits)
                u_sel = u[:, 0:1]
                u_dx = u[:, 1:2] - 0.5
                u_dy = u[:, 2:3] - 0.5
                u_dz = u[:, 3:4] - 0.5
                u_acc = u[:, 4:5]

                mbase = jnp.minimum(m // 128 * 128, M2 - W_m)
                mbase = pl.multiple_of(mbase, 128)
                moff = m - mbase
                msel = wiota_m == moff

                def pick(ref):
                    win = ref[:, pl.ds(mbase, W_m)]
                    return jnp.sum(jnp.where(msel, win, 0.0), axis=1,
                                   keepdims=True)

                com_mx = pick(cx_o)
                com_my = pick(cy_o)
                com_mz = pick(cz_o)
                w0 = pick(qw_o)
                x0 = pick(qx_o)
                y0 = pick(qy_o)
                z0 = pick(qz_o)

                if use_rot:
                    is_trans = u_sel < p_translate
                    tsel = is_trans.astype(jnp.float32)
                    e1 = jnp.maximum(u[:, 5:6], 1e-12)
                    e2 = u[:, 6:7]
                    e3 = jnp.maximum(u[:, 7:8], 1e-12)
                    e4 = u[:, 8:9]
                    r1 = jnp.sqrt(-2.0 * jnp.log(e1))
                    r2 = jnp.sqrt(-2.0 * jnp.log(e3))
                    s2_, c2_ = _sincos_npi(_TWO_PI * (e2 - jnp.round(e2)))
                    s4_, c4_ = _sincos_npi(_TWO_PI * (e4 - jnp.round(e4)))
                    g1 = r1 * c2_
                    g2 = r1 * s2_
                    g3 = r2 * c4_
                    gn = jax.lax.rsqrt(g1 * g1 + g2 * g2 + g3 * g3 + 1e-20)
                    angle = (2.0 * u[:, 9:10] - 1.0) * dphi_max
                    half = 0.5 * angle
                    sh, ch = _sincos_npi(half)
                    sh = sh * gn
                    rw, rx, ry, rz = ch, sh * g1, sh * g2, sh * g3
                    nw = rw * w0 - rx * x0 - ry * y0 - rz * z0
                    nx = rw * x0 + rx * w0 + ry * z0 - rz * y0
                    ny = rw * y0 - rx * z0 + ry * w0 + rz * x0
                    nz = rw * z0 + rx * y0 - ry * x0 + rz * w0
                    qn = jax.lax.rsqrt(nw * nw + nx * nx + ny * ny
                                       + nz * nz)
                    nw, nx, ny, nz = nw * qn, nx * qn, ny * qn, nz * qn
                    w1 = tsel * w0 + (1.0 - tsel) * nw
                    x1 = tsel * x0 + (1.0 - tsel) * nx
                    y1 = tsel * y0 + (1.0 - tsel) * ny
                    z1 = tsel * z0 + (1.0 - tsel) * nz
                else:
                    tsel = jnp.ones_like(u_sel)
                    w1, x1, y1, z1 = w0, x0, y0, z0

                nmx = com_mx + tsel * u_dx * dr_max
                nmy = com_my + tsel * u_dy * dr_max
                nmz = com_mz + tsel * u_dz * dr_max
                nmx = nmx - box * jnp.floor(nmx * inv_box)
                nmy = nmy - box * jnp.floor(nmy * inv_box)
                nmz = nmz - box * jnp.floor(nmz * inv_box)

                other = (mol_sub != m.astype(jnp.float32)) & valid_sub

                acol = b * A_off + a_start + mi * P
                abase = jnp.minimum(acol // 128 * 128, A2 - W_a)
                abase = pl.multiple_of(abase, 128)
                aoff = acol - abase
                xwin = x_o[:, pl.ds(abase, W_a)]
                ywin = y_o[:, pl.ds(abase, W_a)]
                zwin = z_o[:, pl.ds(abase, W_a)]
                actwin = act_in[:, pl.ds(abase, W_a)]
                gate = jnp.sum(jnp.where(wiota_a == aoff, actwin, 0.0),
                               axis=1, keepdims=True)

                d_e = jnp.zeros((cb, 1), jnp.float32)
                olds = []
                news = []
                for p in range(P):
                    apick = wiota_a == aoff + p
                    oxp = jnp.sum(jnp.where(apick, xwin, 0.0), axis=1,
                                  keepdims=True)
                    oyp = jnp.sum(jnp.where(apick, ywin, 0.0), axis=1,
                                  keepdims=True)
                    ozp = jnp.sum(jnp.where(apick, zwin, 0.0), axis=1,
                                  keepdims=True)
                    olds.append((oxp, oyp, ozp))
                    if P > 1:
                        nx_, ny_, nz_ = _rot_apply(
                            w1, x1, y1, z1, body_pd(p, 0), body_pd(p, 1),
                            body_pd(p, 2))
                    else:
                        nx_ = ny_ = nz_ = jnp.zeros_like(com_mx)
                    news.append((nmx + nx_, nmy + ny_, nmz + nz_))

                pxs = x_o[:, csl]
                pys = y_o[:, csl]
                pzs = z_o[:, csl]
                act_sub = act_in[:, csl]
                for p in range(P):
                    use_q = coulomb != "none" and has_q[p]
                    if use_q:
                        qq = (_FACTOR * qp_ref[0, p]) * q_sub
                        att_q = qq < 0.0
                    if has_lj[p]:
                        sig2_p = sig2_rows[p:p + 1, csl]
                        eps4_p = 4.0 * eps_rows[p:p + 1, csl]
                        if lj_shift == "linear":
                            lam1_p = lam1_rows[p:p + 1, csl]
                            lam2_p = lam2_rows[p:p + 1, csl]
                    for sign, atoms in ((-1.0, olds), (1.0, news)):
                        ax, ay, az = atoms[p]
                        dx = pxs - ax
                        dy = pys - ay
                        dz = pzs - az
                        dx = dx - box * jnp.round(dx * inv_box)
                        dy = dy - box * jnp.round(dy * inv_box)
                        dz = dz - box * jnp.round(dz * inv_box)
                        d2 = jnp.maximum(dx * dx + dy * dy + dz * dz,
                                         1e-4)
                        mask_lj = other & (d2 < rc2)
                        if use_q and qrc2 != rc2:
                            mask_qq = other & (d2 < qrc2)
                        else:
                            mask_qq = mask_lj
                        inv_r = jax.lax.rsqrt(d2)
                        inv_d2 = inv_r * inv_r
                        contrib = None
                        if has_lj[p]:
                            s2 = sig2_p * inv_d2
                            s6 = s2 * s2 * s2
                            pot = eps4_p * (s6 * s6 - s6)
                            if lj_shift == "linear":
                                pot = pot + (lam1_p
                                             + lam2_p * jnp.sqrt(d2))
                            contrib = jnp.where(mask_lj, pot, 0.0)
                        if use_q:
                            r = d2 * inv_r
                            if coulomb == "ewald":
                                cp = qq * (_erfc_f32(kappa * r) * inv_r)
                            elif coulomb == "wolf":
                                cp = qq * (_erfc_f32(kappa * r) * inv_r
                                           - sh_w)
                            elif coulomb == "wolf_ref":
                                cp = qq * (_erfc_f32(kappa * r) * inv_r)
                            else:
                                cp = qq * inv_r
                            if sign > 0:
                                cp = jnp.where(
                                    (d2 < d2_overlap) & att_q,
                                    jnp.float32(1e30), cp)
                            qpart = jnp.where(mask_qq, cp, 0.0)
                            contrib = qpart if contrib is None \
                                else contrib + qpart
                        if contrib is not None:
                            contrib = contrib * act_sub
                            d_e += sign * jnp.sum(contrib, axis=1,
                                                  keepdims=True)

                if coulomb == "ewald":
                    ds_re = jnp.zeros((cb, K), jnp.float32)
                    ds_im = jnp.zeros((cb, K), jnp.float32)
                    tpl = _TWO_PI * inv_box
                    for sign, atoms in ((-1.0, olds), (1.0, news)):
                        for p in range(P):
                            if not has_q[p]:
                                continue
                            ax, ay, az = atoms[p]
                            ph = tpl * (kx_ref[0:1, :] * ax
                                        + ky_ref[0:1, :] * ay
                                        + kz_ref[0:1, :] * az)
                            ph = ph - _TWO_PI * jnp.round(
                                ph * (1.0 / _TWO_PI))
                            qp = sign * qp_ref[0, p]
                            sn, cs = _sincos_npi(ph)
                            ds_re += qp * cs
                            ds_im += qp * sn
                    cross = 2.0 * (sre_o[:] * ds_re + sim_o[:] * ds_im) \
                        + ds_re * ds_re + ds_im * ds_im
                    d_e += _FACTOR * jnp.sum(
                        cfac_s[:] * cross, axis=1, keepdims=True)

                beta_de = d_e / temp
                accept = (beta_de < 0.0) | (u_acc < jnp.exp(-beta_de))
                accept = accept & (gate > 0.0)
                asel = accept.astype(jnp.float32)

                taken = msel & accept

                def put(ref, val):
                    win = ref[:, pl.ds(mbase, W_m)]
                    ref[:, pl.ds(mbase, W_m)] = jnp.where(taken, val, win)

                put(cx_o, nmx)
                put(cy_o, nmy)
                put(cz_o, nmz)
                if use_rot:
                    put(qw_o, w1)
                    put(qx_o, x1)
                    put(qy_o, y1)
                    put(qz_o, z1)
                for p in range(P):
                    nxp, nyp, nzp = news[p]
                    atk = (wiota_a == aoff + p) & accept
                    xwin = jnp.where(atk, nxp, xwin)
                    ywin = jnp.where(atk, nyp, ywin)
                    zwin = jnp.where(atk, nzp, zwin)
                x_o[:, pl.ds(abase, W_a)] = xwin
                y_o[:, pl.ds(abase, W_a)] = ywin
                z_o[:, pl.ds(abase, W_a)] = zwin
                if coulomb == "ewald":
                    sre_o[:] = sre_o[:] + asel * ds_re
                    sim_o[:] = sim_o[:] + asel * ds_im

                d_e_taken = jnp.where(accept, d_e, jnp.zeros_like(d_e))
                zero1 = jnp.zeros((cb, 1), jnp.float32)
                de_cols = [d_e_taken, zero1] if b == 0 \
                    else [zero1, d_e_taken]
                upd = jnp.concatenate(
                    de_cols + [asel * tsel, asel * (1.0 - tsel),
                               gate * tsel, gate * (1.0 - tsel),
                               jnp.zeros((cb, 2), jnp.float32)], axis=1)
                return stats + upd

            return move

        stats = jax.lax.fori_loop(
            0, M, make_move(0), jnp.zeros((cb, 8), jnp.float32))
        stats = jax.lax.fori_loop(0, M, make_move(1), stats)

        if n_exch:
            beta = 1.0 / temp
            M_f = float(M)
            P_f = float(P)
            mo_f = float(m_off)
            ao_f = float(A_off)
            ms_f = float(m_start)
            as_f = float(a_start)
            miota_f = jax.lax.broadcasted_iota(
                jnp.int32, (1, M2), 1).astype(jnp.float32)
            aiota_f = jax.lax.broadcasted_iota(
                jnp.int32, (1, A2), 1).astype(jnp.float32)
            v0m = (miota_f >= ms_f) & (miota_f < ms_f + M_f)
            v1m = (miota_f >= mo_f + ms_f) & (miota_f < mo_f + ms_f + M_f)
            bc0f = (aiota_f < ao_f).astype(jnp.float32)     # (1, A2)
            bc1f = 1.0 - bc0f
            si2 = si2_ref[:]                                 # (cb, 2)
            wc2 = wc2_ref[:]
            si_bx = (si2[:, 0:1], si2[:, 1:2])
            wc_bx = (wc2[:, 0:1], wc2[:, 1:2])
            q_full = qrow_ref[0:1, :]

            def xpair(atoms, excl, colm_f, box, inv_box, kappa, sh_w,
                      veto):
                """Pair energy of one pose against the ACTIVE atoms of
                one box (colm_f: float column mask), excluding molecule
                `excl` — the muVT kernel's xpair with per-chain box
                constants (the two boxes sample different kappa)."""
                nmask = jnp.where(mol_row != excl, act_o[:], 0.0) * colm_f
                upair = jnp.zeros((cb, 1), jnp.float32)
                for p in range(P):
                    use_q = coulomb != "none" and has_q[p]
                    ax, ay, az = atoms[p]
                    dx = x_o[:] - ax
                    dy = y_o[:] - ay
                    dz = z_o[:] - az
                    dx = dx - box * jnp.round(dx * inv_box)
                    dy = dy - box * jnp.round(dy * inv_box)
                    dz = dz - box * jnp.round(dz * inv_box)
                    d2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-4)
                    mask_lj = d2 < rc2
                    if use_q and qrc2 != rc2:
                        mask_qq = d2 < qrc2
                    else:
                        mask_qq = mask_lj
                    inv_r = jax.lax.rsqrt(d2)
                    inv_d2 = inv_r * inv_r
                    contrib = None
                    if has_lj[p]:
                        s2 = sig2_rows[p:p + 1, :] * inv_d2
                        s6 = s2 * s2 * s2
                        pot = 4.0 * eps_rows[p:p + 1, :] * (s6 * s6 - s6)
                        if lj_shift == "linear":
                            pot = pot + (lam1_rows[p:p + 1, :]
                                         + lam2_rows[p:p + 1, :]
                                         * jnp.sqrt(d2))
                        contrib = jnp.where(mask_lj, pot, 0.0)
                    if use_q:
                        qq = (_FACTOR * qp_ref[0, p]) * q_full
                        att_q = qq < 0.0
                        r = d2 * inv_r
                        if coulomb in ("ewald", "wolf_ref"):
                            cp = qq * (_erfc_f32(kappa * r) * inv_r)
                        elif coulomb == "wolf":
                            cp = qq * (_erfc_f32(kappa * r) * inv_r
                                       - sh_w)
                        else:
                            cp = qq * inv_r
                        cp = jnp.where((d2 < d2_overlap) & att_q & veto,
                                       jnp.float32(1e30), cp)
                        qpart = jnp.where(mask_qq, cp, 0.0)
                        contrib = qpart if contrib is None \
                            else contrib + qpart
                    if contrib is not None:
                        upair += jnp.sum(contrib * nmask, axis=1,
                                         keepdims=True)
                return upair

            def xsfac(atoms, tpl):
                ds_re = jnp.zeros((cb, K), jnp.float32)
                ds_im = jnp.zeros((cb, K), jnp.float32)
                for p in range(P):
                    if not has_q[p]:
                        continue
                    ax, ay, az = atoms[p]
                    ph = tpl * (kx_ref[0:1, :] * ax + ky_ref[0:1, :] * ay
                                + kz_ref[0:1, :] * az)
                    ph = ph - _TWO_PI * jnp.round(ph * (1.0 / _TWO_PI))
                    sn, cs = _sincos_npi(ph)
                    ds_re += qp_ref[0, p] * cs
                    ds_im += qp_ref[0, p] * sn
                return ds_re, ds_im

            def du_recip(ds_re, ds_im, sgn, sre, sim, cf):
                cross = 2.0 * sgn * (sre * ds_re + sim * ds_im) \
                    + ds_re * ds_re + ds_im * ds_im
                return _FACTOR * jnp.sum(cf * cross, axis=1,
                                         keepdims=True)

            def xattempt(xi, stats):
                bits = pltpu.prng_random_bits((cb, 128))
                u = _uniform(bits)
                dir01 = u[:, 0:1] < 0.5          # True: box 0 -> box 1
                u_acc = u[:, 7:8]
                actm = actm_o[:]
                n0 = jnp.sum(jnp.where(v0m, actm, 0.0), axis=1,
                             keepdims=True)
                n1 = jnp.sum(jnp.where(v1m, actm, 0.0), axis=1,
                             keepdims=True)
                n_src = jnp.where(dir01, n0, n1)
                n_dst = jnp.where(dir01, n1, n0)
                # logical select on bool masks ((a & c) | (~a & d) — a
                # where-select on bools hits the i8->i1 trunci Mosaic
                # rejects)
                vsrc = (dir01 & v0m) | (~dir01 & v1m)     # (cb, M2)
                vdst = (dir01 & v1m) | (~dir01 & v0m)
                us = _uniform(pltpu.prng_random_bits((cb, M2)))
                score = jnp.where((actm > 0.5) & vsrc, us, -1.0)
                smax = jnp.max(score, axis=1, keepdims=True)
                del_slot = jnp.min(
                    jnp.where(score == smax, miota_f, 3.0e38),
                    axis=1, keepdims=True)
                ins_slot = jnp.min(
                    jnp.where((actm < 0.5) & vdst, miota_f, 3.0e38),
                    axis=1, keepdims=True)
                srcf = jnp.where(dir01, 0.0, 1.0)         # (cb, 1)
                dstf = 1.0 - srcf

                # per-chain source/destination box constants
                L_s = jnp.where(dir01, Lb[0], Lb[1])
                L_d = jnp.where(dir01, Lb[1], Lb[0])
                inv_s = jnp.where(dir01, inv_b[0], inv_b[1])
                inv_d = jnp.where(dir01, inv_b[1], inv_b[0])
                kap_s = jnp.where(dir01, kap_b[0], kap_b[1])
                kap_d = jnp.where(dir01, kap_b[1], kap_b[0])
                if coulomb == "wolf":
                    shw_s = jnp.where(dir01, shw_b[0], shw_b[1])
                    shw_d = jnp.where(dir01, shw_b[1], shw_b[0])
                else:
                    shw_s = shw_d = None
                si_s = jnp.where(dir01, si_bx[0], si_bx[1])
                si_d = jnp.where(dir01, si_bx[1], si_bx[0])
                wc_s = jnp.where(dir01, wc_bx[0], wc_bx[1])
                wc_d = jnp.where(dir01, wc_bx[1], wc_bx[0])
                colm_s = jnp.where(dir01, bc0f, bc1f)     # (cb, A2) f32
                colm_d = jnp.where(dir01, bc1f, bc0f)

                # old pose of the deletion candidate: full-row one-hot
                # column reads (slot/plane arithmetic per box half)
                acol_d = (del_slot - srcf * mo_f - ms_f) * P_f \
                    + as_f + srcf * ao_f
                olds = []
                for p in range(P):
                    opick = aiota_f == acol_d + float(p)
                    olds.append(tuple(
                        jnp.sum(jnp.where(opick, r, 0.0), axis=1,
                                keepdims=True)
                        for r in (x_o[:], y_o[:], z_o[:])))

                # fresh trial pose, uniform in the DESTINATION volume
                ctx = u[:, 1:2] * L_d
                cty = u[:, 2:3] * L_d
                ctz = u[:, 3:4] * L_d
                if P > 1:
                    u1 = u[:, 4:5]
                    th2 = _TWO_PI * (u[:, 5:6] - jnp.round(u[:, 5:6]))
                    th3 = _TWO_PI * (u[:, 6:7] - jnp.round(u[:, 6:7]))
                    r1 = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                    r2 = jnp.sqrt(u1)
                    s2_, c2_ = _sincos_npi(th2)
                    s3_, c3_ = _sincos_npi(th3)
                    iw, ix, iy, iz = (r1 * s2_, r1 * c2_, r2 * s3_,
                                      r2 * c3_)
                    ins_atoms = []
                    for p in range(P):
                        ox_, oy_, oz_ = _rot_apply(
                            iw, ix, iy, iz,
                            body_pd(p, 0), body_pd(p, 1), body_pd(p, 2))
                        ins_atoms.append((ctx + ox_, cty + oy_,
                                          ctz + oz_))
                else:
                    iw = jnp.ones_like(ctx)
                    ix = iy = iz = jnp.zeros_like(ctx)
                    ins_atoms = [(ctx, cty, ctz)]

                u_del = xpair(olds, del_slot, colm_s, L_s, inv_s, kap_s,
                              shw_s, False)
                u_ins = xpair(ins_atoms, jnp.full((cb, 1), -2.0,
                                                  jnp.float32),
                              colm_d, L_d, inv_d, kap_d, shw_d, True)
                du_d = -u_del - si_s + wc_s * (-2.0 * n_src + 1.0)
                du_i = u_ins + si_d + wc_d * (2.0 * n_dst + 1.0)
                if coulomb == "ewald":
                    dsd_re, dsd_im = xsfac(olds, _TWO_PI * inv_s)
                    dsi_re, dsi_im = xsfac(ins_atoms, _TWO_PI * inv_d)
                    sre_s = jnp.where(dir01, sre0_o[:], sre1_o[:])
                    sim_s = jnp.where(dir01, sim0_o[:], sim1_o[:])
                    sre_d = jnp.where(dir01, sre1_o[:], sre0_o[:])
                    sim_d = jnp.where(dir01, sim1_o[:], sim0_o[:])
                    cf_s = jnp.where(dir01, cfac0_s[:], cfac1_s[:])
                    cf_d = jnp.where(dir01, cfac1_s[:], cfac0_s[:])
                    du_d = du_d + du_recip(dsd_re, dsd_im, -1.0,
                                           sre_s, sim_s, cf_s)
                    du_i = du_i + du_recip(dsi_re, dsi_im, 1.0,
                                           sre_d, sim_d, cf_d)
                du = du_d + du_i
                ln_acc = jnp.log(jnp.maximum(n_src, 1.0)) \
                    - jnp.log(n_dst + 1.0) \
                    + 3.0 * (jnp.log(L_d) - jnp.log(L_s)) - beta * du
                can = (n_src > 0.5) & (n_dst < M_f - 0.5)
                ln_u = jnp.log(jnp.maximum(u_acc, jnp.float32(1e-30)))
                ok = can & (ln_u < ln_acc)
                okf = ok.astype(jnp.float32)

                # ---- state updates: full-row one-hot where-selects ----
                mp_d = miota_f == del_slot
                mp_i = miota_f == ins_slot
                actm_o[:] = jnp.where(
                    mp_d & ok, 0.0, jnp.where(mp_i & ok, 1.0, actm))
                act_row = act_o[:]
                act_o[:] = jnp.where(
                    (mol_row == del_slot) & ok, 0.0,
                    jnp.where((mol_row == ins_slot) & ok, 1.0, act_row))
                wr = ok
                acol_i = (ins_slot - dstf * mo_f - ms_f) * P_f \
                    + as_f + dstf * ao_f
                xrow, yrow, zrow = x_o[:], y_o[:], z_o[:]
                for p in range(P):
                    apick = (aiota_f == acol_i + float(p)) & wr
                    ax, ay, az = ins_atoms[p]
                    xrow = jnp.where(apick, ax, xrow)
                    yrow = jnp.where(apick, ay, yrow)
                    zrow = jnp.where(apick, az, zrow)
                x_o[:] = xrow
                y_o[:] = yrow
                z_o[:] = zrow
                mw = mp_i & wr
                cx_o[:] = jnp.where(mw, ctx, cx_o[:])
                cy_o[:] = jnp.where(mw, cty, cy_o[:])
                cz_o[:] = jnp.where(mw, ctz, cz_o[:])
                if P > 1:
                    qw_o[:] = jnp.where(mw, iw, qw_o[:])
                    qx_o[:] = jnp.where(mw, ix, qx_o[:])
                    qy_o[:] = jnp.where(mw, iy, qy_o[:])
                    qz_o[:] = jnp.where(mw, iz, qz_o[:])
                if coulomb == "ewald":
                    # box 0 delta: src==0 -> -ds_del, dst==0 -> +ds_ins
                    sre0_o[:] = sre0_o[:] + okf * jnp.where(
                        dir01, -dsd_re, dsi_re)
                    sim0_o[:] = sim0_o[:] + okf * jnp.where(
                        dir01, -dsd_im, dsi_im)
                    sre1_o[:] = sre1_o[:] + okf * jnp.where(
                        dir01, dsi_re, -dsd_re)
                    sim1_o[:] = sim1_o[:] + okf * jnp.where(
                        dir01, dsi_im, -dsd_im)
                du_b0 = jnp.where(
                    ok & dir01, du_d,
                    jnp.where(ok & ~dir01, du_i, jnp.zeros_like(du_d)))
                du_b1 = jnp.where(
                    ok & dir01, du_i,
                    jnp.where(ok & ~dir01, du_d, jnp.zeros_like(du_d)))
                upd = jnp.concatenate(
                    [du_b0, du_b1, jnp.zeros((cb, 4), jnp.float32),
                     okf, jnp.zeros((cb, 1), jnp.float32)], axis=1)
                return stats + upd

            stats = jax.lax.fori_loop(0, n_exch, xattempt, stats)

        stats_o[:] = stats_in[:] + stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("M", "P", "coulomb", "n_types", "has_lj", "has_q",
                     "rc2", "qrc2", "kappa_l", "d2_overlap", "p_translate",
                     "use_rot", "lj_shift", "cb", "interpret", "n_exch",
                     "m_start", "a_start"),
)
def sweep_gibbs_pallas(x, y, z, cx, cy, cz, qw, qx, qy, qz,
                       sre0, sim0, sre1, sim1, act, actm,
                       box2, temp, drmax, dphi, si2, wc2, stats,
                       seed, chain_keys, body, qp, eps_pt, sig2_pt,
                       lam1_pt, lam2_pt, tid_row, molid_row, q_row,
                       kx, ky, kz, kw, *, M, P, coulomb, n_types,
                       has_lj, has_q, rc2, qrc2, kappa_l, d2_overlap,
                       p_translate, use_rot, lj_shift="none", cb=64,
                       interpret=False, n_exch=0, m_start=0, a_start=0):
    """One Gibbs cycle: a displacement/rotation sweep of both boxes
    (2*M activity-masked moves) + n_exch in-kernel transfer attempts.

    Planes: x/y/z/act (C, 2*A_off), cx..qz/actm (C, 2*m_off),
    sre/sim per box (C, K); box2/si2/wc2 (C, 2) per-box lengths and
    exchange constants (self+intra, reference-Wolf coefficient *
    q_tot^2); temp/drmax/dphi (C, 1); stats (C, 8).
    Returns (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre0, sim0, sre1,
    sim1, act, actm, stats); stats columns [d_e0, d_e1, acc_t, acc_r,
    att_t, att_r, acc_x, 0] (att_x = n_exch).

    m_start/a_start/M address ONE species block of a mixture (box-0
    slots [m_start, m_start+M), atom columns from a_start; box-1
    offset by m_off/A_off); a binary system runs one call per block
    with act/actm threaded between calls."""
    C, A2 = x.shape
    K = sre0.shape[1]
    M2 = cx.shape[1]
    assert A2 % 256 == 0, "double-box atom planes must be 2x128-aligned"
    assert M2 % 256 == 0, "double-box molecule planes must be 2x128-padded"
    assert P <= 128
    cb = next(b for b in (min(cb, C), 32, 16, 8, 4, 2, 1) if C % b == 0)
    grid = (C // cb,)

    kern = _make_gibbs_kernel(M, P, coulomb, n_types, has_lj, has_q,
                              rc2, qrc2, kappa_l, d2_overlap, p_translate,
                              use_rot, K, lj_shift, n_exch, m_start,
                              a_start)

    cell = lambda n: pl.BlockSpec((cb, n), lambda c: (c, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    shared = lambda r, n: pl.BlockSpec((r, n), lambda c: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((cb, 1), lambda c: (c, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, body.shape[1]), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, qp.shape[1]), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((eps_pt.shape[0], eps_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((sig2_pt.shape[0], sig2_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((lam1_pt.shape[0], lam1_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((lam2_pt.shape[0], lam2_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        shared(1, A2), shared(1, A2), shared(1, A2),    # tid, mol, q
        shared(1, K), shared(1, K), shared(1, K), shared(1, K),
        cell(A2), cell(A2), cell(A2),                   # x, y, z
        cell(M2), cell(M2), cell(M2),                   # com planes
        cell(M2), cell(M2), cell(M2), cell(M2),         # quat planes
        cell(K), cell(K), cell(K), cell(K),             # sfac planes
        cell(A2), cell(M2),                             # act, actm
        cell(2), cell(1), cell(1), cell(1),             # box2/temp/dr/dphi
        cell(2), cell(2),                               # si2, wc2
        cell(8),                                        # stats
    ]
    operands = [
        seed.reshape(1, 1), chain_keys.reshape(C, 1).astype(jnp.int32),
        body, qp, eps_pt, sig2_pt, lam1_pt, lam2_pt,
        tid_row.reshape(1, A2), molid_row.reshape(1, A2),
        q_row.reshape(1, A2),
        kx.reshape(1, K), ky.reshape(1, K), kz.reshape(1, K),
        kw.reshape(1, K),
        x, y, z, cx, cy, cz, qw, qx, qy, qz,
        sre0, sim0, sre1, sim1, act, actm,
        box2, temp, drmax, dphi, si2, wc2, stats,
    ]
    out_specs = [cell(A2)] * 3 + [cell(M2)] * 7 + [cell(K)] * 4 \
        + [cell(A2), cell(M2), cell(8)]
    out_shape = [
        jax.ShapeDtypeStruct(s.shape, jnp.float32)
        for s in (x, y, z, cx, cy, cz, qw, qx, qy, qz,
                  sre0, sim0, sre1, sim1, act, actm, stats)
    ]

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((max(P, 8), A2), jnp.float32),   # eps rows
            pltpu.VMEM((max(P, 8), A2), jnp.float32),   # sig2 rows
            pltpu.VMEM((max(P, 8), A2 if lj_shift == "linear" else 128),
                       jnp.float32),                    # lam1 rows
            pltpu.VMEM((max(P, 8), A2 if lj_shift == "linear" else 128),
                       jnp.float32),                    # lam2 rows
            pltpu.VMEM((cb, K), jnp.float32),           # cfac box 0
            pltpu.VMEM((cb, K), jnp.float32),           # cfac box 1
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)
    return outs
