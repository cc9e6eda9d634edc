"""Semigrand identity-flip Pallas kernel: n_flip in-kernel species
flips on the two-block slot layout.

The last jnp exchange scan (after round 3's muVT exchanges and round
4's Gibbs transfers): a semigrand flip picks a uniform active molecule,
re-poses it with the OTHER species' template at the same COM and a
fresh uniform orientation, and accepts with

    A -> B:  min[1, xi   exp(-beta dU)]      (no N-ratio factors —
    B -> A:  min[1, 1/xi exp(-beta dU)]       the reverse move picks
                                              the same molecule)

where dU carries both species' pair energies, the reciprocal delta of
swapping the structure-factor rows, and the self+intra constant
difference (`mc/semigrand.py:167-341` is the jnp counterpart; the
reference has no semigrand ensemble).  Unlike muVT/Gibbs this kernel
runs FLIPS ONLY — displacement/rotation sweeps compose through the
existing per-block `sweep_act` kernel calls (mc/moves.
make_mega_sweep_fn), so the move body is not duplicated a third time;
a flip touches BOTH species' templates in one attempt, which the
per-block sweep kernel cannot express.

Layout: the standard semigrand state (mc/semigrand.SemigrandState) —
ONE box, molecule slots 0..cap_a-1 species A and cap_a..cap_a+cap_b-1
species B, plane position == molecule id, atom columns contiguous per
block (A at [0, cap_a*P0), B at [a0_b, a0_b + cap_b*P1)).  Both
species' template tables ride in SMEM; every flip evaluates BOTH
direction branches' poses and where-selects (the jnp path's structure),
so the cost is ~4 pose scans per attempt.  Mosaic rules as in
sweep_kernel.py.  Requires lj_shift="none" (the force-shifted tables
would double again) and equal species net charges (enforced by
mc/semigrand.py; the reference-Wolf global constant then cancels).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metropolismontecarlo_tpu.ops.pallas.delta_energy import _erfc_f32
from metropolismontecarlo_tpu.ops.pallas.gibbs_kernel import _rot_apply
from metropolismontecarlo_tpu.ops.pallas.sweep_kernel import (
    _sincos_npi,
    _uniform,
)
from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR

_TWO_PI = 6.283185307179586
_FACTOR = float(COULOMB_FACTOR)


def _make_flip_kernel(cap_a, cap_b, P0, P1, a0_b, coulomb, n_types,
                      has_lj0, has_q0, has_lj1, has_q1, rc2, qrc2,
                      kappa_l, d2_overlap, K, ln_xi, n_flip, use_lrc):
    """stats columns: [d_e, acc_ab, acc_ba, att_ab, att_ba, 0, 0, 0]."""
    M = cap_a + cap_b
    Ps = (P0, P1)
    has_ljs = (has_lj0, has_lj1)
    has_qs = (has_q0, has_q1)

    def kernel(*refs):
        (seed_ref, ckey_ref, body0_ref, qp0_ref, body1_ref, qp1_ref,
         eps0_pt, sig20_pt, eps1_pt, sig21_pt,
         tid_ref, molid_ref, qrow_ref, kx_ref, ky_ref, kz_ref, kw_ref,
         x_in, y_in, z_in, cx_in, cy_in, cz_in,
         qw_in, qx_in, qy_in, qz_in, sre_in, sim_in, act_in, actm_in,
         box_ref, temp_ref, si2_ref, lrc3_ref, stats_in,
         x_o, y_o, z_o, cx_o, cy_o, cz_o, qw_o, qx_o, qy_o, qz_o,
         sre_o, sim_o, act_o, actm_o, stats_o,
         eps_rows, sig2_rows, cfac_s) = refs
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
        sre_o[:] = sre_in[:]
        sim_o[:] = sim_in[:]
        act_o[:] = act_in[:]
        actm_o[:] = actm_in[:]

        box = box_ref[:]
        temp = temp_ref[:]
        inv_box = 1.0 / box
        kappa = kappa_l * inv_box
        if coulomb == "wolf":
            qrc = jnp.sqrt(qrc2)
            sh_w = _erfc_f32(kappa * qrc) / qrc
        else:
            sh_w = None
        A_pad = x_in.shape[1]
        M_pad = cx_in.shape[1]
        mol_row = molid_ref[0:1, :]
        tid_row = tid_ref[0:1, :]
        q_full = qrow_ref[0:1, :]
        beta = 1.0 / temp
        si2 = si2_ref[:]                     # (cb, 2) per-species const
        si_s = (si2[:, 0:1], si2[:, 1:2])
        bodies = (body0_ref, body1_ref)
        qps = (qp0_ref, qp1_ref)

        # per-site LJ rows: species 0 sites in rows [0, P0), species 1
        # in rows [P0, P0 + P1) — one shared neighbor-typed table pair
        def build_rows(s, r0, ept, s2pt):
            for p in range(Ps[s]):
                er = jnp.zeros_like(tid_row)
                sr = jnp.zeros_like(tid_row)
                for t in range(n_types):
                    er = jnp.where(tid_row == float(t), ept[p, t], er)
                    sr = jnp.where(tid_row == float(t), s2pt[p, t], sr)
                eps_rows[r0 + p:r0 + p + 1, :] = er
                sig2_rows[r0 + p:r0 + p + 1, :] = sr

        build_rows(0, 0, eps0_pt, sig20_pt)
        build_rows(1, P0, eps1_pt, sig21_pt)

        if coulomb == "ewald":
            k2 = (kx_ref[0:1, :] ** 2 + ky_ref[0:1, :] ** 2
                  + kz_ref[0:1, :] ** 2)
            kt2 = (_TWO_PI * inv_box) ** 2 * k2
            vol = box * box * box
            cfac_s[:] = kw_ref[0:1, :] * (_TWO_PI / vol) \
                * jnp.exp(-kt2 / (4.0 * kappa * kappa)) / kt2

        miota_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, M_pad), 1).astype(jnp.float32)
        aiota_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, A_pad), 1).astype(jnp.float32)
        valid_m = miota_f < float(M)
        va = miota_f < float(cap_a)
        vb = valid_m & (miota_f >= float(cap_a))

        def xpair(s, r0, atoms, excl, veto):
            """Pair energy of species-s pose `atoms` against all active
            atoms except molecule `excl` (the sweep kernel's xpair with
            the species' own site tables)."""
            nmask = jnp.where(mol_row != excl, act_o[:], 0.0)
            upair = jnp.zeros((cb, 1), jnp.float32)
            for p in range(Ps[s]):
                use_q = coulomb != "none" and has_qs[s][p]
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
                if has_ljs[s][p]:
                    s2 = sig2_rows[r0 + p:r0 + p + 1, :] * inv_d2
                    s6 = s2 * s2 * s2
                    pot = 4.0 * eps_rows[r0 + p:r0 + p + 1, :] \
                        * (s6 * s6 - s6)
                    contrib = jnp.where(mask_lj, pot, 0.0)
                if use_q:
                    qq = (_FACTOR * qps[s][0, p]) * q_full
                    att_q = qq < 0.0
                    r = d2 * inv_r
                    if coulomb in ("ewald", "wolf_ref"):
                        cp = qq * (_erfc_f32(kappa * r) * inv_r)
                    elif coulomb == "wolf":
                        cp = qq * (_erfc_f32(kappa * r) * inv_r - sh_w)
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

        def xsfac(s, atoms):
            ds_re = jnp.zeros((cb, K), jnp.float32)
            ds_im = jnp.zeros((cb, K), jnp.float32)
            tpl = _TWO_PI * inv_box
            for p in range(Ps[s]):
                if not has_qs[s][p]:
                    continue
                ax, ay, az = atoms[p]
                ph = tpl * (kx_ref[0:1, :] * ax + ky_ref[0:1, :] * ay
                            + kz_ref[0:1, :] * az)
                ph = ph - _TWO_PI * jnp.round(ph * (1.0 / _TWO_PI))
                sn, cs = _sincos_npi(ph)
                ds_re += qps[s][0, p] * cs
                ds_im += qps[s][0, p] * sn
            return ds_re, ds_im

        def fattempt(fi, stats):
            bits = pltpu.prng_random_bits((cb, 128))
            u = _uniform(bits)
            u_acc = u[:, 7:8]
            actm = actm_o[:]
            # uniform pick over ALL active molecules (both species)
            us = _uniform(pltpu.prng_random_bits((cb, M_pad)))
            score = jnp.where((actm > 0.5) & valid_m, us, -1.0)
            smax = jnp.max(score, axis=1, keepdims=True)
            slot = jnp.min(jnp.where(score == smax, miota_f, 3.0e38),
                           axis=1, keepdims=True)
            is_a = slot < float(cap_a)
            mpick = miota_f == slot

            def mread(ref):
                return jnp.sum(jnp.where(mpick, ref[:], 0.0), axis=1,
                               keepdims=True)

            com_x = mread(cx_o)
            com_y = mread(cy_o)
            com_z = mread(cz_o)

            # stored old pose, both species interpretations (only the
            # matching one is real; the other reads junk columns that
            # the where-selects discard)
            acol_a = slot * float(P0)
            acol_b = float(a0_b) + (slot - float(cap_a)) * float(P1)

            def oread(base, p):
                opick = aiota_f == base + float(p)
                return tuple(
                    jnp.sum(jnp.where(opick, r, 0.0), axis=1,
                            keepdims=True)
                    for r in (x_o[:], y_o[:], z_o[:]))

            olds0 = [oread(acol_a, p) for p in range(P0)]
            olds1 = [oread(acol_b, p) for p in range(P1)]

            # fresh Shoemake orientation for the NEW identity
            u1 = u[:, 4:5]
            th2 = _TWO_PI * (u[:, 5:6] - jnp.round(u[:, 5:6]))
            th3 = _TWO_PI * (u[:, 6:7] - jnp.round(u[:, 6:7]))
            r1 = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
            r2 = jnp.sqrt(u1)
            s2_, c2_ = _sincos_npi(th2)
            s3_, c3_ = _sincos_npi(th3)
            iw, ix, iy, iz = r1 * s2_, r1 * c2_, r2 * s3_, r2 * c3_

            def new_pose(s):
                atoms = []
                for p in range(Ps[s]):
                    if Ps[s] > 1:
                        ox_, oy_, oz_ = _rot_apply(
                            iw, ix, iy, iz,
                            bodies[s][0, p * 3 + 0],
                            bodies[s][0, p * 3 + 1],
                            bodies[s][0, p * 3 + 2])
                    else:
                        ox_ = oy_ = oz_ = jnp.zeros_like(com_x)
                    atoms.append((com_x + ox_, com_y + oy_,
                                  com_z + oz_))
                return atoms

            news0 = new_pose(0)          # B -> A target pose
            news1 = new_pose(1)          # A -> B target pose

            u_ex0 = xpair(0, 0, olds0, slot, False)
            u_ex1 = xpair(1, P0, olds1, slot, False)
            u_exist = jnp.where(is_a, u_ex0, u_ex1)
            u_n0 = xpair(0, 0, news0, slot, True)
            u_n1 = xpair(1, P0, news1, slot, True)
            u_new = jnp.where(is_a, u_n1, u_n0)
            dconst = jnp.where(is_a, si_s[1] - si_s[0],
                               si_s[0] - si_s[1])
            du = u_new - u_exist + dconst
            if use_lrc:
                # LJ tail flip delta, affine in the LIVE per-species
                # counts (U_lrc quadratic form; mc/semigrand.py
                # lrc_flip_delta is the jnp counterpart): lrc3 carries
                # [g*c00, g*c01, g*c11] per chain
                lrc3 = lrc3_ref[:]
                g00 = lrc3[:, 0:1]
                g01 = lrc3[:, 1:2]
                g11 = lrc3[:, 2:3]
                n_a = jnp.sum(jnp.where(va, actm, 0.0), axis=1,
                              keepdims=True)
                n_b = jnp.sum(jnp.where(vb, actm, 0.0), axis=1,
                              keepdims=True)
                d_ab = -(2.0 * n_a - 1.0) * g00 \
                    + (2.0 * n_b + 1.0) * g11 \
                    + 2.0 * (n_a - n_b - 1.0) * g01
                d_ba = (2.0 * n_a + 1.0) * g00 \
                    - (2.0 * n_b - 1.0) * g11 \
                    + 2.0 * (n_b - n_a - 1.0) * g01
                du = du + jnp.where(is_a, d_ab, d_ba)
            if coulomb == "ewald":
                do0 = xsfac(0, olds0)
                do1 = xsfac(1, olds1)
                dn0 = xsfac(0, news0)
                dn1 = xsfac(1, news1)
                d_re = jnp.where(is_a, dn1[0] - do0[0], dn0[0] - do1[0])
                d_im = jnp.where(is_a, dn1[1] - do0[1], dn0[1] - do1[1])
                cross = 2.0 * (sre_o[:] * d_re + sim_o[:] * d_im) \
                    + d_re * d_re + d_im * d_im
                du = du + _FACTOR * jnp.sum(cfac_s[:] * cross, axis=1,
                                            keepdims=True)

            # target: first free slot of the OTHER block
            free_a = jnp.min(
                jnp.where((actm < 0.5) & va, miota_f, 3.0e38),
                axis=1, keepdims=True)
            free_b = jnp.min(
                jnp.where((actm < 0.5) & vb, miota_f, 3.0e38),
                axis=1, keepdims=True)
            tgt = jnp.where(is_a, free_b, free_a)
            room = tgt < 3.0e37

            ln_acc = jnp.where(is_a, jnp.float32(ln_xi),
                               jnp.float32(-ln_xi)) - beta * du
            ln_u = jnp.log(jnp.maximum(u_acc, jnp.float32(1e-30)))
            # smax >= 0 guards the empty-active-set degenerate pick
            # (score is -1 everywhere when no molecule is active, and
            # the argmax would land on slot 0 — a flip of an inactive
            # slot must never be acceptable)
            ok = room & (ln_u < ln_acc) & (smax >= 0.0)
            okf = ok.astype(jnp.float32)

            # ---- state updates ----
            tpick = miota_f == tgt
            actm_o[:] = jnp.where(
                mpick & ok, 0.0, jnp.where(tpick & ok, 1.0, actm))
            act_row = act_o[:]
            act_o[:] = jnp.where(
                (mol_row == slot) & ok, 0.0,
                jnp.where((mol_row == tgt) & ok, 1.0, act_row))
            # new-pose atom writes at the target block's columns
            tcol_a = tgt * float(P0)
            tcol_b = float(a0_b) + (tgt - float(cap_a)) * float(P1)
            xrow, yrow, zrow = x_o[:], y_o[:], z_o[:]
            for p in range(P1):          # A -> B writes species-1 pose
                apick = (aiota_f == tcol_b + float(p)) & ok & is_a
                ax, ay, az = news1[p]
                xrow = jnp.where(apick, ax, xrow)
                yrow = jnp.where(apick, ay, yrow)
                zrow = jnp.where(apick, az, zrow)
            for p in range(P0):          # B -> A writes species-0 pose
                apick = (aiota_f == tcol_a + float(p)) & ok & ~is_a
                ax, ay, az = news0[p]
                xrow = jnp.where(apick, ax, xrow)
                yrow = jnp.where(apick, ay, yrow)
                zrow = jnp.where(apick, az, zrow)
            x_o[:] = xrow
            y_o[:] = yrow
            z_o[:] = zrow
            tw = tpick & ok
            cx_o[:] = jnp.where(tw, com_x, cx_o[:])
            cy_o[:] = jnp.where(tw, com_y, cy_o[:])
            cz_o[:] = jnp.where(tw, com_z, cz_o[:])
            qw_o[:] = jnp.where(tw, iw, qw_o[:])
            qx_o[:] = jnp.where(tw, ix, qx_o[:])
            qy_o[:] = jnp.where(tw, iy, qy_o[:])
            qz_o[:] = jnp.where(tw, iz, qz_o[:])
            if coulomb == "ewald":
                sre_o[:] = sre_o[:] + okf * d_re
                sim_o[:] = sim_o[:] + okf * d_im

            du_t = jnp.where(ok, du, jnp.zeros_like(du))
            isaf = is_a.astype(jnp.float32)
            upd = jnp.concatenate(
                [du_t, okf * isaf, okf * (1.0 - isaf), isaf,
                 1.0 - isaf, jnp.zeros((cb, 3), jnp.float32)], axis=1)
            return stats + upd

        stats = jax.lax.fori_loop(
            0, n_flip, fattempt, jnp.zeros((cb, 8), jnp.float32))
        stats_o[:] = stats_in[:] + stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cap_a", "cap_b", "P0", "P1", "a0_b", "coulomb",
                     "n_types", "has_lj0", "has_q0", "has_lj1", "has_q1",
                     "rc2", "qrc2", "kappa_l", "d2_overlap", "ln_xi",
                     "n_flip", "cb", "interpret", "use_lrc"),
)
def flip_pallas(x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act, actm,
                box, temp, si2, lrc3, stats, seed, chain_keys,
                body0, qp0, body1, qp1, eps0_pt, sig20_pt, eps1_pt,
                sig21_pt, tid_row, molid_row, q_row, kx, ky, kz, kw, *,
                cap_a, cap_b, P0, P1, a0_b, coulomb, n_types,
                has_lj0, has_q0, has_lj1, has_q1, rc2, qrc2, kappa_l,
                d2_overlap, ln_xi, n_flip, cb=64, interpret=False,
                use_lrc=False):
    """n_flip in-kernel semigrand identity flips on the standard
    two-block slot layout (see _make_flip_kernel).  Planes
    (C, A_pad)/(C, M_pad)/(C, K); box/temp (C, 1); si2 (C, 2)
    per-species self+intra constants; lrc3 (C, 3) per-chain LJ-tail
    coefficients [g*c00, g*c01, g*c11] (read only when use_lrc — pass
    zeros otherwise); stats (C, 8).
    Returns (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act, actm,
    stats); stats columns [d_e, acc_ab, acc_ba, att_ab, att_ba, 0,0,0].
    """
    C, A_pad = x.shape
    K = sre.shape[1]
    M_pad = cx.shape[1]
    assert A_pad % 128 == 0 and M_pad % 128 == 0
    cb = next(b for b in (min(cb, C), 32, 16, 8, 4, 2, 1) if C % b == 0)
    grid = (C // cb,)

    kern = _make_flip_kernel(cap_a, cap_b, P0, P1, a0_b, coulomb,
                             n_types, has_lj0, has_q0, has_lj1, has_q1,
                             rc2, qrc2, kappa_l, d2_overlap, K, ln_xi,
                             n_flip, use_lrc)

    cell = lambda n: pl.BlockSpec((cb, n), lambda c: (c, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    shared = lambda r, n: pl.BlockSpec((r, n), lambda c: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda c: (0, 0),  # noqa: E731
                                  memory_space=pltpu.SMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((cb, 1), lambda c: (c, 0), memory_space=pltpu.SMEM),
        smem(body0), smem(qp0), smem(body1), smem(qp1),
        smem(eps0_pt), smem(sig20_pt), smem(eps1_pt), smem(sig21_pt),
        shared(1, A_pad), shared(1, A_pad), shared(1, A_pad),
        shared(1, K), shared(1, K), shared(1, K), shared(1, K),
        cell(A_pad), cell(A_pad), cell(A_pad),
        cell(M_pad), cell(M_pad), cell(M_pad),
        cell(M_pad), cell(M_pad), cell(M_pad), cell(M_pad),
        cell(K), cell(K), cell(A_pad), cell(M_pad),
        cell(1), cell(1), cell(2), cell(3), cell(8),
    ]
    operands = [
        seed.reshape(1, 1), chain_keys.reshape(C, 1).astype(jnp.int32),
        body0, qp0, body1, qp1,
        eps0_pt, sig20_pt, eps1_pt, sig21_pt,
        tid_row.reshape(1, A_pad), molid_row.reshape(1, A_pad),
        q_row.reshape(1, A_pad),
        kx.reshape(1, K), ky.reshape(1, K), kz.reshape(1, K),
        kw.reshape(1, K),
        x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act, actm,
        box, temp, si2, lrc3, stats,
    ]
    out_specs = [cell(A_pad)] * 3 + [cell(M_pad)] * 7 + [cell(K)] * 2 \
        + [cell(A_pad), cell(M_pad), cell(8)]
    out_shape = [
        jax.ShapeDtypeStruct(s.shape, jnp.float32)
        for s in (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act,
                  actm, stats)
    ]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((max(P0 + P1, 8), A_pad), jnp.float32),
            pltpu.VMEM((max(P0 + P1, 8), A_pad), jnp.float32),
            pltpu.VMEM((cb, K), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)
    return outs
