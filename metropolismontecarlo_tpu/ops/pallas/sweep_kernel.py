"""Whole-sweep Pallas mega-kernel: M Metropolis moves per chain with the
ENTIRE chain state resident in VMEM.

The per-move kernel (delta_energy.py) still pays per-move HBM reads of
the coordinate planes plus XLA scan-carry overhead.  This kernel loads a
block of chains ONCE — coordinate planes, COM/quaternion planes, Ewald
structure factors, energies, counters — and runs the full sweep
(proposal, pair energies, reciprocal delta, Metropolis, state update)
inside a fori_loop, writing state back at the end.  HBM traffic per
sweep is O(state), i.e. ~1/M of the per-move kernel's.

Requirements (the flagship configurations satisfy all of them):
  * uniform molecules (every molecule shares one body template/charge/
    type pattern — water, monatomic LJ, triatomic),
  * site cutoff, unshifted LJ, f32, fixed box during the sweep (volume
    moves and step-size adaptation happen between sweeps, as in the
    driver),
  * coulomb in {none, wolf, ewald, bare}.

RNG: the on-core PRNG (pltpu.prng_*), seeded per (cell, sweep) from the
global move counter — deterministic and resume-stable, but a DIFFERENT
stream from the jax.random path, so cross-path tests compare invariants
and statistics, not trajectories.

Reference counterpart: the whole of `Loop`'s inner body
(`Ewald/main.jl:490-639`) including `random_translate_vector`,
`random_rotate_quaternion`, `LJ_poly_ΔU`, `EwaldReal`, `RecipMove`,
`Metropolis`, and the accept/reject bookkeeping.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metropolismontecarlo_tpu.ops.pallas.delta_energy import _erfc_f32, _recip_nr
from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR

_TWO_PI = 6.283185307179586
_FACTOR = float(COULOMB_FACTOR)


def _sincos_npi(ph):
    """(sin, cos) for range-reduced ph in [-pi, pi] via shared-u minimax
    polynomials (cos: deg-6 in u=ph^2, 1.1e-8 abs; sin: deg-5, 9.5e-8 abs
    — both below the f32 phase-accumulation noise).  Mosaic lowers
    jnp.cos/sin to long generic range-reduced expansions; with the
    explicit reduction already done, the two together cost ~14 fma
    (measured: the 12 per-move trig evals in the reciprocal block were
    ~120 us of a 680 us kernel-move)."""
    u = ph * ph
    c = (0.999999989 + u * (-0.499999892 + u * (0.0416664902
         + u * (-0.00138878078 + u * (2.47699663e-05
         + u * (-2.70797753e-07 + u * 1.72476047e-09))))))
    s = ph * (0.999999604 + u * (-0.166665535 + u * (0.00833240763
              + u * (-0.000198087408 + u * (2.69982354e-06
              + u * -2.03662567e-08)))))
    return s, c


def _uniform(bits):
    """random bits -> f32 uniforms in [0, 1).

    Mosaic can't cast uint32->f32; shift to 24 bits (sign-safe) and cast
    via int32 instead."""
    ubits = pltpu.bitcast(bits, jnp.uint32)
    sbits = pltpu.bitcast(ubits >> 8, jnp.int32)  # < 2^24, non-negative
    return sbits.astype(jnp.float32) * (1.0 / 16777216.0)


def _make_kernel(M, P, coulomb, n_types, has_lj, has_q, rc2, qrc2,
                 kappa_l, d2_overlap, p_translate, use_rot, K, lj_shift,
                 m_start, a_start, slab, use_act, n_exch, tmmc, np_pad,
                 p_dep, n_widom):
    """Builds the kernel body (all sizes/flags static).

    M molecules are swept starting at global molecule index `m_start`,
    whose atoms are the P-wide column groups starting at column
    `a_start` — a species BLOCK of a ragged mixture (m_start=a_start=0
    and M=n_mol for uniform systems).  Within the block every molecule
    shares one body/charge/type template; the pair grid spans ALL atom
    lanes, so cross-species interactions are exact.

    slab: None = dense scan of the full planes.  Else the sorted-slab
    window config (a0_w, A_blk, W, in_wblk, dense_segs) — see
    mc.moves.slab_config: the pair scan reads each non-windowed block as
    a static segment plus ONE W-wide aligned window of the (z-sorted)
    windowed block, whose per-slot static base comes from wst_ref.
    Periodic wrap reads the ghost halo (head-replica columns after the
    last real atom); accepted moves of windowed-block head molecules
    write their ghost twin too.  Own-molecule exclusion is by column
    range (storage is species-blocked, so a molecule's atoms are
    contiguous).

    use_act: per-chain ACTIVITY masking for fluctuating-N ensembles
    (muVT/Gibbs displacement sweeps): act_in is a (cb, A_pad) f32 plane,
    1.0 on atoms of active molecules, 0.0 on inactive slots and lane
    pads.  Inactive molecules are force-rejected (null moves — the sweep
    stays a valid fixed-N kernel between exchange steps) and inactive
    NEIGHBOR lanes contribute exactly zero to pair energies (the dense
    path's `atom_ok_of` mask, mc/gcmc_mol.py).  Activity never changes
    during the M-move sweep; exchanges run on the jnp path between
    sweeps, or in-kernel via n_exch.

    n_exch > 0 (requires use_act, slab=None, a single species block):
    after the M-move sweep, run n_exch grand-canonical EXCHANGE attempts
    (insertion at a uniform pose / deletion of a uniform active
    molecule, 50/50) entirely in VMEM — the muVT hot loop
    (mc/gcmc_mol._one_step) without the jnp scan.  Extra operands: the
    molecule-level activity plane actm (cb, M_pad), per-chain activity
    z, self+intra constant si and reference-Wolf coefficient wc (each
    (cb, 1)); extra outputs: the updated atom- and molecule-level
    activity planes.  Per-chain DYNAMIC slot selection runs on full-row
    one-hot masked reductions (no dynamic lane slicing): deletion picks
    argmax of per-lane uniforms over active slots (uniform on the
    active set), insertion the first inactive slot, exactly the jnp
    path's proposal measure.  Acceptance is the standard muVT rule in
    log space; the insertion overlap veto rides the energy as a +1e30
    penalty like the move path.

    tmmc (requires n_exch): Rao-Blackwellized collection-matrix and
    energy-moment deposits per exchange attempt (both branches are
    evaluated every attempt, mirroring mc/gcmc_mol's analytic deposit
    of BOTH pa's), bias eta entering the acceptance thresholds only —
    with eta = 0 the sampled trajectory is bit-identical to the
    tmmc=False kernel (the per-branch arithmetic is shared).  Extra
    operands: eta row (1, np_pad) and the carried energy e (cb, 1);
    extra outputs: cmat and uhist as (cb, 3 * np_pad) planes
    ([stay | up | down] and [count | sum E | sum E^2] segments);
    p_dep is the analytically-folded exchange-type probability.

    n_widom > 0 (requires use_act, slab=None): after the sweep and any
    exchanges, evaluate n_widom GHOST insertion poses — the same trial
    measure and energy model as an in-kernel insertion attempt — and
    deposit sum(w) / sum(w^2) of the Boltzmann factors
    w = exp(-beta dU_ins) into the wid output plane (cb, 128) columns
    0/1, WITHOUT touching any state (Widom 1963; mc/widom.py
    make_widom_fn is the jnp counterpart, whose du this matches up to
    the kernel's f32 polynomial approximations and the position-
    independent LRC increment the caller folds in outside).  The
    insertion overlap veto rides dU as +1e30, so vetoed ghosts deposit
    exactly 0 — the jnp path's `overlap -> 0` contract."""

    def kernel(*refs):
        (seed_ref, ckey_ref, wst_ref, body_ref, qp_ref, eps_pt_ref,
         sig2_pt_ref, lam1_pt_ref, lam2_pt_ref,
         tid_ref, molid_ref, qrow_ref, kx_ref, ky_ref, kz_ref, kw_ref,
         x_in, y_in, z_in, cx_in, cy_in, cz_in,
         qw_in, qx_in, qy_in, qz_in, sre_in, sim_in, act_in,
         box_ref, temp_ref, drmax_ref, dphi_ref, stats_in) = refs[:34]
        i_r = 34
        if n_exch or n_widom:
            actm_in, z_ref, si_ref, wc_ref = refs[i_r:i_r + 4]
            i_r += 4
            if tmmc:
                eta_ref, e_ref = refs[i_r:i_r + 2]
                i_r += 2
        (x_o, y_o, z_o, cx_o, cy_o, cz_o,
         qw_o, qx_o, qy_o, qz_o, sre_o, sim_o, stats_o) = refs[i_r:i_r + 13]
        i_r += 13
        if n_exch or n_widom:
            act_o, actm_o = refs[i_r:i_r + 2]
            i_r += 2
            if tmmc:
                cm_o, uh_o = refs[i_r:i_r + 2]
                i_r += 2
        if n_widom:
            wid_o = refs[i_r]
            i_r += 1
        (eps_rows, sig2_rows, lam1_rows, lam2_rows, cfac_s) = refs[i_r:]
        cb = x_in.shape[0]
        # Seed from (sweep counter, first chain key of this cell): chain
        # keys are globally unique, so streams stay independent across
        # grid cells AND across devices under shard_map (program_id alone
        # would repeat per device).
        pltpu.prng_seed(seed_ref[0, 0], ckey_ref[0, 0])

        # live state = output refs (copy once; VMEM-to-VMEM)
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

        box = box_ref[:]               # (cb, 1)
        temp = temp_ref[:]
        dr_max = drmax_ref[:]
        dphi_max = dphi_ref[:]
        inv_box = 1.0 / box
        kappa = kappa_l * inv_box
        if coulomb == "wolf":   # per-chain constant pairwise shift
            sh_w = _erfc_f32(kappa * jnp.sqrt(qrc2)) / jnp.sqrt(qrc2)
        M_pad = cx_in.shape[1]
        A_pad = x_in.shape[1]
        # iota rows over 128/256-wide aligned access windows: dynamic lane
        # starts must be provably 128-aligned for Mosaic, so per-molecule
        # state access goes through small aligned windows instead of
        # whole-row masked ops
        W_m = min(128, M_pad)
        W_a = min(256, A_pad)
        wiota_m = jax.lax.broadcasted_iota(jnp.int32, (1, W_m), 1)
        wiota_a = jax.lax.broadcasted_iota(jnp.int32, (1, W_a), 1)
        mol_row = molid_ref[0:1, :]

        tid_row = tid_ref[0:1, :]
        q_row = qrow_ref[0:1, :]
        valid_col = mol_row >= 0.0

        # per-row LJ parameter rows (uniform system: shared by all moves)
        for p in range(P):
            er = jnp.zeros_like(tid_row)
            sr = jnp.zeros_like(tid_row)
            l1 = jnp.zeros_like(tid_row)
            l2 = jnp.zeros_like(tid_row)
            for t in range(n_types):
                er = jnp.where(tid_row == float(t), eps_pt_ref[p, t], er)
                sr = jnp.where(tid_row == float(t), sig2_pt_ref[p, t], sr)
                if lj_shift == "linear":
                    l1 = jnp.where(tid_row == float(t), lam1_pt_ref[p, t], l1)
                    l2 = jnp.where(tid_row == float(t), lam2_pt_ref[p, t], l2)
            eps_rows[p:p + 1, :] = er
            sig2_rows[p:p + 1, :] = sr
            if lj_shift == "linear":
                lam1_rows[p:p + 1, :] = l1
                lam2_rows[p:p + 1, :] = l2

        if coulomb == "ewald":
            # per-chain reciprocal coefficients (box-dependent)
            k2 = (kx_ref[0:1, :] ** 2 + ky_ref[0:1, :] ** 2
                  + kz_ref[0:1, :] ** 2)                       # (1, K)
            kt2 = (_TWO_PI * inv_box) ** 2 * k2                # (cb, K)
            vol = box * box * box
            cfac_s[:] = kw_ref[0:1, :] * (_TWO_PI / vol) \
                * jnp.exp(-kt2 / (4.0 * kappa * kappa)) / kt2

        def body_pd(p, d):
            return body_ref[0, p * 3 + d]

        def rot_apply(w, xq, yq, zq, bx, by, bz):
            """R(q) @ b for (cb,1) quaternion columns, scalar body."""
            ww, xx, yy, zz = w * w, xq * xq, yq * yq, zq * zq
            wx, wy, wz = w * xq, w * yq, w * zq
            xy, xz, yz = xq * yq, xq * zq, yq * zq
            ox = (ww + xx - yy - zz) * bx + 2.0 * ((xy - wz) * by
                                                   + (xz + wy) * bz)
            oy = (ww - xx + yy - zz) * by + 2.0 * ((xy + wz) * bx
                                                   + (yz - wx) * bz)
            oz = (ww - xx - yy + zz) * bz + 2.0 * ((xz - wy) * bx
                                                   + (yz + wx) * by)
            return ox, oy, oz

        def move(mi, stats):
            m = mi + m_start            # global molecule index
            # ---- RNG draws for this move: (cb, 128) bits -> columns ----
            bits = pltpu.prng_random_bits((cb, 128))
            u = _uniform(bits)
            u_sel = u[:, 0:1]
            u_dx = u[:, 1:2] - 0.5
            u_dy = u[:, 2:3] - 0.5
            u_dz = u[:, 3:4] - 0.5
            u_acc = u[:, 4:5]

            # aligned 128-wide window containing molecule m's slot
            mbase = jnp.minimum(m // 128 * 128, M_pad - W_m)
            mbase = pl.multiple_of(mbase, 128)
            moff = m - mbase
            msel = wiota_m == moff         # (1, 128) one-hot in window

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
                # rotation: random axis (Box-Muller normals) + angle
                e1 = jnp.maximum(u[:, 5:6], 1e-12)
                e2 = u[:, 6:7]
                e3 = jnp.maximum(u[:, 7:8], 1e-12)
                e4 = u[:, 8:9]
                r1 = jnp.sqrt(-2.0 * jnp.log(e1))
                r2 = jnp.sqrt(-2.0 * jnp.log(e3))
                # e in [0,1): 2*pi*(e - round(e)) is the range-reduced angle
                s2_, c2_ = _sincos_npi(_TWO_PI * (e2 - jnp.round(e2)))
                s4_, c4_ = _sincos_npi(_TWO_PI * (e4 - jnp.round(e4)))
                g1 = r1 * c2_
                g2 = r1 * s2_
                g3 = r2 * c4_
                gn = jax.lax.rsqrt(g1 * g1 + g2 * g2 + g3 * g3 + 1e-20)
                angle = (2.0 * u[:, 9:10] - 1.0) * dphi_max
                half = 0.5 * angle          # |half| <= dphi_max/2 < pi
                sh, ch = _sincos_npi(half)
                sh = sh * gn
                rw, rx, ry, rz = ch, sh * g1, sh * g2, sh * g3
                # q_new = r * q  (Hamilton), identity when translating
                nw = rw * w0 - rx * x0 - ry * y0 - rz * z0
                nx = rw * x0 + rx * w0 + ry * z0 - rz * y0
                ny = rw * y0 - rx * z0 + ry * w0 + rz * x0
                nz = rw * z0 + rx * y0 - ry * x0 + rz * w0
                qn = jax.lax.rsqrt(nw * nw + nx * nx + ny * ny + nz * nz)
                nw, nx, ny, nz = nw * qn, nx * qn, ny * qn, nz * qn
                w1 = tsel * w0 + (1.0 - tsel) * nw
                x1 = tsel * x0 + (1.0 - tsel) * nx
                y1 = tsel * y0 + (1.0 - tsel) * ny
                z1 = tsel * z0 + (1.0 - tsel) * nz
            else:
                is_trans = jnp.ones_like(u_sel) > 0.0
                tsel = jnp.ones_like(u_sel)
                w1, x1, y1, z1 = w0, x0, y0, z0

            nmx = com_mx + tsel * u_dx * dr_max
            nmy = com_my + tsel * u_dy * dr_max
            nmz = com_mz + tsel * u_dz * dr_max
            nmx = nmx - box * jnp.floor(nmx * inv_box)
            nmy = nmy - box * jnp.floor(nmy * inv_box)
            nmz = nmz - box * jnp.floor(nmz * inv_box)

            if slab is None:
                other = (mol_row != m.astype(jnp.float32)) & valid_col

            # aligned 256-wide window containing molecule m's atoms
            acol = a_start + mi * P     # first atom column of molecule m
            abase = jnp.minimum(acol // 128 * 128, A_pad - W_a)
            abase = pl.multiple_of(abase, 128)
            aoff = acol - abase
            xwin = x_o[:, pl.ds(abase, W_a)]
            ywin = y_o[:, pl.ds(abase, W_a)]
            zwin = z_o[:, pl.ds(abase, W_a)]
            if use_act:
                # own-molecule activity gate: 1.0 iff molecule m's first
                # atom column is active (columns of one molecule share
                # the activity value)
                actwin = act_in[:, pl.ds(abase, W_a)]
                gate = jnp.sum(jnp.where(wiota_a == aoff, actwin, 0.0),
                               axis=1, keepdims=True)      # (cb, 1)

            d_e = jnp.zeros((cb, 1), jnp.float32)
            olds = []
            news = []
            for p in range(P):
                # OLD atoms are READ from the stored planes (not rebuilt
                # from com+quat): the stored values are the ones the rest
                # of the system interacted with, and rebuilding introduces
                # last-bit mismatches that accumulate as energy drift.
                apick = wiota_a == aoff + p
                oxp = jnp.sum(jnp.where(apick, xwin, 0.0), axis=1,
                              keepdims=True)
                oyp = jnp.sum(jnp.where(apick, ywin, 0.0), axis=1,
                              keepdims=True)
                ozp = jnp.sum(jnp.where(apick, zwin, 0.0), axis=1,
                              keepdims=True)
                olds.append((oxp, oyp, ozp))
                if P > 1:
                    nx_, ny_, nz_ = rot_apply(w1, x1, y1, z1,
                                              body_pd(p, 0), body_pd(p, 1),
                                              body_pd(p, 2))
                else:
                    nx_ = ny_ = nz_ = jnp.zeros_like(com_mx)
                news.append((nmx + nx_, nmy + ny_, nmz + nz_))

            # ---- pair-scan parts: full planes (dense) or slab segments
            if slab is None:
                parts = [(slice(0, A_pad), other)]
            else:
                a0_w, A_blk_w, W_w, in_wblk, dense_segs = slab
                parts = []
                for b0s, wid, own_here in dense_segs:
                    b_al = b0s // 128 * 128
                    e_al = -(-(b0s + wid) // 128) * 128
                    gcol = b_al + jax.lax.broadcasted_iota(
                        jnp.int32, (1, e_al - b_al), 1)
                    msk = (gcol >= b0s) & (gcol < b0s + wid)
                    if own_here:
                        msk = msk & ((gcol < acol) | (gcol >= acol + P))
                    parts.append((slice(b_al, e_al), msk))
                # the z-sorted windowed block: one W-wide aligned window
                # at this slot's static base (SMEM table)
                wb = wst_ref[0, m]
                wb = pl.multiple_of(wb, 128)
                gcol = wb + jax.lax.broadcasted_iota(
                    jnp.int32, (1, W_w), 1)
                msk = gcol >= a0_w   # alignment overhang into prev block
                if in_wblk:
                    # exclude own atoms AND their ghost twins (+A_blk)
                    msk = msk & ((gcol < acol) | (gcol >= acol + P)) \
                        & ((gcol < acol + A_blk_w)
                           | (gcol >= acol + A_blk_w + P))
                parts.append((pl.ds(wb, W_w), msk))

            for csl, inc_mask in parts:
                pxs = x_o[:, csl]
                pys = y_o[:, csl]
                pzs = z_o[:, csl]
                q_sub = qrow_ref[0:1, csl]
                if use_act:
                    act_sub = act_in[:, csl]   # (cb, w) neighbor activity
                for p in range(P):   # p outer: hoist per-site row constants
                    use_q = coulomb != "none" and has_q[p]
                    if use_q:
                        # Coulomb factor pre-folded so LJ + Coulomb (+ the
                        # overlap penalty) share ONE masked lane-reduction
                        # per (sign, site) instead of three
                        qq = (_FACTOR * qp_ref[0, p]) * q_sub
                        att_q = qq < 0.0        # attractive rows: the only
                        # close approaches a huge energy would WELCOME —
                        # vetoed via a finite +1e30 penalty that forces
                        # rejection (exp(-beta*1e30) == 0, beta_de > 0)
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
                        d2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-4)
                        mask_lj = inc_mask & (d2 < rc2)
                        if use_q and qrc2 != rc2:
                            mask_qq = inc_mask & (d2 < qrc2)
                        else:                       # static: shared cutoff
                            mask_qq = mask_lj
                        # one rsqrt serves both: 1/d2=inv_r^2, r=d2*inv_r;
                        # maskless: the 1e-4 floor keeps everything finite
                        # (worst s6^2 ~ (sig^2 1e4)^6 stays under f32 max)
                        inv_r = jax.lax.rsqrt(d2)
                        inv_d2 = inv_r * inv_r
                        contrib = None
                        if has_lj[p]:
                            s2 = sig2_p * inv_d2
                            s6 = s2 * s2 * s2
                            pot = eps4_p * (s6 * s6 - s6)
                            if lj_shift == "linear":
                                # cut-and-force-shifted (Mossa):
                                # eps*(l1 + l2*r), l2 pre-divided by sigma
                                pot = pot + (lam1_p + lam2_p * jnp.sqrt(d2))
                            contrib = jnp.where(mask_lj, pot, 0.0)
                        if use_q:
                            r = d2 * inv_r
                            if coulomb == "ewald":
                                cp = qq * (_erfc_f32(kappa * r) * inv_r)
                            elif coulomb == "wolf":
                                cp = qq * (_erfc_f32(kappa * r) * inv_r
                                           - sh_w)
                            elif coulomb == "wolf_ref":  # ref convention:
                                # unshifted erfc pair (constant cancels)
                                cp = qq * (_erfc_f32(kappa * r) * inv_r)
                            else:
                                cp = qq * inv_r
                            if sign > 0:   # hard-overlap veto as penalty
                                cp = jnp.where(
                                    (d2 < d2_overlap) & att_q,
                                    jnp.float32(1e30), cp)
                            qpart = jnp.where(mask_qq, cp, 0.0)
                            contrib = qpart if contrib is None \
                                else contrib + qpart
                        if contrib is not None:
                            if use_act:
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
                        ph = tpl * (kx_ref[0:1, :] * ax + ky_ref[0:1, :] * ay
                                    + kz_ref[0:1, :] * az)
                        # explicit range reduction: trig expansions lose
                        # accuracy for |ph| >> pi
                        ph = ph - _TWO_PI * jnp.round(ph * (1.0 / _TWO_PI))
                        qp = sign * qp_ref[0, p]
                        sn, cs = _sincos_npi(ph)
                        ds_re += qp * cs
                        ds_im += qp * sn
                cross = 2.0 * (sre_o[:] * ds_re + sim_o[:] * ds_im) \
                    + ds_re * ds_re + ds_im * ds_im
                d_e += _FACTOR * jnp.sum(
                    cfac_s[:] * cross, axis=1, keepdims=True)

            beta_de = d_e / temp
            # the overlap veto rides d_e as a +1e30 penalty: beta_de is
            # then hugely positive, exp(-beta_de) == 0, u_acc >= 0 fails
            accept = (beta_de < 0.0) | (u_acc < jnp.exp(-beta_de))  # (cb, 1)
            if use_act:
                accept = accept & (gate > 0.0)   # inactive slot: null move
            asel = accept.astype(jnp.float32)

            # ---- state updates: masked writes within aligned windows ----
            taken = msel & accept          # (cb, 128)

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
            if slab is not None and in_wblk:
                # head molecules are replicated in the ghost halo; keep
                # the twin fresh for later windowed reads this sweep
                gown = acol + A_blk_w
                has_ghost = (acol - a0_w) < W_w
                gbase = jnp.minimum(gown // 128 * 128, A_pad - W_a)
                gbase = pl.multiple_of(gbase, 128)
                goff = gown - gbase
                gx = x_o[:, pl.ds(gbase, W_a)]
                gy = y_o[:, pl.ds(gbase, W_a)]
                gz = z_o[:, pl.ds(gbase, W_a)]
                for p in range(P):
                    nxp, nyp, nzp = news[p]
                    atk = (wiota_a == goff + p) & accept & has_ghost
                    gx = jnp.where(atk, nxp, gx)
                    gy = jnp.where(atk, nyp, gy)
                    gz = jnp.where(atk, nzp, gz)
                x_o[:, pl.ds(gbase, W_a)] = gx
                y_o[:, pl.ds(gbase, W_a)] = gy
                z_o[:, pl.ds(gbase, W_a)] = gz
            if coulomb == "ewald":
                sre_o[:] = sre_o[:] + asel * ds_re
                sim_o[:] = sim_o[:] + asel * ds_im

            # stats carry: [energy, acc_trans, acc_rot, att_trans, att_rot]
            # where-select, NOT asel*d_e: a rejected move can carry an
            # f32-overflowed (inf) delta, and inf * 0 = NaN
            d_e_taken = jnp.where(accept, d_e, jnp.zeros_like(d_e))
            gsel = gate if use_act else 1.0  # attempts count active slots
            upd = jnp.concatenate(
                [d_e_taken, asel * tsel, asel * (1.0 - tsel), gsel * tsel,
                 gsel * (1.0 - tsel), jnp.zeros((cb, 3), jnp.float32)],
                axis=1)
            return stats + upd

        stats = jax.lax.fori_loop(
            0, M, move, jnp.zeros((cb, 8), jnp.float32))

        if n_exch or n_widom:
            act_o[:] = act_in[:]
            actm_o[:] = actm_in[:]
            if tmmc:
                cm_o[:] = jnp.zeros((cb, 3 * np_pad), jnp.float32)
                uh_o[:] = jnp.zeros((cb, 3 * np_pad), jnp.float32)
                np_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, np_pad), 1).astype(jnp.float32)
                eta_row = eta_ref[0:1, :]
                e0 = e_ref[:]

                def eta_at(nn):   # (cb, 1) f32 slice index -> (cb, 1)
                    return jnp.sum(jnp.where(np_iota == nn, eta_row, 0.0),
                                   axis=1, keepdims=True)

            M_f = float(M)
            P_f = float(P)
            a0_f = float(a_start)
            miota_f = jax.lax.broadcasted_iota(
                jnp.int32, (1, M_pad), 1).astype(jnp.float32)
            valid_m = (miota_f >= float(m_start)) \
                & (miota_f < float(m_start + M))
            aiota_f = jax.lax.broadcasted_iota(
                jnp.int32, (1, A_pad), 1).astype(jnp.float32)
            if n_exch:
                lnzv = jnp.log(z_ref[:] * box * box * box)
            si_c = si_ref[:]
            wc_c = wc_ref[:]
            beta = 1.0 / temp
            tpl = _TWO_PI * inv_box
            q_full = qrow_ref[0:1, :]

            def xpair(atoms, excl, rows, act_row, veto):
                """Pair energy of one pose (list of (cb,1) per-site
                coordinates) against all ACTIVE atoms except molecule
                `excl` — the in-kernel ev.pair_energy.  veto: apply the
                insertion overlap penalty ((cb,1) bool or static)."""
                xrow, yrow, zrow = rows
                nmask = jnp.where(mol_row != excl, act_row, 0.0)
                upair = jnp.zeros((cb, 1), jnp.float32)
                for p in range(P):
                    use_q = coulomb != "none" and has_q[p]
                    ax, ay, az = atoms[p]
                    dx = xrow - ax
                    dy = yrow - ay
                    dz = zrow - az
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

            def xsfac(atoms):
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

            def du_recip(ds_re, ds_im, sgn):
                cross = 2.0 * sgn * (sre_o[:] * ds_re + sim_o[:] * ds_im) \
                    + ds_re * ds_re + ds_im * ds_im
                return _FACTOR * jnp.sum(cfac_s[:] * cross, axis=1,
                                         keepdims=True)

            def trial_pose(u):
                """Fresh trial pose from uniform columns 1-6: uniform
                position + Shoemake quaternion (the insertion measure
                shared by exchange and Widom attempts)."""
                ctx = u[:, 1:2] * box
                cty = u[:, 2:3] * box
                ctz = u[:, 3:4] * box
                if P > 1:
                    u1 = u[:, 4:5]
                    th2 = _TWO_PI * (u[:, 5:6] - jnp.round(u[:, 5:6]))
                    th3 = _TWO_PI * (u[:, 6:7] - jnp.round(u[:, 6:7]))
                    r1 = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                    r2 = jnp.sqrt(u1)
                    s2_, c2_ = _sincos_npi(th2)
                    s3_, c3_ = _sincos_npi(th3)
                    iw, ix, iy, iz = r1 * s2_, r1 * c2_, r2 * s3_, r2 * c3_
                    ins_atoms = []
                    for p in range(P):
                        ox_, oy_, oz_ = rot_apply(
                            iw, ix, iy, iz,
                            body_pd(p, 0), body_pd(p, 1), body_pd(p, 2))
                        ins_atoms.append((ctx + ox_, cty + oy_, ctz + oz_))
                else:
                    iw = jnp.ones_like(ctx)
                    ix = iy = iz = jnp.zeros_like(ctx)
                    ins_atoms = [(ctx, cty, ctz)]
                return ctx, cty, ctz, (iw, ix, iy, iz), ins_atoms

            def xattempt(xi, stats):
                bits = pltpu.prng_random_bits((cb, 128))
                u = _uniform(bits)
                is_ins = u[:, 0:1] < 0.5
                insf = is_ins.astype(jnp.float32)
                sgn = 2.0 * insf - 1.0
                u_acc = u[:, 7:8]
                actm = actm_o[:]
                n = jnp.sum(jnp.where(valid_m, actm, 0.0), axis=1,
                            keepdims=True)
                # deletion slot: argmax of iid uniforms over the active
                # set = a uniform pick (ties resolve to the lower index;
                # the tied pair is itself exchangeable, so the marginal
                # stays uniform)
                us = _uniform(pltpu.prng_random_bits((cb, M_pad)))
                score = jnp.where((actm > 0.5) & valid_m, us, -1.0)
                smax = jnp.max(score, axis=1, keepdims=True)
                del_slot = jnp.min(
                    jnp.where(score == smax, miota_f, 3.0e38),
                    axis=1, keepdims=True)
                ins_slot = jnp.min(
                    jnp.where((actm < 0.5) & valid_m, miota_f, 3.0e38),
                    axis=1, keepdims=True)
                slot = jnp.where(is_ins, ins_slot, del_slot)

                rows = (x_o[:], y_o[:], z_o[:])
                act_row = act_o[:]
                # old pose of the deletion candidate: per-chain dynamic
                # one-hot column reads (the stored values — exactly what
                # the rest of the system interacted with); slots are
                # GLOBAL molecule indices, columns are block-relative
                acol_d = a0_f + (del_slot - float(m_start)) * P_f
                olds = []
                for p in range(P):
                    opick = aiota_f == acol_d + float(p)
                    olds.append(tuple(
                        jnp.sum(jnp.where(opick, r, 0.0), axis=1,
                                keepdims=True) for r in rows))
                # fresh trial pose: uniform position + Shoemake quat
                ctx, cty, ctz, (iw, ix, iy, iz), ins_atoms = trial_pose(u)

                if tmmc:
                    # BOTH branches every attempt (Rao-Blackwellized
                    # deposits need both pa's; same per-branch arithmetic
                    # as the selected-only path, so eta=0 is bit-identical
                    # to the tmmc=False kernel)
                    excl_none = jnp.full((cb, 1), -2.0, jnp.float32)
                    u_i = xpair(ins_atoms, excl_none, rows, act_row, True)
                    u_d = xpair(olds, del_slot, rows, act_row, False)
                    du_i = u_i + si_c + wc_c * (2.0 * n + 1.0)
                    du_d = -u_d - si_c + wc_c * (-2.0 * n + 1.0)
                    if coulomb == "ewald":
                        dsi_re, dsi_im = xsfac(ins_atoms)
                        dsd_re, dsd_im = xsfac(olds)
                        du_i = du_i + du_recip(dsi_re, dsi_im, 1.0)
                        du_d = du_d + du_recip(dsd_re, dsd_im, -1.0)
                        ds_re = jnp.where(is_ins, dsi_re, dsd_re)
                        ds_im = jnp.where(is_ins, dsi_im, dsd_im)
                    du = jnp.where(is_ins, du_i, du_d)
                    ln_acc_i = lnzv - jnp.log(n + 1.0) - beta * du_i
                    ln_acc_d = jnp.log(jnp.maximum(n, 1.0)) - lnzv \
                        - beta * du_d
                    pa_i = jnp.where(n < M_f - 0.5,
                                     jnp.exp(jnp.minimum(ln_acc_i, 0.0)),
                                     0.0)
                    pa_d = jnp.where(n > 0.5,
                                     jnp.exp(jnp.minimum(ln_acc_d, 0.0)),
                                     0.0)
                    up_v = p_dep * pa_i
                    dn_v = p_dep * pa_d
                    dep = (np_iota == n).astype(jnp.float32)
                    cm_o[:, 0:np_pad] = cm_o[:, 0:np_pad] \
                        + dep * (1.0 - up_v - dn_v)
                    cm_o[:, np_pad:2 * np_pad] = \
                        cm_o[:, np_pad:2 * np_pad] + dep * up_v
                    cm_o[:, 2 * np_pad:] = cm_o[:, 2 * np_pad:] + dep * dn_v
                    e_cur = e0 + stats[:, 0:1]
                    uh_o[:, 0:np_pad] = uh_o[:, 0:np_pad] + dep
                    uh_o[:, np_pad:2 * np_pad] = \
                        uh_o[:, np_pad:2 * np_pad] + dep * e_cur
                    uh_o[:, 2 * np_pad:] = uh_o[:, 2 * np_pad:] \
                        + dep * (e_cur * e_cur)
                    eta_n = eta_at(n)
                    ln_acc_i = ln_acc_i \
                        + eta_at(jnp.minimum(n + 1.0, M_f)) - eta_n
                    ln_acc_d = ln_acc_d \
                        + eta_at(jnp.maximum(n - 1.0, 0.0)) - eta_n
                    ln_acc = jnp.where(is_ins, ln_acc_i, ln_acc_d)
                else:
                    sel = [tuple(jnp.where(is_ins, ia, oa)
                                 for ia, oa in zip(iat, oat))
                           for iat, oat in zip(ins_atoms, olds)]
                    # excl=slot serves both branches: the insertion
                    # slot's columns are inactive (act 0) anyway
                    u_sel = xpair(sel, slot, rows, act_row, is_ins)
                    du = sgn * u_sel + si_c * sgn \
                        + wc_c * (2.0 * n * sgn + 1.0)
                    if coulomb == "ewald":
                        ds_re, ds_im = xsfac(sel)
                        du = du + du_recip(ds_re, ds_im, sgn)
                    ln_acc = jnp.where(
                        is_ins, lnzv - jnp.log(n + 1.0),
                        jnp.log(jnp.maximum(n, 1.0)) - lnzv) - beta * du

                # logical ops only: a where-select on booleans lowers to
                # an i8->i1 truncation Mosaic refuses
                can = (is_ins & (n < M_f - 0.5)) \
                    | (~is_ins & (n > 0.5))
                ln_u = jnp.log(jnp.maximum(u_acc, jnp.float32(1e-30)))
                ok = can & (ln_u < ln_acc)
                okf = ok.astype(jnp.float32)

                # ---- state updates: full-row one-hot where-selects ----
                newv = insf
                mpick = miota_f == slot
                actm_o[:] = jnp.where(mpick & ok, newv, actm)
                act_o[:] = jnp.where((mol_row == slot) & ok, newv, act_row)
                wr = ok & is_ins
                acol_i = a0_f + (slot - float(m_start)) * P_f
                xrow, yrow, zrow = rows
                for p in range(P):
                    apick = (aiota_f == acol_i + float(p)) & wr
                    ax, ay, az = ins_atoms[p]
                    xrow = jnp.where(apick, ax, xrow)
                    yrow = jnp.where(apick, ay, yrow)
                    zrow = jnp.where(apick, az, zrow)
                x_o[:] = xrow
                y_o[:] = yrow
                z_o[:] = zrow
                mw = mpick & wr
                cx_o[:] = jnp.where(mw, ctx, cx_o[:])
                cy_o[:] = jnp.where(mw, cty, cy_o[:])
                cz_o[:] = jnp.where(mw, ctz, cz_o[:])
                if P > 1:
                    qw_o[:] = jnp.where(mw, iw, qw_o[:])
                    qx_o[:] = jnp.where(mw, ix, qx_o[:])
                    qy_o[:] = jnp.where(mw, iy, qy_o[:])
                    qz_o[:] = jnp.where(mw, iz, qz_o[:])
                if coulomb == "ewald":
                    sre_o[:] = sre_o[:] + (okf * sgn) * ds_re
                    sim_o[:] = sim_o[:] + (okf * sgn) * ds_im
                du_t = jnp.where(ok, du, jnp.zeros_like(du))
                upd = jnp.concatenate(
                    [du_t, jnp.zeros((cb, 4), jnp.float32),
                     okf * insf, okf * (1.0 - insf), insf], axis=1)
                return stats + upd

            if n_exch:
                stats = jax.lax.fori_loop(0, n_exch, xattempt, stats)

            if n_widom:
                wl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

                def wattempt(wi, acc):
                    bits = pltpu.prng_random_bits((cb, 128))
                    u = _uniform(bits)
                    _, _, _, _, ins_atoms = trial_pose(u)
                    n = jnp.sum(jnp.where(valid_m, actm_o[:], 0.0),
                                axis=1, keepdims=True)
                    excl_none = jnp.full((cb, 1), -2.0, jnp.float32)
                    rows = (x_o[:], y_o[:], z_o[:])
                    du_i = xpair(ins_atoms, excl_none, rows, act_o[:],
                                 True) + si_c + wc_c * (2.0 * n + 1.0)
                    if coulomb == "ewald":
                        dsr, dsi = xsfac(ins_atoms)
                        du_i = du_i + du_recip(dsr, dsi, 1.0)
                    # vetoed/overlapping ghosts ride du as +1e30 -> w = 0
                    w = jnp.exp(-beta * du_i)
                    return acc + (jnp.where(wl_iota == 0, w, 0.0)
                                  + jnp.where(wl_iota == 1, w * w, 0.0))

                wid_o[:] = jax.lax.fori_loop(
                    0, n_widom, wattempt,
                    jnp.zeros((cb, 128), jnp.float32))

        stats_o[:] = stats_in[:] + stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("M", "P", "coulomb", "n_types", "has_lj", "has_q",
                     "rc2", "qrc2", "kappa_l", "d2_overlap", "p_translate",
                     "use_rot", "cb", "interpret", "lj_shift", "m_start",
                     "a_start", "slab", "use_act", "n_exch", "tmmc",
                     "p_dep", "n_widom"),
)
def sweep_pallas(x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act,
                 box, temp, drmax, dphi, stats,
                 seed, chain_keys, wstarts, body, qp, eps_pt, sig2_pt,
                 lam1_pt, lam2_pt, tid_row, molid_row, q_row,
                 kx, ky, kz, kw, *, M, P, coulomb, n_types, has_lj, has_q,
                 rc2, qrc2, kappa_l, d2_overlap, p_translate, use_rot,
                 lj_shift="none", cb=64, interpret=False, m_start=0,
                 a_start=0, slab=None, use_act=False,
                 actm=None, zact=None, si=None, wc=None, eta=None,
                 e_in=None, n_exch=0, tmmc=False, p_dep=0.5, n_widom=0):
    """One MC sweep of a species block: molecules [m_start, m_start+M)
    whose atoms start at column a_start (0/0/n_mol = whole uniform
    system).  Planes (C, A_pad)/(C, M_pad)/(C, K); box/temp/drmax/dphi
    (C, 1); stats (C, 8); wstarts (1, n_mol) int32 static window bases
    (zeros when slab is None — see _make_kernel).  act: (C, A_pad) f32
    activity plane when use_act (see _make_kernel), else a (C, 128)
    dummy the kernel never reads.
    Returns updated (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, stats).

    n_exch > 0 appends n_exch in-kernel muVT exchange attempts (see
    _make_kernel): extra operands actm (C, M_pad) f32 molecule-level
    activity, zact/si/wc (C, 1) activity and exchange constants, and
    for tmmc eta (1, np_pad) and e_in (C, 1); the return tuple grows
    (act, actm) and, for tmmc, (cmat, uhist) as (C, 3 * np_pad) planes.
    Stats columns 5-7 become [acc_ins, acc_del, att_ins]
    (att_del = n_exch - att_ins).

    n_widom > 0 appends n_widom state-preserving Widom ghost
    evaluations (see _make_kernel) — needs the same actm/zact/si/wc
    operands as n_exch (zact is unread when n_exch == 0) and appends a
    (C, 128) wid plane to the return tuple: columns 0/1 hold
    sum(exp(-beta dU_ins)) and its square sum.
    """
    C, A = x.shape
    A_act = act.shape[1]
    K = sre.shape[1]
    assert A % 128 == 0, "atom planes must be 128-aligned"
    assert P <= 128, "molecule wider than the aligned atom window"
    MP = cx.shape[1]
    assert MP % 128 == 0, "molecule planes must be 128-padded"
    if n_exch or n_widom:
        assert use_act and slab is None, \
            "in-kernel exchanges/Widom need the activity-masked dense path"
    np_pad = -(-(M + 1) // 128) * 128 if tmmc else 0
    cb = next(b for b in (min(cb, C), 32, 16, 8, 4, 2, 1) if C % b == 0)
    grid = (C // cb,)
    wstarts = wstarts.reshape(1, -1).astype(jnp.int32)

    kern = _make_kernel(M, P, coulomb, n_types, has_lj, has_q, rc2, qrc2,
                        kappa_l, d2_overlap, p_translate, use_rot, K,
                        lj_shift, m_start, a_start, slab, use_act,
                        n_exch, tmmc, np_pad, p_dep, n_widom)

    cell = lambda n: pl.BlockSpec((cb, n), lambda c: (c, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    shared = lambda r, n: pl.BlockSpec((r, n), lambda c: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((cb, 1), lambda c: (c, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, wstarts.shape[1]), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),          # window bases
        pl.BlockSpec((1, body.shape[1]), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),          # body (1, 3P)
        pl.BlockSpec((1, qp.shape[1]), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),          # charges (1, P)
        pl.BlockSpec((eps_pt.shape[0], eps_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((sig2_pt.shape[0], sig2_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((lam1_pt.shape[0], lam1_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((lam2_pt.shape[0], lam2_pt.shape[1]),
                     lambda c: (0, 0), memory_space=pltpu.SMEM),
        shared(1, A), shared(1, A), shared(1, A),       # tid, mol, q
        shared(1, K), shared(1, K), shared(1, K), shared(1, K),
        cell(A), cell(A), cell(A),                      # x, y, z
        cell(MP), cell(MP), cell(MP),                   # com planes
        cell(MP), cell(MP), cell(MP), cell(MP),         # quat planes
        cell(K), cell(K),                               # sfac planes
        cell(A_act),                                    # activity plane
        cell(1), cell(1), cell(1), cell(1),             # box/temp/dr/dphi
        cell(8),                                        # stats
    ]
    operands = [
        seed.reshape(1, 1), chain_keys.reshape(C, 1).astype(jnp.int32),
        wstarts,
        body, qp, eps_pt, sig2_pt, lam1_pt, lam2_pt,
        tid_row.reshape(1, A), molid_row.reshape(1, A), q_row.reshape(1, A),
        kx.reshape(1, K), ky.reshape(1, K), kz.reshape(1, K),
        kw.reshape(1, K),
        x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act,
        box, temp, drmax, dphi, stats,
    ]
    out_specs = [cell(A)] * 3 + [cell(MP)] * 7 + [cell(K)] * 2 + [cell(8)]
    out_shape = [
        jax.ShapeDtypeStruct(s.shape, jnp.float32)
        for s in (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, stats)
    ]
    if n_exch or n_widom:
        in_specs += [cell(MP), cell(1), cell(1), cell(1)]
        operands += [actm, zact.reshape(C, 1), si.reshape(C, 1),
                     wc.reshape(C, 1)]
        if tmmc:
            in_specs += [shared(1, np_pad), cell(1)]
            operands += [eta.reshape(1, np_pad), e_in.reshape(C, 1)]
        out_specs += [cell(A_act), cell(MP)]
        out_shape += [jax.ShapeDtypeStruct((C, A_act), jnp.float32),
                      jax.ShapeDtypeStruct((C, MP), jnp.float32)]
        if tmmc:
            out_specs += [cell(3 * np_pad), cell(3 * np_pad)]
            out_shape += [
                jax.ShapeDtypeStruct((C, 3 * np_pad), jnp.float32),
                jax.ShapeDtypeStruct((C, 3 * np_pad), jnp.float32)]
        if n_widom:
            out_specs += [cell(128)]
            out_shape += [jax.ShapeDtypeStruct((C, 128), jnp.float32)]

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((max(P, 8), A), jnp.float32),   # eps rows
            pltpu.VMEM((max(P, 8), A), jnp.float32),   # sig2 rows
            # lam rows only materialize for the force-shifted potential
            pltpu.VMEM((max(P, 8), A if lj_shift == "linear" else 128),
                       jnp.float32),                   # lam1 rows
            pltpu.VMEM((max(P, 8), A if lj_shift == "linear" else 128),
                       jnp.float32),                   # lam2 rows
            pltpu.VMEM((cb, K), jnp.float32),          # cfac
        ],
        # the TPU interpreter (not the generic one) emulates pltpu.prng_*
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)
    return outs
