"""Chunked vmap: apply a per-chain function over the chain axis in fixed
groups, bounding peak memory for O(A^2)-style computations (full-energy
recomputes, neighbor-list rebuilds, RDF histograms)."""

import jax


def chunked_vmap(fn, chunk, *arrays):
    """vmap(fn) over the leading axis of *arrays, executed `chunk` rows at
    a time via lax.scan.  When the leading axis is not divisible by the
    chunk, the largest divisor <= chunk is used instead (never an error,
    never a silent 1-row degrade worse than necessary).  Returns stacked
    results with the original leading axis."""
    c = arrays[0].shape[0]
    g = min(chunk, c)
    while c % g:
        g -= 1
    rs = lambda x: x.reshape((c // g, g) + x.shape[1:])  # noqa: E731

    def body(_, args):
        return None, jax.vmap(fn)(*args)

    _, out = jax.lax.scan(body, None, tuple(rs(a) for a in arrays))
    return jax.tree.map(lambda x: x.reshape((c,) + x.shape[2:]), out)
