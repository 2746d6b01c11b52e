"""Micro-bench: banded triangular solves, block scan vs panelized scan.

Times R chained solves inside ONE jit (per-dispatch wall timing lies on the
tunneled axon runtime — see PROGRESS.md quirks) at the production c1 shape
(n ~ 60k, semiband ~ 900, nb = 128).

Usage: python scripts/bench_band_solve.py [n] [semiband] [repeats]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    semiband = int(sys.argv[2]) if len(sys.argv) > 2 else 900
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from meshopticalflow_tpu.solvers.banded import (
        BandedCholeskySolver, band_solve, band_solve_panels,
        build_band_pattern, build_solve_panels)

    rng = np.random.default_rng(0)
    # Banded SPD: tridiagonal-ish plus a band-edge coupling at +-semiband.
    diags = [np.full(n, 6.0), np.full(n - 1, -1.0), np.full(n - 1, -1.0),
             np.full(n - semiband, -0.5), np.full(n - semiband, -0.5)]
    offs = [0, 1, -1, semiband, -semiband]
    a = sp.diags(diags, offs).tocsr()
    nnz = np.diff(a.indptr)
    w = int(nnz.max())
    cols = np.zeros((n, w), np.int64)
    vals = np.zeros((n, w), np.float64)
    rows = np.repeat(np.arange(n), nnz)
    slots = np.arange(a.nnz) - np.repeat(a.indptr[:-1], nnz)
    cols[rows, slots] = a.indices
    vals[rows, slots] = a.data
    pad = np.arange(w)[None, :] >= nnz[:, None]
    cols = np.where(pad, cols[:, :1], cols)

    pat = build_band_pattern(cols.astype(np.int32), nb=128)
    print(f"n={n} semiband={semiband} -> nb={pat.nb} bw={pat.bw} m={pat.m}")
    solver = BandedCholeskySolver(pat, solve_panel_k=1)
    t0 = time.time()
    solver.factor(jnp.asarray(vals, jnp.float32))
    solver.l_blocks.block_until_ready()
    print(f"factor: {time.time() - t0:.3f} s")
    b = jnp.asarray(rng.normal(size=n), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain_block(l_blocks, perm, inv_perm, b, r):
        def body(_, x):
            return band_solve(l_blocks, perm, inv_perm, b + 1e-6 * x,
                              pat.nb, pat.bw, pat.n)
        return lax.fori_loop(0, r, body, b)

    def timed(fn, *args):
        out = fn(*args)   # compile + warm
        out.block_until_ready()
        t0 = time.time()
        out = fn(*args)
        out.block_until_ready()
        float(jnp.sum(out))
        return (time.time() - t0) / repeats

    t = timed(chain_block, solver.l_blocks, solver.perm, solver.inv_perm, b,
              repeats)
    print(f"block solve (nb={pat.nb}, {2 * pat.m} steps): {1e3 * t:.2f} ms")

    for k in (2, 4, 8):
        if k * pat.nb > pat.bw:
            continue
        dinv, pbelow = build_solve_panels(solver.l_blocks, k)
        dinv.block_until_ready()

        @functools.partial(jax.jit, static_argnames=("r",))
        def chain_panel(dinv, pbelow, perm, inv_perm, b, r):
            def body(_, x):
                return band_solve_panels(dinv, pbelow, perm, inv_perm,
                                         b + 1e-6 * x, pat.n)
            return lax.fori_loop(0, r, body, b)

        t = timed(chain_panel, dinv, pbelow, solver.perm, solver.inv_perm, b,
                  repeats)
        mp = dinv.shape[0]
        mb = (dinv.size + pbelow.size) * 4 / 1e6
        print(f"panel solve (S={k * pat.nb}, {2 * mp} steps, {mb:.0f} MB): "
              f"{1e3 * t:.2f} ms")


if __name__ == "__main__":
    main()
