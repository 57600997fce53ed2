"""Batched earth-mover's distance with uniform marginals, on device.

The reference computes exact EMD per proposal on the host with POT's C++
network simplex in a Python loop (``ot.emd2`` over a boolean-indexed cost
submatrix, reference: mars/components/FilteringMergingModule.py:142-169 and
matcher/Matcher.py:1188-1194).  Here ALL proposals are solved at once with
an ε-annealed log-domain Sinkhorn over fixed-shape compacted submatrices:

  - rows (masked support patches) are compacted once into a T-bucket,
  - each proposal's columns (masked query patches) into a C-bucket,
  - one (P, T, C) tensor of gathered costs is iterated entirely in
    VMEM-friendly tiles by XLA.

ε-scaling drives the regularized optimum toward the exact one; for the
pipeline the EMD scores feed a min-max scale + threshold, so ~1e-3 absolute
accuracy suffices (validated against exact LP in tests).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def compact_indices(mask: jnp.ndarray, bucket: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Indices of up to ``bucket`` True entries of a flat bool mask.

    Returns (indices (bucket,), valid (bucket,), count ()).  Truncates if the
    mask has more than ``bucket`` entries (callers size buckets generously).
    """
    n = mask.shape[0]
    bucket = min(bucket, n)
    order = jnp.argsort(~mask)  # True entries first, stable
    idx = order[:bucket]
    count = jnp.minimum(jnp.sum(mask), bucket)
    valid = jnp.arange(bucket) < count
    return idx.astype(jnp.int32), valid, count


def _sinkhorn_uniform(cost, row_valid, col_valid, eps_schedule, iters_schedule):
    """Log-domain Sinkhorn with uniform marginals on masked (T, C) costs.

    ``eps_schedule``/``iters_schedule``: per-level ε and iteration counts —
    convergence error dominates entropic bias at small ε, so the fine level
    gets most of the budget.  Returns the UNregularized cost <P, C>.
    """
    t, c = cost.shape
    nr = jnp.maximum(jnp.sum(row_valid), 1)
    nc = jnp.maximum(jnp.sum(col_valid), 1)
    log_a = jnp.where(row_valid, -jnp.log(nr.astype(jnp.float32)), NEG)
    log_b = jnp.where(col_valid, -jnp.log(nc.astype(jnp.float32)), NEG)
    cmask = jnp.where(row_valid[:, None] & col_valid[None, :], 0.0, NEG)

    f = jnp.zeros((t,), jnp.float32)
    g = jnp.zeros((c,), jnp.float32)

    for eps, n_it in zip(eps_schedule, iters_schedule):
        mlogk = (-cost) / eps + cmask  # (T, C) log kernel + mask

        def it(_, fg, eps=eps, mlogk=mlogk):
            f, g = fg
            f = eps * (log_a - jax.nn.logsumexp(mlogk + (g / eps)[None, :], axis=1))
            f = jnp.where(row_valid, f, 0.0)
            g = eps * (log_b - jax.nn.logsumexp(mlogk + (f / eps)[:, None], axis=0))
            g = jnp.where(col_valid, g, 0.0)
            return f, g

        f, g = jax.lax.fori_loop(0, n_it, it, (f, g))
    eps_last = eps_schedule[-1]
    logp = (f[:, None] + g[None, :] - cost) / eps_last + cmask
    plan = jnp.exp(jnp.clip(logp, -80.0, 80.0))
    return jnp.sum(plan * cost)


@partial(jax.jit, static_argnums=(3, 4, 5, 6),
         static_argnames=("row_bucket", "col_bucket", "eps_schedule",
                          "iters_schedule", "chunk"))
def batched_emd(
    cost_matrix: jnp.ndarray,  # (R, L) full cost matrix, rows=support patches
    row_mask: jnp.ndarray,  # (R,) bool — support-mask pooled footprint
    col_masks: jnp.ndarray,  # (P, L) bool — per-proposal pooled footprints
    row_bucket: int = 1024,
    col_bucket: int = 512,
    eps_schedule=(0.15, 0.03, 0.008, 0.0025),
    iters_schedule=(10, 20, 40, 90),
    col_valid=None,  # (P,) bool — live proposals (padding rows skipped)
    chunk: int = 16,
) -> jnp.ndarray:
    """EMD of every proposal against the support footprint → (P,) float32.

    Proposals with empty footprints get EMD 0 (their score is masked out
    downstream by the proposal-validity mask anyway).

    With ``col_valid``, valid proposals are compacted to the front and the
    Sinkhorn solve runs in chunks gated by a runtime ``lax.cond`` — padded
    bucket rows cost nothing (same pattern as the AlphaCLIP chunk skip):
    a 7-proposal episode in a 128 bucket runs 1 chunk of 16, not 128 lanes.

    The ROW bucket gets a static ladder: the support footprint is shared
    by every proposal in the call, so ONE ``lax.cond`` ladder outside the
    proposal loop picks the smallest {256, 512, row_bucket} slice that
    covers the live rows (rows are compacted to the front).  Dead rows
    only ever contribute exp(NEG) ≈ 0 to the column logsumexp, so a
    tighter slice is numerically the same solve at a fraction of the
    per-iteration (T, C) elementwise work — the Sinkhorn stage is
    exp/logsumexp VPU-bound (propose-path score+merge measured 170 ms of
    a 378 ms program at T=1024 with ~150-500 live rows).
    """
    ridx, rvalid_full, rcount = compact_indices(row_mask, row_bucket)
    sub_rows_full = cost_matrix[ridx]  # (row_bucket, L)

    def solve_all(t_rows: int):
        sub_rows = sub_rows_full[:t_rows]
        rvalid = rvalid_full[:t_rows]

        def one(col_mask):
            cidx, cvalid, ccount = compact_indices(col_mask, col_bucket)
            sub = sub_rows[:, cidx]  # (T, C)
            emd = _sinkhorn_uniform(sub, rvalid, cvalid, eps_schedule,
                                    iters_schedule)
            return jnp.where(ccount > 0, emd, 0.0)

        p = col_masks.shape[0]
        if col_valid is None or p % chunk != 0:
            return jax.vmap(one)(col_masks)

        order = jnp.argsort(~col_valid, stable=True)
        inv = jnp.zeros((p,), jnp.int32).at[order].set(
            jnp.arange(p, dtype=jnp.int32))
        n_valid = jnp.sum(col_valid)
        cm = col_masks[order].reshape(p // chunk, chunk, col_masks.shape[1])
        starts = jnp.arange(p // chunk, dtype=jnp.int32) * chunk

        def body(_, inp):
            m, start = inp
            e = jax.lax.cond(
                start < n_valid,
                lambda mm: jax.vmap(one)(mm),
                lambda mm: jnp.zeros((chunk,), jnp.float32),
                m,
            )
            return None, e

        _, e = jax.lax.scan(body, None, (cm, starts))
        return e.reshape(p)[inv]

    levels = [b for b in (256, 512) if b < row_bucket] + [row_bucket]
    if len(levels) == 1:
        return solve_all(row_bucket)

    def build(i):
        if i == len(levels) - 1:
            return lambda: solve_all(levels[i])
        return lambda: jax.lax.cond(
            rcount <= levels[i], lambda: solve_all(levels[i]), build(i + 1))

    return build(0)()


def exact_emd_lp(cost: "np.ndarray") -> float:
    """Exact EMD with uniform marginals via scipy linprog — test oracle only
    (the reference's ot.emd2 network simplex equivalent)."""
    import numpy as np
    from scipy.optimize import linprog

    t, c = cost.shape
    a = np.full(t, 1.0 / t)
    b = np.full(c, 1.0 / c)
    # variables P_ij flattened
    A_eq = []
    b_eq = []
    for i in range(t):
        row = np.zeros(t * c)
        row[i * c : (i + 1) * c] = 1
        A_eq.append(row)
        b_eq.append(a[i])
    for j in range(c):
        row = np.zeros(t * c)
        row[j::c] = 1
        A_eq.append(row)
        b_eq.append(b[j])
    res = linprog(cost.reshape(-1), A_eq=np.array(A_eq), b_eq=np.array(b_eq),
                  bounds=(0, None), method="highs")
    assert res.success
    return float(res.fun)
