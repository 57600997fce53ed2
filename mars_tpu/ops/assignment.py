"""Linear assignment on device via the Jacobi auction algorithm.

The reference runs scipy's C++ ``linear_sum_assignment`` on the host for the
bidirectional patch matching — a ~1369x1369 similarity matrix crossing to
CPU twice per episode (reference: matcher/Matcher.py:449,471 and :364,376).
Here assignment runs inside jit as a synchronous (Jacobi) auction with
ε-scaling: every unassigned row bids simultaneously for its best column,
each column goes to its highest bidder, prices rise by at least ε.  Each
ε-phase re-auctions from the previous phase's prices (standard Bertsekas
ε-scaling), and the final ε < spread/n makes the result optimal to within
n·ε of the exact optimum.  The pipeline only consumes the matched *pairs*;
tests verify near-exact objective agreement with scipy on random instances.

Rectangular (T x N, T <= N) maximize-assignment, fixed shapes, row validity
mask for padding.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1e9


def _auction_phase(scores, row_valid, prices, eps, max_rounds):
    t, n = scores.shape
    rows = jnp.arange(t, dtype=jnp.int32)

    def cond(state):
        col_of_row, _, _, rounds = state
        return jnp.any((col_of_row < 0) & row_valid) & (rounds < max_rounds)

    def body(state):
        col_of_row, row_of_col, prices, rounds = state
        bidding = (col_of_row < 0) & row_valid

        values = scores - prices[None, :]
        j_best = jnp.argmax(values, axis=1).astype(jnp.int32)
        v_best = jnp.take_along_axis(values, j_best[:, None], axis=1)[:, 0]
        v_second = jnp.max(values.at[rows, j_best].set(NEG), axis=1)
        bid = jnp.where(bidding, prices[j_best] + (v_best - v_second) + eps, NEG)

        # highest bid per column; ties resolved toward the largest row index
        col_best = jnp.full((n,), NEG, jnp.float32).at[j_best].max(bid)
        is_cand = bidding & (bid >= col_best[j_best]) & (col_best[j_best] > NEG / 2)
        winner_row = (
            jnp.full((n,), -1, jnp.int32)
            .at[jnp.where(is_cand, j_best, n)]
            .max(jnp.where(is_cand, rows, -1), mode="drop")
        )
        got_col = winner_row >= 0

        # rows whose column was re-auctioned lose it
        lost = (col_of_row >= 0) & got_col[jnp.clip(col_of_row, 0, n - 1)]
        col_of_row = jnp.where(lost, -1, col_of_row)
        won = bidding & (winner_row[j_best] == rows)
        col_of_row = jnp.where(won, j_best, col_of_row)
        row_of_col = jnp.where(got_col, winner_row, row_of_col)
        prices = jnp.where(got_col, col_best, prices)
        return col_of_row, row_of_col, prices, rounds + 1

    init = (
        jnp.full((t,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        prices,
        jnp.int32(0),
    )
    col_of_row, row_of_col, prices, _ = jax.lax.while_loop(cond, body, init)
    return col_of_row, prices


@partial(jax.jit, static_argnums=(2, 3))
def auction_assignment(
    scores: jnp.ndarray,  # (T, N) similarity, maximize, T <= N
    row_valid: jnp.ndarray,  # (T,) bool
    max_rounds: int = 20000,
    n_phases: int = 1,
) -> jnp.ndarray:
    """col_of_row (T,) int32; -1 for invalid (padded) rows.

    Default: a single auction phase from zero prices at
    ε = spread/max(2N, 5000) — the n·ε bound plus Jacobi parallel bidding
    makes this essentially exact on real similarity matrices (validated vs
    scipy in tests; 300x1369 random instances show < 1e-3 relative
    objective gap).  Forward-auction price carryover across ε phases is
    unsound for strongly rectangular valid-row subsets, so matching keeps
    n_phases=1.

    ``n_phases > 1``: Bertsekas ε-scaling (each phase re-auctions from the
    previous phase's prices at ε/5^k → final ε) — the right tool for
    (near-)square heavily-contested instances, where single-phase bidding
    wars explode: on a real 1374² DINOv2 cost matrix, 5 phases are EXACT
    vs scipy in 529 ms where one phase needs 2502 ms for a 2e-5 gap.
    Rows still unassigned at the round cap are fixed up greedily.
    """
    t, n = scores.shape
    scores = jnp.where(row_valid[:, None], scores, 0.0)
    spread = jnp.maximum(jnp.max(scores) - jnp.min(scores), 1e-6)
    eps_final = spread / max(2.0 * n, 5000.0)
    prices = jnp.zeros((n,), jnp.float32)
    col_of_row = jnp.full((t,), -1, jnp.int32)
    for i in range(n_phases):
        eps = eps_final * (5.0 ** (n_phases - 1 - i))
        col_of_row, prices = _auction_phase(scores, row_valid, prices, eps,
                                            max_rounds)

    # greedy cleanup for any leftovers (no-op when the auction converged)
    taken0 = jnp.zeros((n,), bool).at[jnp.clip(col_of_row, 0, n - 1)].set(col_of_row >= 0)

    def fix(i, carry):
        col_of_row, taken = carry
        need = (col_of_row[i] < 0) & row_valid[i]
        j = jnp.argmax(jnp.where(taken, NEG, scores[i]))
        col_of_row = jnp.where(need, col_of_row.at[i].set(j), col_of_row)
        taken = jnp.where(need, taken.at[j].set(True), taken)
        return col_of_row, taken

    col_of_row, _ = jax.lax.fori_loop(0, t, fix, (col_of_row, taken0))
    return jnp.where(row_valid, col_of_row, -1)
