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


def _auction_phase(scores, row_valid, prices, eps, max_rounds,
                   row_chunk=None):
    t, n = scores.shape
    rows = jnp.arange(t, dtype=jnp.int32)

    if row_chunk is not None and t > row_chunk:
        # chunk-gated bidding: each round only reads the score-matrix row
        # chunks that contain an ACTIVE bidder (same lax.cond skip pattern
        # as the AlphaCLIP/EMD stages).  Bidding-war length is data-
        # dependent (near-tie values war for ~spread/eps rounds), and each
        # dense round streams the full (T, N) matrix; with valid rows
        # compacted to the front (auction_assignment), a war round touches
        # ceil(n_bidders/row_chunk) chunks instead.  Bit-exact: skipped
        # chunks have no bidders, and a non-bidding row's j_best is never
        # consumed (is_cand requires bidding).
        pad = (-t) % row_chunk
        scores_c = jnp.pad(scores, ((0, pad), (0, 0))).reshape(
            -1, row_chunk, n)
        n_chunks = scores_c.shape[0]

        def _bids(bidding, prices):
            bd_c = jnp.pad(bidding, (0, pad)).reshape(n_chunks, row_chunk)

            def one(args):
                sc, bd = args  # (C, N), (C,)
                values = sc - prices[None, :]
                j = jnp.argmax(values, axis=1).astype(jnp.int32)
                v1 = jnp.take_along_axis(values, j[:, None], axis=1)[:, 0]
                v2 = jnp.max(
                    values.at[jnp.arange(row_chunk), j].set(NEG), axis=1)
                return j, jnp.where(bd, prices[j] + (v1 - v2) + eps, NEG)

            def guarded(args):
                return jax.lax.cond(
                    jnp.any(args[1]), one,
                    lambda _: (jnp.zeros((row_chunk,), jnp.int32),
                               jnp.full((row_chunk,), NEG, jnp.float32)),
                    args)

            j, bid = jax.lax.map(guarded, (scores_c, bd_c))
            return j.reshape(-1)[:t], bid.reshape(-1)[:t]
    else:
        def _bids(bidding, prices):
            values = scores - prices[None, :]
            j_best = jnp.argmax(values, axis=1).astype(jnp.int32)
            v_best = jnp.take_along_axis(values, j_best[:, None], axis=1)[:, 0]
            v_second = jnp.max(values.at[rows, j_best].set(NEG), axis=1)
            bid = jnp.where(bidding,
                            prices[j_best] + (v_best - v_second) + eps, NEG)
            return j_best, bid

    def cond(state):
        col_of_row, _, _, rounds = state
        return jnp.any((col_of_row < 0) & row_valid) & (rounds < max_rounds)

    def body(state):
        col_of_row, row_of_col, prices, rounds = state
        bidding = (col_of_row < 0) & row_valid
        j_best, bid = _bids(bidding, prices)

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


@partial(jax.jit, static_argnums=(2, 3, 4))
def auction_assignment(
    scores: jnp.ndarray,  # (T, N) similarity, maximize, T <= N
    row_valid: jnp.ndarray,  # (T,) bool
    max_rounds: int = 20000,
    n_phases: int = 1,
    row_chunk: int = None,
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

    ``row_chunk``: enable chunk-gated bidding for SPARSE-valid instances
    (e.g. the matching auctions: ≤ |support footprint| bidders over a
    1369² matrix).  Valid rows are compacted to the front (one gather) and
    each war round reads only the chunks holding an active bidder.
    Bit-exact vs the dense path: stable compaction preserves the relative
    order of valid rows, so the largest-row-index tie-break picks the same
    physical row, invalid rows never bid, and the greedy cleanup visits
    valid rows in the same sequence.  Leave None for dense-valid instances
    (a fully-contested early round would touch every chunk sequentially).
    """
    t, n = scores.shape
    scores = jnp.where(row_valid[:, None], scores, 0.0)
    spread = jnp.maximum(jnp.max(scores) - jnp.min(scores), 1e-6)
    eps_final = spread / max(2.0 * n, 5000.0)
    prices = jnp.zeros((n,), jnp.float32)

    order = None
    if row_chunk is not None and t > row_chunk:
        order = jnp.argsort(~row_valid, stable=True)  # valid rows first
        scores = scores[order]
        row_valid = row_valid[order]

    col_of_row = jnp.full((t,), -1, jnp.int32)
    for i in range(n_phases):
        eps = eps_final * (5.0 ** (n_phases - 1 - i))
        col_of_row, prices = _auction_phase(scores, row_valid, prices, eps,
                                            max_rounds, row_chunk=row_chunk)

    # greedy cleanup for any leftovers — gated: when the auction converged
    # (the common case) the T sequential fixup steps are skipped entirely
    def fixup(col_of_row):
        taken0 = jnp.zeros((n,), bool).at[
            jnp.clip(col_of_row, 0, n - 1)].set(col_of_row >= 0)

        def fix(i, carry):
            col_of_row, taken = carry
            need = (col_of_row[i] < 0) & row_valid[i]
            j = jnp.argmax(jnp.where(taken, NEG, scores[i]))
            col_of_row = jnp.where(need, col_of_row.at[i].set(j), col_of_row)
            taken = jnp.where(need, taken.at[j].set(True), taken)
            return col_of_row, taken

        return jax.lax.fori_loop(0, t, fix, (col_of_row, taken0))[0]

    col_of_row = jax.lax.cond(
        jnp.any((col_of_row < 0) & row_valid), fixup, lambda c: c, col_of_row)
    col_of_row = jnp.where(row_valid, col_of_row, -1)
    if order is not None:
        col_of_row = jnp.zeros((t,), jnp.int32).at[order].set(col_of_row)
    return col_of_row
