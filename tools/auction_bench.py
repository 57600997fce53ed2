"""A/B the auction implementations on the real chip.

Times the XLA while_loop path (with/without small-bidder gather + unroll)
against the whole-loop Pallas kernel at production matching geometry
(1369x1369, the bench synthetic episode's worst case: near-tie values →
thousands of war rounds), plus a benign random instance.

Each timing is min-of-N synced; every row pays the same ~35 ms tunnel
dispatch floor, so compare rows, not absolutes.

Usage: python tools/auction_bench.py [--iters 5]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mars_tpu.ops import assignment
from mars_tpu.utils.profiling import force_sync


def make_instances():
    rng = np.random.RandomState(0)
    t = n = 1369
    # near-tie: few distinct values, like low-texture cosine similarity
    wars = rng.randint(0, 8, (t, n)).astype(np.float32) / 8.0
    benign = rng.rand(t, n).astype(np.float32)
    valid_sparse = np.zeros(t, bool)
    valid_sparse[rng.choice(t, 300, replace=False)] = True
    return {
        "wars-dense-valid": (wars, np.ones(t, bool)),
        "wars-300-valid": (wars, valid_sparse),
        "benign-dense-valid": (benign, np.ones(t, bool)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    print(jax.devices(), flush=True)

    impls = {
        "xla-plain": dict(use_kernel=False, small_k=None, unroll=1),
        "xla-small+unroll": dict(use_kernel=False),
        "xla-chunk128+small": dict(use_kernel=False, row_chunk=128),
        "pallas-kernel": dict(use_kernel=True),
    }
    for iname, (s, valid) in make_instances().items():
        sj, vj = jnp.asarray(s), jnp.asarray(valid)
        ref = None
        print(f"== {iname}", flush=True)
        for name, kw in impls.items():
            t0 = time.time()
            out = assignment.auction_assignment(sj, vj, **kw)
            force_sync(out)
            compile_s = time.time() - t0
            cols = np.asarray(out)
            if ref is None:
                ref = cols
            tag = "EXACT" if np.array_equal(cols, ref) else "DIFFERS!"
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                out = assignment.auction_assignment(sj, vj, **kw)
                force_sync(out)
                times.append(time.time() - t0)
            print(f"  {name:22s} {min(times)*1e3:8.1f} ms  (compile "
                  f"{compile_s:.1f}s, mean {np.mean(times)*1e3:.0f} ms) {tag}",
                  flush=True)


if __name__ == "__main__":
    main()
