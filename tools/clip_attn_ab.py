"""Single-op A/B: untapped tower attention (L.mha return_attn=False),
XLA vs the Pallas no-tap kernel, at the AlphaCLIP ranking geometry.

The 128-proposal AlphaCLIP stage (reference
mars/components/FilteringMergingModule.py:183-207) runs the L/14@336
visual tower — 16 heads x 577 tokens — over batch-16 chunks; its 24
untapped blocks previously took the XLA attention path, which round-trips
the (B, H, L, L) logits+probs through HBM every layer (round-4 verdict:
24% MFU on this stage).  This times ONE attention op (qkv projection +
attention + out projection) inside a lax.scan for both impls.

Usage: timeout 900 python tools/clip_attn_ab.py [--tokens 577] [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=577)  # 1 CLS + 24^2
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=64)  # width 1024
    ap.add_argument("--batch", type=int, default=16)  # alpha_clip_batch
    ap.add_argument("--iters", type=int, default=24)  # = tower depth
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", default="xla,pallas",
                    help="comma list (xla, pallas, pallas_interpret)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mars_tpu.models import layers as L

    print(f"[ab] devices: {jax.devices()}", flush=True)
    b, l, nh, hd = args.batch, args.tokens, args.heads, args.head_dim
    c = nh * hd
    rng = np.random.RandomState(0)
    dt = jnp.dtype(args.dtype)
    p = {
        "qkv": {"kernel": jnp.asarray(rng.randn(c, 3 * c) * 0.02, dt),
                "bias": jnp.zeros((3 * c,), dt)},
        "proj": {"kernel": jnp.asarray(rng.randn(c, c) * 0.02, dt),
                 "bias": jnp.zeros((c,), dt)},
    }
    x = jnp.asarray(rng.randn(b, l, c) * 0.5, dt)

    def timed(tag, impl):
        @jax.jit
        def run(x0):
            def step(carry, _):
                with L.attention_impl(impl):
                    y, _ = L.mha(p, carry, nh, return_attn=False)
                c2 = x0 * (1.0 + 0.0 * y.mean().astype(x0.dtype))
                return c2, y.mean().astype(jnp.float32)

            _, ys = jax.lax.scan(step, x0, None, length=args.iters)
            return ys

        t0 = time.time()
        _ = float(np.asarray(run(x)).sum())
        print(f"[ab] {tag}: compiled+warm in {time.time() - t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.time()
            _ = float(np.asarray(run(x)).sum())
            per = (time.time() - t0) / args.iters * 1000
            best = per if best is None else min(best, per)
        print(f"[ab] {tag}: {best:.2f} ms/layer (min of 3)", flush=True)
        return best

    res = {}
    for tag in args.impls.split(","):
        # "pallas:g4" → pallas impl with 4 heads per grid step
        impl, _, gspec = tag.partition(":")
        os.environ["MARS_NOTAP_HEADS_PER_STEP"] = gspec.lstrip("g") or "0"
        res[tag] = timed(tag, impl)
    print(f"[ab] summary: {dict((k, round(v, 2)) for k, v in res.items())}",
          flush=True)
    pallas_best = [v for k, v in res.items() if k.startswith("pallas")]
    if "xla" in res and pallas_best:
        d = args.iters * (res["xla"] - min(pallas_best))
        print(f"[ab] x{args.iters} blocks x8 chunks: "
              f"{round(8 * d, 1)} ms/episode saved by best pallas at the "
              "full 128 bucket", flush=True)


if __name__ == "__main__":
    main()
