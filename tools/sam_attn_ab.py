"""Single-op A/B: SAM global-layer grid attention, XLA vs Pallas kernel.

tools/sam_encode_profile.py times the WHOLE ViT-H encoder — the honest
number, but its 32-layer 4-variant program can take >30 min to remote-
compile under service load, at which point the tunnel drops the RPC
(observed: Broken pipe at ~27-31 min).  This tool times ONLY the global
attention op (reference image_encoder.py:224-241 geometry: 64x64 grid,
16 heads, head_dim 80 at ViT-H@1024) inside a lax.scan, for the xla and
pallas impls — a program that compiles in seconds, so the kernel-default
decision can land even in a degraded window.  Per-layer deltas here x4
global layers approximate the encoder-level saving.

Usage: timeout 900 python tools/sam_attn_ab.py [--grid 64] [--iters 32]
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
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=80)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", default="xla,pallas",
                    help="comma list (xla, pallas, pallas_interpret)")
    ap.add_argument("--windowed", type=int, default=0,
                    help="N: time the WINDOWED op instead — N windows of "
                         "--grid x --grid tokens (ViT-H@1024: "
                         "--windowed 25 --grid 14)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mars_tpu.models import layers as L, sam

    print(f"[ab] devices: {jax.devices()}", flush=True)
    g, nh, hd = args.grid, args.heads, args.head_dim
    c = nh * hd
    rng = np.random.RandomState(0)
    dt = jnp.dtype(args.dtype)
    p = {
        "qkv": {"kernel": jnp.asarray(rng.randn(c, 3 * c) * 0.02, dt),
                "bias": jnp.zeros((3 * c,), dt)},
        "proj": {"kernel": jnp.asarray(rng.randn(c, c) * 0.02, dt),
                 "bias": jnp.zeros((c,), dt)},
        "rel_pos_h": jnp.asarray(rng.randn(2 * g - 1, hd) * 0.02, dt),
        "rel_pos_w": jnp.asarray(rng.randn(2 * g - 1, hd) * 0.02, dt),
    }
    nwin = args.windowed
    x = jnp.asarray(rng.randn(max(nwin, 1), g, g, c) * 0.5, dt)

    def timed(tag, impl):
        @jax.jit
        def run(x0):
            def step(carry, _):
                with L.attention_impl(impl):
                    y = sam._grid_attention(p, carry, nh,
                                            allow_pallas=not nwin,
                                            windowed_pallas=bool(nwin))
                # keep iterations serialized without changing the value
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
    for impl in args.impls.split(","):
        if nwin:  # windowed kernel is env-gated (default xla by measurement)
            os.environ["MARS_SAM_WINDOWED_IMPL"] = (
                "pallas" if impl.startswith("pallas") else "xla")
        res[impl] = timed(impl, impl)
    print(f"[ab] summary: {dict((k, round(v, 2)) for k, v in res.items())}",
          flush=True)
    if "xla" in res and "pallas" in res:
        print(f"[ab] x4 global layers: "
              f"{round(4 * (res['xla'] - res['pallas']), 1)} ms/encode "
              "saved by pallas", flush=True)


if __name__ == "__main__":
    main()
