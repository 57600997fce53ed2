"""SAM ViT-H image-encoder stage profile (hardware A/B).

The e2e proposal span at the reference's SAM config (ViT-H @1024,
build_sam.py:14-23) is dominated by the encode (~174 ms of ~326 ms,
BASELINE.md) at ~17% MFU — far off the ~29 ms bf16 matmul floor.  The
suspects are the 4 GLOBAL attention layers (image_encoder.py
global_attn_indexes): each materializes a (16, 4096, 4096) logits tensor
(512 MB bf16), adds the decomposed rel-pos bias through a 6-d reshape,
and upcasts the whole thing through an f32 softmax (2 x 1 GB traffic).

Times encode_image IN-PROGRAM (lax.scan inside one jit — any standalone
dispatch pays the ~35 ms tunnel floor) for:

  full           production path
  softmax_bf16   softmax kept in the tower dtype: isolates the f32
                 (16, 4096, 4096) materialization cost
  no_rel_pos     decomposed rel-pos bias off: isolates the bias einsums
                 + 6-d broadcast add
  all_windowed   every layer 14x14-windowed: the upper bound for a
                 flash-attention (or windowed-hybrid) global layer

Usage:  timeout 1500 python tools/sam_encode_profile.py [--size 1024]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sam-size", default="vit_h")
    ap.add_argument("--layers", type=int, default=0,
                    help="truncate the encoder to the first N layers (0 = "
                    "full depth).  A loaded remote-compile service drops "
                    "the tunnel at ~30 min on one RPC; the full 32-layer "
                    "ViT-H A/B program can exceed that, while e.g. "
                    "--layers 8 (7 windowed + global layer index 7) "
                    "compiles in minutes and the per-global-layer delta "
                    "scales by the global-layer count (4 at full depth)")
    ap.add_argument("--variants", default="full,full_pallas,windowed_only,"
                    "softmax_bf16,no_rel_pos,all_windowed",
                    help="comma-separated subset to run")
    args = ap.parse_args()
    want = set(args.variants.split(","))

    import jax
    import jax.numpy as jnp

    from mars_tpu.models import layers as L, sam, zoo
    from mars_tpu.models.precision import cast_floating

    print(f"[profile] devices: {jax.devices()}", flush=True)
    bundle, cfg = zoo.build_sam(None, args.sam_size)
    if args.layers:
        cfg = dataclasses.replace(
            cfg, depth=args.layers,
            global_attn_indexes=tuple(
                i for i in cfg.global_attn_indexes if i < args.layers))
        print(f"[profile] truncated to {cfg.depth} layers "
              f"(globals at {cfg.global_attn_indexes})", flush=True)
    params = jax.device_put(cast_floating(bundle["encoder"]))
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, args.size, args.size, 3),
        jnp.bfloat16)

    def timed(tag, enc_cfg, iters):
        # params MUST be an explicit jit argument: closed-over weights
        # embed as HLO constants and the 641M-param tower blows the
        # remote-compile service's request-body limit (HTTP 413)
        @jax.jit
        def run(prm, x):
            def step(c, _):
                y = sam.encode_image(prm, c, enc_cfg)
                # serialize iterations without changing the input value
                c2 = c * (1.0 + 0.0 * y.mean().astype(c.dtype))
                return c2, y.mean().astype(jnp.float32)

            _, ys = jax.lax.scan(step, x, None, length=iters)
            return ys

        t0 = time.time()
        _ = float(np.asarray(run(params, img)).sum())  # compile + warm run
        print(f"[profile] {tag}: compiled+warm in {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        _ = float(np.asarray(run(params, img)).sum())
        per = (time.time() - t0) / iters * 1000
        print(f"[profile] {tag}: {per:.1f} ms/encode", flush=True)
        return per

    orig_attn = sam._grid_attention

    results = {}
    # the TPU default is now the sam_attention pallas kernel on the global
    # layers; measure both impls explicitly
    L.set_attention_impl("xla")
    if "full" in want:
        results["full"] = timed("full", cfg, args.iters)
    if "full_pallas" in want:
        L.set_attention_impl("auto")
        results["full_pallas"] = timed("full_pallas", cfg, args.iters)
        L.set_attention_impl("xla")

    if "windowed_only" in want:
        # windowed kernel ON, global layers forced to the XLA path —
        # isolates the window-kernel delta from the global-kernel delta
        def _win_only(p, x, nh, use_rel_pos=True, allow_pallas=False,
                      windowed_pallas=False):
            return orig_attn(p, x, nh, use_rel_pos=use_rel_pos,
                             allow_pallas=False,
                             windowed_pallas=windowed_pallas)

        sam._grid_attention = _win_only
        L.set_attention_impl("auto")
        os.environ["MARS_SAM_WINDOWED_IMPL"] = "pallas"
        try:
            results["windowed_only"] = timed("windowed_only", cfg,
                                             args.iters)
        finally:
            sam._grid_attention = orig_attn
            L.set_attention_impl("xla")
            os.environ.pop("MARS_SAM_WINDOWED_IMPL", None)

    def bf16_softmax_attn(p, x, num_heads, use_rel_pos=True, **_kw):
        import jax.numpy as jnp

        b, h, w, c = x.shape
        hd = c // num_heads
        qkv = L.dense(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        if use_rel_pos:
            rh = sam._rel_pos_table(p["rel_pos_h"], h, h)
            rw = sam._rel_pos_table(p["rel_pos_w"], w, w)
            rq = q.reshape(b, h, w, num_heads, hd)
            bias_h = jnp.einsum("bywhd,yYd->bhywY", rq, rh)
            bias_w = jnp.einsum("bywhd,wWd->bhywW", rq, rw)
            logits = (logits.reshape(b, num_heads, h, w, h, w)
                      + bias_h[..., :, None]
                      + bias_w[..., None, :]
                      ).reshape(b, num_heads, h * w, h * w)
        probs = jax.nn.softmax(logits, axis=-1)  # tower dtype
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, c)
        return L.dense(p["proj"], out)

    try:
        if "softmax_bf16" in want:
            sam._grid_attention = bf16_softmax_attn
            results["softmax_bf16"] = timed("softmax_bf16", cfg, args.iters)

        if "no_rel_pos" in want:
            sam._grid_attention = partial(orig_attn, use_rel_pos=False)
            results["no_rel_pos"] = timed("no_rel_pos", cfg, args.iters)
    finally:
        sam._grid_attention = orig_attn

    if "all_windowed" in want:
        wcfg = dataclasses.replace(cfg, global_attn_indexes=())
        results["all_windowed"] = timed("all_windowed", wcfg, args.iters)
    L.set_attention_impl("auto")

    print("[profile] summary:", {k: round(v, 1) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
