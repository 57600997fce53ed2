"""ViP-LLaVA-7B decode throughput on one chip (random int8 weights).

Measures prefill latency and steady-state decode tok/s for the VLM that
the reference runs as a second-GPU side-car (reference:
mars/components/TextRetrieverModule.py:446-490).  Usage:

    python tools/vlm_bench.py [--tokens 40] [--prompt-len 600]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mars_tpu.models import vip_llava as vl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=40)
    ap.add_argument("--prompt-len", type=int, default=600)
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--nf4", action="store_true",
                    help="with --bits 4: NF4 codebook (reference bnb "
                         "numerics) instead of the hybrid-affine kernel")
    ap.add_argument("--bucket", type=int, default=0,
                    help="right-pad the prompt to this bucket and decode "
                         "with true_length (the production path)")
    ap.add_argument("--batch", type=int, default=1,
                    help="batched variable-length decode (per-row "
                         "true_length): the retriever's ensemble path")
    ap.add_argument("--eos", action="store_true",
                    help="decode with eos_id=2 (the production retriever "
                         "path: lax.while_loop early-exit) — random weights "
                         "rarely emit EOS, so this measures the while_loop's "
                         "per-step overhead vs the fixed-trip scan")
    ap.add_argument("--draft", type=int, default=0,
                    help="prompt-lookup speculative decode width (B=1 only). "
                         "Random weights accept ~0 drafts, so the measured "
                         "ms/step IS the K+1-token verify cost — parity with "
                         "the plain step shows accepted tokens come free")
    ap.add_argument("--kv8", action="store_true",
                    help="int8 KV cache (kv_bits=8): measures the read-path "
                         "dequant tax per decode step vs the bf16 cache")
    args = ap.parse_args()
    if args.draft and args.batch > 1:
        ap.error("--draft needs --batch 1")

    cfg = vl.VipLlavaConfig()
    t0 = time.time()
    p = vl.init_random_params(0, cfg, quantize_bits=args.bits,
                              int4_format="nf4" if args.nf4 else "affine")
    n = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(p))
    print(f"init {time.time()-t0:.1f}s  params={n/1e9:.2f}B", flush=True)

    g = (cfg.image_size // cfg.patch_size) ** 2
    b = args.batch
    if b > 1:
        # batched variable-length rows, right-padded to a shared bucket
        lens = [max(g + 2, args.prompt_len - 17 * r) for r in range(b)]
        bucket = args.bucket or ((max(lens) + 127) // 128) * 128
        assert bucket >= max(lens), (bucket, max(lens))
        ids = np.zeros((b, bucket), np.int64)
        for r, l in enumerate(lens):
            ids[r, :l] = 5
            ids[r, 10] = cfg.image_token_index
        true_len = jnp.asarray(lens, jnp.int32)
    else:
        ids = np.full((1, args.prompt_len), 5, np.int64)
        ids[0, 10] = cfg.image_token_index  # one image slot
        true_len = None
        if args.bucket:
            assert args.bucket >= args.prompt_len
            true_len = jnp.int32(args.prompt_len)
            ids = np.pad(ids, ((0, 0), (0, args.bucket - args.prompt_len)))
    pixels = jnp.zeros((b, cfg.image_size, cfg.image_size, 3))

    def run(n_new):
        toks = vl.generate_greedy(p, jnp.asarray(ids), pixels, cfg,
                                  max_new_tokens=n_new, true_length=true_len,
                                  eos_id=2 if args.eos else None,
                                  draft_tokens=args.draft,
                                  kv_bits=8 if args.kv8 else None)
        return np.asarray(toks)

    t0 = time.time(); run(args.tokens); compile_s = time.time() - t0
    print(f"compile+run {compile_s:.1f}s", flush=True)
    short, long_ = max(args.tokens // 2, 1), args.tokens
    # time both lengths; per-token = (t_long - t_short) / (long - short)
    t0 = time.time(); run(short); t_short0 = time.time() - t0  # compiles short
    ts_s, ts_l = [], []
    for _ in range(3):
        t0 = time.time(); run(short); ts_s.append(time.time() - t0)
        t0 = time.time(); run(long_); ts_l.append(time.time() - t0)
    per_tok = (min(ts_l) - min(ts_s)) / (long_ - short)
    prefill = min(ts_s) - short * per_tok
    agg = f"  aggregate: {b/per_tok:.1f} tok/s over batch {b}" if b > 1 else ""
    print(f"prefill({args.prompt_len}+{g} img toks): {prefill*1000:.0f}ms  "
          f"decode: {per_tok*1000:.1f}ms/step = {1.0/per_tok:.1f} steps/s"
          f"{agg}", flush=True)


if __name__ == "__main__":
    main()
