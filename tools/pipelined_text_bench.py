"""A/B the per-episode text-stage protocols on the real chip.

The episode text stage is two decodes — a name query (max 20 new tokens)
and a definition query (max 50, min 20) whose prompt consumes the name
(reference TextRetrieverModule.py:42-122).  Two ways to run it:

  serial     prefix-KV prefill once per episode image, then two B=1
             prompt-lookup speculative decodes (bench.py's text_stage —
             the production default).
  pipelined  cross-episode batching (PipelinedTextStage): episode N's
             definition rides ONE B=2 decode with episode N+1's name
             query — full per-row prefills (different images → no shared
             prefix), per-row drafts, per-row min_new_tokens floors.
  block(D)   D-episode block batching (BlockTextStage): ONE batched
             prefix prefill for D episode images, then a B=D name decode
             (20 new tokens) and a B=D definition decode (50 new, min
             20) REUSING the same per-row prefix KV — the weight stream
             is amortized across D rows on every decode round, not just
             where a definition overlaps a name.

All are EXACT greedy; this measures pure wall-clock per steady-state
episode.  Random weights give near-max draft acceptance (repetitive
output); --draft 0 shows the zero-speculation floor where the batch
amortization is strongest.

Usage: python tools/pipelined_text_bench.py [--iters 5] [--draft 8]
       [--blocks 2,4,6]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--draft", type=int, default=8)
    ap.add_argument("--eos", action="store_true",
                    help="enable EOS early exit (random weights rarely "
                         "emit EOS, so default keeps fixed budgets)")
    ap.add_argument("--blocks", default="2,4,6",
                    help="comma list of block depths D to measure "
                         "(empty string skips block mode)")
    args = ap.parse_args()
    print(jax.devices(), flush=True)

    vcfg = vl.VipLlavaConfig()
    p = vl.init_random_params(0, vcfg, quantize_bits=8)
    gtok = (vcfg.image_size // vcfg.patch_size) ** 2
    ids_np = np.full((1, 600 + gtok - 1), 5, np.int64)
    ids_np[0, 10:10 + gtok] = vcfg.image_token_index
    total = ids_np.shape[1]
    pixels1 = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    eos = 2 if args.eos else None

    # --- serial: shared-prefix prefill + two B=1 speculative decodes
    prefix_len = 580 + gtok - 1
    prefix_ids = jnp.asarray(ids_np[:, :prefix_len])
    suffix_ids = jnp.asarray(ids_np[:, prefix_len:])

    def serial():
        kv = vl.prefill_prefix(p, prefix_ids, pixels1, vcfg)
        n = vl.generate_greedy(p, suffix_ids, None, vcfg,
                               max_new_tokens=20, draft_tokens=args.draft,
                               eos_id=eos, prefix_kv=kv,
                               prefix_len=prefix_len)
        d = vl.generate_greedy(p, suffix_ids, None, vcfg,
                               max_new_tokens=50, draft_tokens=args.draft,
                               eos_id=eos, min_new_tokens=20, prefix_kv=kv,
                               prefix_len=prefix_len)
        return float(np.asarray(d[0, -1]) + np.asarray(n[0, -1]))

    # --- pipelined steady state: ONE B=2 decode per episode
    # (definition row of episode N + name row of episode N+1); bucket to
    # a 128 multiple like the retriever's generate_batch
    bucket = ((total + 127) // 128) * 128
    ids2 = np.zeros((2, bucket), np.int64)
    ids2[:, :total] = ids_np[0]
    ids2 = jnp.asarray(ids2)
    pixels2 = jnp.zeros((2, vcfg.image_size, vcfg.image_size, 3))
    tl2 = jnp.asarray([total, total], jnp.int32)

    def pipelined():
        out = vl.generate_greedy(p, ids2, pixels2, vcfg,
                                 max_new_tokens=50, true_length=tl2,
                                 eos_id=eos, min_new_tokens=(20, 0),
                                 draft_tokens=args.draft)
        return float(np.asarray(out[0, -1]) + np.asarray(out[1, -1]))

    # --- pipelined + per-row prefix KV: the prefix (image slots + the
    # pre-question template) has the SAME length every episode, so each
    # row's own prefill stacks into a (2, L) prefix cache and the batched
    # decode runs suffix-only.  One prefill per episode (same count as
    # serial — each episode's prefill serves its name row in step k and
    # its definition row in step k+1), all decode rounds at B=2.
    sfx2 = np.zeros((2, 128), np.int64)
    sfx2[:, :total - prefix_len] = ids_np[0, prefix_len:]
    sfx2 = jnp.asarray(sfx2)
    tl_sfx = jnp.asarray([total - prefix_len] * 2, jnp.int32)

    def pipelined_prefix():
        # steady state: one fresh prefill (the incoming episode); the
        # other row's prefix was prefilled in the previous step — model
        # that by reusing a cached KV (identical cost profile)
        kv_new = vl.prefill_prefix(p, prefix_ids, pixels1, vcfg)
        kv2 = [(jnp.concatenate([k, k], 0), jnp.concatenate([v, v], 0))
               for k, v in kv_new]
        out = vl.generate_greedy(p, sfx2, None, vcfg,
                                 max_new_tokens=50, true_length=tl_sfx,
                                 eos_id=eos, min_new_tokens=(20, 0),
                                 draft_tokens=args.draft, prefix_kv=kv2,
                                 prefix_len=prefix_len)
        return float(np.asarray(out[0, -1]) + np.asarray(out[1, -1]))

    # --- block(D): ONE batched prefill of D episode prefixes, then a B=D
    # name decode and a B=D definition decode sharing the SAME per-row
    # prefix KV (one prefill per episode — the name and definition queries
    # draw the same support image, reference TextRetrieverModule.py:103-122).
    # Per-episode cost = (prefill_D + 20·step(B=D) + 50·step(B=D)) / D;
    # decode steps are weight-stream-bound, so step(B=D) grows far slower
    # than D (BASELINE.md: 292.7/462.8 aggregate tok/s at B=4/8).
    def make_block(D):
        idsD = jnp.asarray(np.repeat(ids_np[:, :prefix_len], D, axis=0))
        pixD = jnp.zeros((D, vcfg.image_size, vcfg.image_size, 3))
        sfxD = np.zeros((D, 128), np.int64)
        sfxD[:, :total - prefix_len] = ids_np[0, prefix_len:]
        sfxD = jnp.asarray(sfxD)
        tlD = jnp.asarray([total - prefix_len] * D, jnp.int32)

        def block():
            kv = vl.prefill_prefix(p, idsD, pixD, vcfg)
            nm = vl.generate_greedy(p, sfxD, None, vcfg,
                                    max_new_tokens=20, true_length=tlD,
                                    eos_id=eos, draft_tokens=args.draft,
                                    prefix_kv=kv, prefix_len=prefix_len)
            df = vl.generate_greedy(p, sfxD, None, vcfg,
                                    max_new_tokens=50, true_length=tlD,
                                    eos_id=eos, min_new_tokens=20,
                                    draft_tokens=args.draft, prefix_kv=kv,
                                    prefix_len=prefix_len)
            return float(np.asarray(df[0, -1]) + np.asarray(nm[0, -1]))

        return block

    rows = [("serial(prefix+spec)", serial, 1),
            ("pipelined(B=2 spec)", pipelined, 1),
            ("pipelined+prefixkv", pipelined_prefix, 1)]
    for d in [int(x) for x in args.blocks.split(",") if x]:
        rows.append((f"block(D={d})", make_block(d), d))

    for name, fn, div in rows:
        try:
            t0 = time.time()
            fn()
            compile_s = time.time() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                fn()
                times.append(time.time() - t0)
        except Exception as exc:  # noqa: BLE001 — OOM at deep blocks
            print(f"{name:22s}  FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:120]}", flush=True)
            continue
        print(f"{name:22s} {min(times)/div*1e3:8.1f} ms/episode  (compile "
              f"{compile_s:.0f}s, mean {np.mean(times)/div*1e3:.0f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
