"""Probe: is the e2e proposal span inflated by program INTERLEAVING?

bench.py's e2e loop (text → proposals → ranking) consistently measures the
proposal span ~300 ms above tools/matcher_bench.py's steady state for the
same programs.  This probe times the proposal stage TWICE per iteration
inside the same interleaved loop: if prop#2 (same programs, back-to-back)
is much faster than prop#1 (right after the VLM text stage), the gap is a
program-switch/interleave effect on the tunnel-attached device, not
proposal-stage compute.

Usage: python tools/e2e_probe.py [--iters 5]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROPOSAL_BUCKET = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-text", action="store_true",
                    help="drop the VLM text stage from the loop")
    ap.add_argument("--fused", action="store_true",
                    help="fuse_programs=True on the bucketed proposal stage "
                         "(ONE program, union-family rows)")
    args = ap.parse_args()

    from mars_tpu.cli import bucket_generated_proposals
    from mars_tpu.data import build_dataset, to_device_episode
    from mars_tpu.models import vip_llava as vl, zoo
    from mars_tpu.models.precision import cast_floating
    from mars_tpu.models.quantization import quantize_params
    from mars_tpu.pipeline import amg, matcher

    dino_params, dino_cfg = zoo.build_dinov2(None, "vit_large", 4)
    dino_params = quantize_params(cast_floating(dino_params))
    sam_params, sam_cfg = zoo.build_sam(None, "vit_b")
    sam_params = cast_floating(sam_params)
    mcfg = matcher.MatcherConfig(input_size=518, grid=37, patch_size=14)
    acfg = amg.AmgConfig()

    ds = build_dataset("synthetic", shot=1, size=518, num_episodes=2)
    ep = to_device_episode(ds[0], size=518, max_shots=1)

    if not args.no_text:
        vcfg = vl.VipLlavaConfig()
        vlm_p = vl.init_random_params(0, vcfg, quantize_bits=8)
        # processor-expanded production prompt: gtok=576 image slots
        gtok = (vcfg.image_size // vcfg.patch_size) ** 2
        name_ids = np.full((1, 600 + gtok - 1), 5, np.int64)
        name_ids[0, 10:10 + gtok] = vcfg.image_token_index
        pixels = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))

        def text_stage():
            n = vl.generate_greedy(vlm_p, jnp.asarray(name_ids), pixels, vcfg,
                                   max_new_tokens=20, draft_tokens=8)
            d = vl.generate_greedy(vlm_p, jnp.asarray(name_ids), pixels, vcfg,
                                   max_new_tokens=50, draft_tokens=8)
            return np.asarray(d[0, -1]) + np.asarray(n[0, -1])
    else:
        def text_stage():
            return 0

    key = jax.random.PRNGKey(0)
    from mars_tpu.utils.profiling import force_sync

    def proposal_stage(k):
        out = matcher.generate_proposals(
            k, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
            ep.support_images, ep.support_masks, ep.support_valid,
            ep.query_image, bucket=PROPOSAL_BUCKET,
            fuse_programs=args.fused)
        props = bucket_generated_proposals(out, PROPOSAL_BUCKET)
        _ = float(props.masks[0, 0, 0])
        return props

    def proposal_stage_nobucket(k):
        # matcher_bench's exact pattern: no fused bucket, sync final_score
        out = matcher.generate_proposals(
            k, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
            ep.support_images, ep.support_masks, ep.support_valid,
            ep.query_image)
        force_sync(out["final_score"])
        return out

    print("compiling...", flush=True)
    t0 = time.time()
    text_stage()
    out0 = matcher.generate_proposals(
        key, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
        ep.support_images, ep.support_masks, ep.support_valid,
        ep.query_image, bucket=PROPOSAL_BUCKET, fuse_programs=args.fused)
    tele = {k: int(v) for k, v in out0["telemetry"].items()}
    nprompt = tele["n_matched_points"]
    print(f"compiled in {time.time() - t0:.0f}s; telemetry {tele} "
          f"(family: {'combos(246 rows)' if nprompt <= 8 else 'draws(90 rows)'})",
          flush=True)

    proposal_stage_nobucket(key)  # compile the no-bucket variant too

    p1s, p2s, txts = [], [], []
    for i in range(args.iters):
        key, k1 = jax.random.split(key)
        key, k2 = jax.random.split(key)
        t0 = time.time()
        text_stage()
        t1 = time.time()
        proposal_stage(k1)
        t2 = time.time()
        proposal_stage_nobucket(k2)
        t3 = time.time()
        txts.append(t1 - t0)
        p1s.append(t2 - t1)
        p2s.append(t3 - t2)
        print(f"iter {i}: text {1e3*(t1-t0):6.0f}  prop+bucket {1e3*(t2-t1):6.0f}  "
              f"prop-nobucket {1e3*(t3-t2):6.0f} ms", flush=True)
    print(f"min: text {1e3*min(txts):.0f}  prop+bucket {1e3*min(p1s):.0f}  "
          f"prop-nobucket {1e3*min(p2s):.0f} ms")


if __name__ == "__main__":
    main()
