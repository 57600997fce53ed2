"""Proposal-generation stage profile on one chip (random weights).

Times matcher.generate_proposals at the production geometry (DINOv2-L +
SAM @518, default MatcherConfig).  The flow is TWO compiled programs
("match" / "propose" spans); each span ends in a device sync, so per-span
numbers carry a ~35 ms dispatch-floor bias on the tunneled chip; the
un-spanned host dispatch time shows up as total - sum(spans).  Use
jax.profiler (MARS_TPU_PROFILE_DIR) for intra-program detail.

Usage: python tools/matcher_bench.py [--episodes 6] [--sam-size vit_b]
       [--negatives]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mars_tpu.models import dinov2, sam, zoo
from mars_tpu.pipeline import amg, matcher
from mars_tpu.utils.profiling import StageTimers, force_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=6)
    ap.add_argument("--sam-size", default="vit_b",
                    choices=["vit_b", "vit_l", "vit_h"])
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--negatives", action="store_true",
                    help="enable cost-matrix negative priors")
    ap.add_argument("--int8-dino", action="store_true",
                    help="weight-only int8 DINOv2 (the e2e bench shares the "
                         "ranking path's int8 tower with proposal generation)")
    ap.add_argument("--fused", action="store_true",
                    help="single-program union-family flow "
                         "(generate_proposals fuse_programs=True — the cli "
                         "default; this tool defaults to the 2-program flow "
                         "for its per-span profile)")
    args = ap.parse_args()

    dino_params, dino_cfg = zoo.build_dinov2(None, "vit_large", 4)
    sam_params, sam_cfg = zoo.build_sam(None, args.sam_size)
    from mars_tpu.models.precision import cast_floating

    dino_params, sam_params = cast_floating(dino_params), cast_floating(sam_params)
    if args.int8_dino:
        from mars_tpu.models.quantization import quantize_params

        dino_params = quantize_params(dino_params)
    mcfg = matcher.MatcherConfig(
        input_size=args.input_size,
        grid=args.input_size // dino_cfg.patch_size,
        patch_size=dino_cfg.patch_size,
        use_negative_priors_from_cost=args.negatives,
    )
    acfg = amg.AmgConfig()
    s = args.input_size

    def episode(seed):
        rng = np.random.RandomState(seed)
        sup = jnp.asarray(rng.rand(1, s, s, 3), jnp.float32)
        qry = jnp.asarray(rng.rand(s, s, 3), jnp.float32)
        m = np.zeros((1, s, s), np.float32)
        m[0, 60:240, 80:300] = 1
        return sup, jnp.asarray(m), jnp.ones((1,), bool), qry

    key = jax.random.PRNGKey(0)
    # warmup/compile
    sup, msk, val, qry = episode(0)
    t0 = time.time()
    out = matcher.generate_proposals(key, dino_params, dino_cfg, sam_params,
                                     sam_cfg, acfg, mcfg, sup, msk, val, qry,
                                     fuse_programs=args.fused)
    force_sync(out["final_score"])
    print(f"compile+first episode: {time.time() - t0:.1f}s", flush=True)

    timers = StageTimers()
    totals = []
    for e in range(args.episodes):
        sup, msk, val, qry = episode(e + 1)
        key, k = jax.random.split(key)
        t0 = time.time()
        out = matcher.generate_proposals(
            k, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
            sup, msk, val, qry, timers=timers, fuse_programs=args.fused)
        force_sync(out["final_score"])
        totals.append(time.time() - t0)
    spans = timers.summary()
    print(f"total/episode: {min(totals)*1e3:.0f} ms (min of {len(totals)}); "
          f"mean {np.mean(totals)*1e3:.0f} ms")
    accounted = sum(spans.values())
    for k2, v in sorted(spans.items(), key=lambda kv: -kv[1]):
        print(f"  {k2:20s} {v*1e3:7.1f} ms")
    print(f"  {'(host dispatch gap)':20s} {(np.mean(totals)-accounted)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
