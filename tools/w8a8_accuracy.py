"""Tower-quantization accuracy harness for the AlphaCLIP stage.

Throughput is settled (BASELINE.md: int8 towers are the production
default); this measures the ACCURACY side of each precision so the
default is a decision, not an assumption:

  - per-proposal AlphaCLIP cosine perturbation (raw and after the min-max
    scaling the fusion applies — min-max AMPLIFIES small deviations when
    the score spread is narrow, reference FilteringMergingModule.py:125-132)
  - merge-decision flips: for full random episodes, run the whole
    score_and_merge fusion with IDENTICAL priors/EMD and only the
    AlphaCLIP scores differing; count proposals whose kept/dropped
    decision flips and compare the merged masks

Three tower variants are scored per episode and compared pairwise
against the bf16 baseline (the repo's full-precision config; the
reference runs fp16 on GPU) and each other:

    bf16        cast_floating only
    w8          + weight-only int8 (the production default)
    w8a8        + dynamic int8 activations (opt-in)

Runs the production geometry (AlphaCLIP ViT-L/14@336, 128-proposal
bucket) on the TPU with seeded random weights.  Usage:

    python tools/w8a8_accuracy.py [--episodes 8]
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mars_tpu.core.episode import pad_proposals
from mars_tpu.models import clip as clip_m, zoo
from mars_tpu.models.precision import cast_floating
from mars_tpu.models.quantization import quantize_params
from mars_tpu.pipeline import filtering


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--variants", nargs="+",
                    default=["bf16", "w8", "w8a8"],
                    choices=["bf16", "w8", "w8a8"],
                    help="tower precisions to score (first is the "
                         "comparison baseline)")
    args = ap.parse_args()

    avcfg = clip_m.ALPHA_CLIP_L14_336_VISUAL
    key = jax.random.PRNGKey(0)
    ac = zoo._on_host(clip_m.init_visual_params, key, avcfg)
    ac = cast_floating(ac)  # bf16 weights, the full-precision config
    towers = {}
    for v in args.variants:
        towers[v] = {"bf16": lambda: ac,
                     "w8": lambda: quantize_params(ac),
                     "w8a8": lambda: quantize_params(ac, act_bits=8)}[v]()

    fm_cfg = filtering.FilterMergeConfig()
    g = fm_cfg.grid

    def episode(seed):
        rng = np.random.RandomState(seed)
        qry = jnp.asarray(rng.rand(518, 518, 3), jnp.float32)
        masks = np.zeros((args.bucket, 518, 518), np.float32)
        for i in range(args.bucket):
            y, x = rng.randint(0, 400, 2)
            masks[i, y:y + rng.randint(40, 118), x:x + rng.randint(40, 118)] = 1
        props = pad_proposals(jnp.asarray(masks), args.bucket)
        text = rng.rand(1, avcfg.output_dim).astype(np.float32)
        text = jnp.asarray(text / np.linalg.norm(text))
        vva = jnp.asarray(rng.rand(g, g), jnp.float32)
        vta = jnp.asarray(rng.rand(g, g), jnp.float32)
        # a shared cost matrix/footprint for the EMD term
        sup_fg = jnp.asarray(rng.rand(g * g) > 0.8)
        cost = jnp.asarray(rng.rand(g * g, g * g) * 0.5, jnp.float32)
        return qry, props, text, vva, vta, sup_fg, cost

    def mm(x):
        return (x - x.min()) / (x.max() - x.min() + 1e-7)

    base = args.variants[0]
    pairs = [(base, v) for v in args.variants[1:]]
    if ("w8" in args.variants and "w8a8" in args.variants
            and ("w8", "w8a8") not in pairs):
        pairs.append(("w8", "w8a8"))
    stats = {f"{a}_vs_{b}": {"raw": [], "scaled": [], "flips": [], "iou": []}
             for a, b in pairs}
    t0 = time.time()
    for e in range(args.episodes):
        qry, props, text, vva, vta, sup_fg, cost = episode(e)
        scores, kept, merged = {}, {}, {}
        for v, p in towers.items():
            s = filtering.alphaclip_scores(
                p, qry, props.masks, text, avcfg, fm_cfg,
                proposal_valid=props.valid)
            m, sc = filtering.score_and_merge(
                props.masks, props.valid, sup_fg, cost, vva, vta, s, fm_cfg)
            scores[v] = np.asarray(s, np.float64)
            merged[v] = np.asarray(m) > 0
            sc = np.asarray(sc)
            # kept set = proposals above the static/dynamic threshold
            thr = 0.55 if sc.max() >= 0.55 else 0.95 * sc.max()
            kept[v] = (sc >= thr) & np.asarray(props.valid)
        line = f"ep {e}:"
        for a, b in pairs:
            st = stats[f"{a}_vs_{b}"]
            st["raw"].append(np.abs(scores[a] - scores[b]).max())
            st["scaled"].append(np.abs(mm(scores[a]) - mm(scores[b])).max())
            st["flips"].append(int(np.sum(kept[a] != kept[b])))
            inter = np.sum(merged[a] & merged[b])
            union = np.sum(merged[a] | merged[b])
            st["iou"].append(1.0 if union == 0 else inter / union)
            line += (f"  [{a} vs {b}] raw {st['raw'][-1]:.2e} "
                     f"scaled {st['scaled'][-1]:.4f} flips {st['flips'][-1]} "
                     f"IoU {st['iou'][-1]:.4f}")
        print(line, flush=True)

    out = {"episodes": args.episodes, "bucket": args.bucket,
           "wall_s": round(time.time() - t0, 1)}
    for name, st in stats.items():
        out[name] = {
            "max_raw_cosine_err": float(np.max(st["raw"])),
            "mean_raw_cosine_err": float(np.mean(st["raw"])),
            "max_minmax_scaled_err": float(np.max(st["scaled"])),
            "total_kept_set_flips": int(np.sum(st["flips"])),
            "min_merged_iou": float(np.min(st["iou"])),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
