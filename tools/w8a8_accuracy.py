"""W8A8-vs-weight-only-int8 accuracy harness for the AlphaCLIP stage.

The throughput side is settled (BASELINE.md: 554 vs 610 ms full bucket,
+10%); this measures the ACCURACY side so the default can be decided:

  - per-proposal AlphaCLIP cosine perturbation (raw and after the min-max
    scaling the fusion applies — min-max AMPLIFIES small deviations when
    the score spread is narrow)
  - merge-decision flips: for full random episodes, run the whole
    score_and_merge fusion with IDENTICAL priors/EMD and only the
    AlphaCLIP scores differing; count proposals whose kept/dropped
    decision flips and compare the merged masks

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
    args = ap.parse_args()

    avcfg = clip_m.ALPHA_CLIP_L14_336_VISUAL
    key = jax.random.PRNGKey(0)
    ac = zoo._on_host(clip_m.init_visual_params, key, avcfg)
    ac = cast_floating(ac)  # bf16 weights, the production dtype
    ac_w8 = quantize_params(ac)  # weight-only int8 (production default)
    ac_w8a8 = quantize_params(ac, act_bits=8)  # + dynamic int8 activations

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

    raw_err, scaled_err, flips, merged_iou = [], [], [], []
    t0 = time.time()
    for e in range(args.episodes):
        qry, props, text, vva, vta, sup_fg, cost = episode(e)
        s_ref = filtering.alphaclip_scores(
            ac_w8, qry, props.masks, text, avcfg, fm_cfg,
            proposal_valid=props.valid)
        s_q = filtering.alphaclip_scores(
            ac_w8a8, qry, props.masks, text, avcfg, fm_cfg,
            proposal_valid=props.valid)
        a, b = np.asarray(s_ref, np.float64), np.asarray(s_q, np.float64)
        raw_err.append(np.abs(a - b).max())

        def mm(x):
            return (x - x.min()) / (x.max() - x.min() + 1e-7)

        scaled_err.append(np.abs(mm(a) - mm(b)).max())

        m_ref, sc_ref = filtering.score_and_merge(
            props.masks, props.valid, sup_fg, cost, vva, vta, s_ref, fm_cfg)
        m_q, sc_q = filtering.score_and_merge(
            props.masks, props.valid, sup_fg, cost, vva, vta, s_q, fm_cfg)
        m_ref, m_q = np.asarray(m_ref) > 0, np.asarray(m_q) > 0
        # kept set = proposals above the static/dynamic threshold
        sr, sq = np.asarray(sc_ref), np.asarray(sc_q)
        thr_r = 0.55 if sr.max() >= 0.55 else 0.95 * sr.max()
        thr_q = 0.55 if sq.max() >= 0.55 else 0.95 * sq.max()
        kept_r = (sr >= thr_r) & np.asarray(props.valid)
        kept_q = (sq >= thr_q) & np.asarray(props.valid)
        flips.append(int(np.sum(kept_r != kept_q)))
        inter, union = np.sum(m_ref & m_q), np.sum(m_ref | m_q)
        merged_iou.append(1.0 if union == 0 else inter / union)
        print(f"ep {e}: raw {raw_err[-1]:.2e}  scaled {scaled_err[-1]:.4f}  "
              f"flips {flips[-1]}  mergedIoU {merged_iou[-1]:.4f}",
              flush=True)

    print(json.dumps({
        "episodes": args.episodes,
        "bucket": args.bucket,
        "max_raw_cosine_err": float(np.max(raw_err)),
        "mean_raw_cosine_err": float(np.mean(raw_err)),
        "max_minmax_scaled_err": float(np.max(scaled_err)),
        "total_kept_set_flips": int(np.sum(flips)),
        "min_merged_iou": float(np.min(merged_iou)),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
