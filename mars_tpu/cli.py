"""Evaluation CLI: the episode loop (reference: main_MARS.py:17-172).

Runs the MARS ranking pipeline over a benchmark fold: per episode it loads
or generates mask proposals, predicts the merged mask, updates the meter,
and logs per-episode ranking times to ``ranking_time.csv`` (same telemetry
as the reference, main_MARS.py:76-89).

Examples:
  python -m mars_tpu.cli --benchmark synthetic --episodes 5 --gt-class-names
  python -m mars_tpu.cli --benchmark coco --fold 0 --datapath /data \
      --models-path /models --mask-proposals-path /props/fold0
"""
from __future__ import annotations

import argparse
import csv
import os
import time

import jax.numpy as jnp
import numpy as np

from mars_tpu.core.episode import pad_proposals
from mars_tpu.data import build_dataset, to_device_episode
from mars_tpu.data.base import resized_gt
from mars_tpu.pipeline import mars as mars_lib
from mars_tpu.utils import evaluation


def build_model(args) -> "mars_lib.Mars":
    from mars_tpu.models import zoo
    from mars_tpu.text.retriever import OracleVLM, TextRetriever

    dino = zoo.build_dinov2(args.models_path, args.dino_backbone, args.num_regs)
    clip = zoo.build_clip_b16(args.models_path)
    ac = zoo.build_alpha_clip(args.models_path)
    if args.bf16:
        from mars_tpu.models.precision import cast_floating

        dino = (cast_floating(dino[0]), dino[1])
        clip = (cast_floating(clip[0]),) + clip[1:]
        ac = (cast_floating(ac[0]),) + ac[1:]
    if args.int8_towers:
        # weight-only int8: ~2x less HBM for tower weights (308MB vs 609MB
        # for DINOv2-L alone) and ~5% faster forwards; frees headroom for
        # co-resident ViP-LLaVA on the same chip
        from mars_tpu.models.quantization import quantize_params

        dino = (quantize_params(dino[0]), dino[1])
        clip = (quantize_params(clip[0]),) + clip[1:]
        ac = (quantize_params(ac[0]),) + ac[1:]
    retriever = None
    if not args.gt_class_names:
        if args.jax_vlm:
            import jax.numpy as jnp

            from mars_tpu.text.retriever import JaxVipLlava

            retriever = TextRetriever(JaxVipLlava(
                args.vlm_path, dtype=jnp.bfloat16, quantize_bits=8))
        else:
            from mars_tpu.text.retriever import HFVipLlava

            retriever = TextRetriever(HFVipLlava(args.vlm_path))
    return mars_lib.Mars(dino=dino, clip=clip, alpha_clip=ac, retriever=retriever)


def load_proposals(args, idx: int, size: int):
    """Precomputed proposal stacks (reference main_MARS.py:62 torch.load of
    '{fold}_{idx}.pt'); .npy/.npz stacks are also accepted."""
    base = os.path.join(args.mask_proposals_path, f"{args.fold}_{idx}")
    if os.path.exists(base + ".npy"):
        masks = np.load(base + ".npy")
    elif os.path.exists(base + ".npz"):
        masks = np.load(base + ".npz")["masks"]
    elif os.path.exists(base + ".pt"):
        import torch

        masks = torch.load(base + ".pt", map_location="cpu").numpy()
    else:
        raise FileNotFoundError(base)
    return pad_proposals(jnp.asarray(masks.astype(np.float32)), args.proposal_bucket)


def synthetic_proposals(rec, size, bucket, rng):
    """Proposal stand-ins when no Matcher dumps exist: gt + perturbations +
    random boxes (keeps the synthetic smoke path self-contained)."""
    gt, _ = resized_gt(rec, size)
    props = [gt]
    for _ in range(6):
        y, x = rng.randint(0, size - 64, 2)
        m = np.zeros_like(gt)
        m[y : y + rng.randint(32, 128), x : x + rng.randint(32, 128)] = 1
        props.append(m)
    return pad_proposals(jnp.asarray(np.stack(props)), bucket)


def main(argv=None):
    p = argparse.ArgumentParser("mars_tpu evaluation")
    p.add_argument("--benchmark", default="synthetic",
                   choices=["coco", "pascal", "pascal5i", "fss", "lvis", "synthetic"])
    p.add_argument("--datapath", default="")
    p.add_argument("--models-path", default=None)
    p.add_argument("--mask-proposals-path", default=None)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1)
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("--episodes", type=int, default=0, help="0 = full split")
    p.add_argument("--proposal-bucket", type=int, default=128)
    p.add_argument("--dino-backbone", default="vit_large")
    p.add_argument("--num-regs", type=int, default=4)
    p.add_argument("--gt-class-names", action="store_true",
                   help="use dataset class names instead of the VLM")
    p.add_argument("--vlm-path", default="llava-hf/vip-llava-7b-hf")
    p.add_argument("--jax-vlm", action="store_true",
                   help="run the VLM on the TPU (JAX port, int8) instead of "
                        "a transformers host side-car")
    p.add_argument("--log-path", default="output")
    p.add_argument("--bad-preds-path", default=None,
                   help="per-fold known-bad episode index list (one idx per "
                        "line, reference datasets/COCO2014/fold{f}_badPredsIdxs.txt)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 tower weights (the reference's fp16 analogue)")
    p.add_argument("--int8-towers", action="store_true",
                   help="weight-only int8 tower kernels (combine with --bf16)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    np.random.seed(args.seed)
    if args.mask_proposals_path and not os.path.isdir(args.mask_proposals_path):
        raise SystemExit(
            f"--mask-proposals-path does not exist: {args.mask_proposals_path}"
        )
    ds = build_dataset(args.benchmark, args.datapath, args.fold, "test", args.nshot,
                       args.seed)
    model = build_model(args)
    meter = evaluation.AverageMeter(ds.benchmark, list(ds.class_ids))
    os.makedirs(args.log_path, exist_ok=True)
    timing_rows = []
    rng = np.random.RandomState(args.seed)
    # curated hard-case regression subset (reference mars/utils/logger.py:80-127)
    bad_idxs = set()
    if args.bad_preds_path and os.path.exists(args.bad_preds_path):
        with open(args.bad_preds_path) as f:
            bad_idxs = {int(x) for x in f.read().split() if x.strip()}

    n = args.episodes or len(ds)
    for idx in range(n):
        rec = ds[idx]
        ep = to_device_episode(rec, args.input_size, args.nshot)
        if args.mask_proposals_path:
            props = load_proposals(args, idx, args.input_size)
        else:
            props = synthetic_proposals(rec, args.input_size, args.proposal_bucket, rng)
        class_name = rec.class_name if args.gt_class_names else None
        pred = np.asarray(model.predict(ep, props, class_name=class_name))
        gt, ig = resized_gt(rec, args.input_size)
        inter, union = evaluation.classify_prediction(pred, gt, ig)
        meter.update(inter, union, rec.class_id)
        if idx in bad_idxs:
            meter.update_bad_preds(inter, union, rec.class_id)
        timing_rows.append(
            [idx, model.timings["total"], model.timings["after_text_extraction"],
             int(np.asarray(props.valid).sum())]
        )
        if idx % 20 == 0:
            miou, fb, _ = meter.compute_iou()
            print(f"[{idx + 1}/{n}] mIoU {miou:.2f}  FB-IoU {fb:.2f}")

    with open(os.path.join(args.log_path, "ranking_time.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "total_s", "after_text_s", "n_proposals"])
        w.writerows(timing_rows)

    miou, fb, per_class = meter.compute_iou()
    avg_t = float(np.mean([r[1] for r in timing_rows]))
    print(f"\n*** mIoU: {miou:.2f}  FB-IoU: {fb:.2f}  avg time/img: {avg_t:.3f}s ***")
    if meter.bad_class_ids:
        bmiou, bfb, _ = meter.compute_iou_bad_preds()
        print(f"*** known-bad subset — mIoU: {bmiou:.2f}  FB-IoU: {bfb:.2f} ***")
    return miou, fb


if __name__ == "__main__":
    main()
