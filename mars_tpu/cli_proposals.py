"""Offline proposal generation: the Matcher → proposal-dump step.

The reference evaluation flow consumes precomputed proposal stacks
('{fold}_{idx}.pt', main_MARS.py:62,116 — "unmerged_unfiltered" =
Matcher.unfiltered_generated_masks, Matcher.py:728-729) but ships NO driver
for producing them (SURVEY §1 L4).  This CLI is that missing driver: it runs
the TPU Matcher over a benchmark fold and writes one compressed .npz per
episode with the post-NMS proposal stack + metadata.

  python -m mars_tpu.cli_proposals --benchmark synthetic --episodes 4 \
      --out /tmp/props
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.data import build_dataset, to_device_episode
from mars_tpu.models import zoo
from mars_tpu.pipeline import amg, matcher


def main(argv=None):
    p = argparse.ArgumentParser("mars_tpu offline proposal generation")
    p.add_argument("--benchmark", default="synthetic")
    p.add_argument("--datapath", default="")
    p.add_argument("--models-path", default=None)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1)
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("--episodes", type=int, default=0)
    p.add_argument("--sam-size", default="vit_h",
                   choices=("vit_b", "vit_l", "vit_h"))
    p.add_argument("--dino-backbone", default="vit_large",
                   choices=("vit_small", "vit_base", "vit_large", "vit_giant2"))
    p.add_argument("--num-regs", type=int, default=4)
    p.add_argument("--use-centers", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--out", required=True)
    p.add_argument("--coco-rle", action="store_true",
                   help="also write {fold}_{idx}.json with the proposals as "
                        "pycocotools-interchange compressed RLE "
                        "(mask.encode format; native.rle_encode_compressed)")
    p.add_argument("--visualize", type=int, default=0, metavar="N",
                   help="dump a per-episode figure (query, support, top "
                        "proposals by EMD score, merged mask) for the first "
                        "N episodes to <out>/viz (reference "
                        "Matcher.py:230-231 behind --visualize)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    ds = build_dataset(args.benchmark, args.datapath, args.fold, "test",
                       args.nshot, args.seed)
    dino_params, dino_cfg = zoo.build_dinov2(args.models_path, args.dino_backbone,
                                             args.num_regs)
    sam_params, sam_cfg = zoo.build_sam(args.models_path, args.sam_size)
    if args.bf16:
        from mars_tpu.models.precision import cast_floating

        dino_params = cast_floating(dino_params)
        sam_params = cast_floating(sam_params)
    g = args.input_size // dino_cfg.patch_size
    mcfg = matcher.MatcherConfig(
        input_size=args.input_size, grid=g,
        patch_size=dino_cfg.patch_size,
        use_points_or_centers=not args.use_centers,
    )
    acfg = amg.AmgConfig()
    os.makedirs(args.out, exist_ok=True)

    n = args.episodes or len(ds)
    for idx in range(n):
        rec = ds[idx]
        ep = to_device_episode(rec, args.input_size, args.nshot)
        # the same stateless key stream as the inline-generation drivers
        # (cli.episode_key == cli_parallel's fold), so dump-based and
        # inline evaluations of a fold are directly comparable
        from mars_tpu.cli import episode_key

        k = episode_key(args.seed, idx)
        t0 = time.time()
        out = matcher.generate_proposals(
            k, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
            ep.support_images, ep.support_masks, ep.support_valid, ep.query_image,
        )
        valid = np.asarray(out["proposal_valid"])
        masks = np.asarray(out["proposal_masks"])[valid]
        np.savez_compressed(
            os.path.join(args.out, f"{args.fold}_{idx}.npz"),
            masks=masks.astype(np.uint8),
            # f32 cast: under --bf16 np.savez would otherwise store raw
            # bfloat16 as an unreadable void dtype (V2)
            iou=np.asarray(out["iou"], np.float32)[valid],
            stability=np.asarray(out["stability"], np.float32)[valid],
            emd=np.asarray(out["emd_score"], np.float32)[valid],
            merged=np.asarray(out["merged"]).astype(np.uint8),
            class_id=rec.class_id,
        )
        if args.coco_rle:
            # pycocotools-interchange sidecar: downstream consumers can
            # mask.decode these without this framework installed
            import json

            from mars_tpu import native

            iou = np.asarray(out["iou"], np.float32)[valid]
            anns = []
            for m, s in zip(masks, iou):
                r = native.rle_encode_compressed(m.astype(np.uint8))
                anns.append({"size": r["size"],
                             "counts": r["counts"].decode("ascii"),
                             "score": float(s),
                             "category_id": int(rec.class_id)})
            with open(os.path.join(args.out, f"{args.fold}_{idx}.json"),
                      "w") as f:
                json.dump(anns, f)
        if idx < args.visualize:
            from mars_tpu.data.base import episode_host_u8, resized_gt
            from mars_tpu.utils import visualize

            sup_i, sup_m, qry_u8, sup_v = episode_host_u8(
                rec, args.input_size, args.nshot)
            gt, _ = resized_gt(rec, args.input_size)
            viz_dir = os.path.join(args.out, "viz")
            os.makedirs(viz_dir, exist_ok=True)
            visualize.plot_episode(
                os.path.join(viz_dir, f"ep{idx:05d}.png"),
                query_img=qry_u8,
                support_img=sup_i[0] if sup_v[0] else None,
                support_mask=sup_m[0] if sup_v[0] else None,
                proposals=np.asarray(out["proposal_masks"]),
                proposal_valid=valid,
                scores=np.asarray(out["emd_score"], np.float32),
                merged=np.asarray(out["merged"], np.float32),
                gt=gt,
                title=f"episode {idx} — {rec.class_name}",
            )
        print(f"[{idx + 1}/{n}] {valid.sum()} proposals  {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
