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

from mars_tpu.core.episode import Proposals, pad_proposals
from mars_tpu.data import build_dataset, to_device_episode
from mars_tpu.data.base import resized_gt
from mars_tpu.pipeline import mars as mars_lib
from mars_tpu.utils import evaluation
from mars_tpu.utils import logging as mlog


def build_mars_config(args) -> "mars_lib.MarsConfig":
    """Map the reference's tuning flags (main_MARS.py:106-163) onto the
    frozen stage configs."""
    import math

    from mars_tpu.pipeline import filtering, vta, vva

    dino_patch = 14
    g = args.input_size // dino_patch
    vta_patch = int(args.vta_backbone[-2:])
    vta_in = int(math.ceil(args.input_size / vta_patch) * vta_patch)
    return mars_lib.MarsConfig(
        vva=vva.VVAConfig(
            refinement_box_threshold=args.vva_refinement_box_threshold,
            attn_tap_last_n=args.last_n_attn_for_vva_refinement,
            grid=g,
        ),
        vta=vta.VTAConfig(
            refinement_box_threshold=args.vta_refinement_box_threshold,
            attn_tap_last_n=args.last_n_attn_for_vta_refinement,
            input_size=vta_in,
            grid=vta_in // vta_patch,
        ),
        filter_merge=filtering.FilterMergeConfig(
            alpha=args.alpha_coverage,
            static_threshold=args.static_threshold,
            dynamic_threshold=args.dynamic_threshold,
            grid=g,
        ),
    )


def build_retriever(args):
    from mars_tpu.text.retriever import (EnsembleConfig, PromptGenConfig,
                                         TextRetriever)

    if args.nltk_path:
        import nltk

        nltk.data.path.append(args.nltk_path)
    gen_cfg = PromptGenConfig(
        prompt_type=args.prompt_type, color=args.color,
        alpha=args.alpha_blending, thickness=args.thickness,
        zoom_percent=args.zoom_percentage,
    )
    ensemble = EnsembleConfig(
        colors=tuple(args.ensemble_colors_list) if args.ensemble_colors else (),
        zooms=tuple(args.ensemble_zoom_list) if args.ensemble_zoom else (),
        prompt_types=(tuple(args.ensemble_prompts_list)
                      if args.ensemble_prompts else ()),
    )
    bits = 4 if args.vlm4bit else (8 if args.vlm8bit else None)
    if args.jax_vlm:
        import jax.numpy as jnp

        from mars_tpu.text.retriever import JaxVipLlava

        vlm = JaxVipLlava(args.vlm_path, dtype=jnp.bfloat16,
                          quantize_bits=bits or 8,
                          int4_format="nf4" if args.vlm4bit_nf4 else "affine",
                          draft_tokens=args.vlm_draft_tokens,
                          kv_bits=8 if args.vlm_kv8 else None)
    else:
        from mars_tpu.text.retriever import HFVipLlava

        if bits:
            print(f"[cli] --vlm{bits}bit needs --jax-vlm (bitsandbytes is not "
                  "vendored); running the HF side-car unquantized")
        vlm = HFVipLlava(args.vlm_path)
    return TextRetriever(vlm, gen_cfg=gen_cfg, ensemble=ensemble)


def build_model(args) -> "mars_lib.Mars":
    from mars_tpu.models import zoo
    from mars_tpu.text.retriever import OracleVLM, TextRetriever

    if args.vva_backbone != "dino":
        # the reference exposes the same choices but its live VVA path only
        # ever builds DINOv2 (VisualVisualAlignmentModule.py:148-152)
        raise SystemExit("--vva-backbone: only 'dino' is implemented "
                         "(matches the reference's live code path)")
    dino = zoo.build_dinov2(args.models_path, args.dino_backbone, args.num_regs)
    clip = zoo.build_clip(args.models_path, args.vta_backbone)
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
        ac_act = 8 if args.w8a8_alphaclip else None
        ac = (quantize_params(ac[0], act_bits=ac_act),) + ac[1:]
    retriever = None
    if not args.gt_class_names:
        retriever = build_retriever(args)
    return mars_lib.Mars(dino=dino, clip=clip, alpha_clip=ac,
                         retriever=retriever, cfg=build_mars_config(args))


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


_BUCKET_COMPACT = None


def bucket_generated_proposals(out, bucket):
    """Compact a Matcher output into a ranking bucket: valid rows first,
    best per-mask score first (so a bucket smaller than the decode layout
    keeps the BEST proposals, not arbitrary ones).

    generate_proposals returns its FIXED decode layout with dead rows in
    place (the size-1..3 combination prompt sets are invalid by
    construction and sit at the front of the n<=8 family), so a plain
    ``[:bucket]`` truncation could keep only dead slots.  Compaction also
    restores the ranking stage's dead-chunk-skip precondition (valid rows
    contiguous at the front).

    Runs as ONE jitted program: the episode-path invariant — eager jnp ops
    cost ~35 ms of tunnel dispatch EACH, and the old eager chain (argsort +
    gather + mul + pad) billed ~200 ms/episode on hardware.  When the
    Matcher already compacted in-program (generate_proposals(bucket=...)
    emits "bucket_masks"/"bucket_valid"), this is a zero-dispatch view."""
    if "bucket_masks" in out and out["bucket_masks"].shape[0] == bucket:
        return Proposals(masks=out["bucket_masks"], valid=out["bucket_valid"])
    global _BUCKET_COMPACT
    if _BUCKET_COMPACT is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("bucket",))
        def _compact(masks, valid, score, bucket):
            order = jnp.argsort(jnp.where(valid, -score, jnp.inf),
                                stable=True)
            m = masks[order] * valid[order][:, None, None]
            return pad_proposals(m.astype(jnp.float32), bucket,
                                 valid=valid[order])

        _BUCKET_COMPACT = _compact
    # per-mask combined score (matcher score_masks/filter_and_merge key);
    # the scalar final_score is a MERGE statistic, identical across rows
    score = out["mask_score"] if "mask_score" in out else out["emd_score"]
    return _BUCKET_COMPACT(out["proposal_masks"], out["proposal_valid"],
                           score, bucket=bucket)


def make_inline_generator(args, dino_bundle=None):
    """Per-episode Matcher proposal generation inside the eval loop — the
    reference's mask_generator slot (mars/MARS.py:21,46-51), which its
    shipped driver never exercises (it always loads dumps, main_MARS.py:62).

    ``dino_bundle``: optional (params, cfg) to reuse the VVA tower already
    loaded by build_model instead of holding a second copy in HBM.
    """
    import jax

    from mars_tpu.models import zoo
    from mars_tpu.pipeline import amg, matcher

    if dino_bundle is not None:
        dino_params, dino_cfg = dino_bundle
    else:
        dino_params, dino_cfg = zoo.build_dinov2(args.models_path,
                                                 args.dino_backbone,
                                                 args.num_regs)
        if args.bf16:
            from mars_tpu.models.precision import cast_floating

            dino_params = cast_floating(dino_params)
    mcfg = matcher.MatcherConfig(
        input_size=args.input_size,
        grid=args.input_size // dino_cfg.patch_size,
        patch_size=dino_cfg.patch_size,
    )

    if args.proposal_model == "semantic-sam":
        # the reference's Matcher_SemanticSAM configuration, on the native
        # network (matcher/Matcher_SemanticSAM.py:151-161)
        if getattr(args, "fused_proposals", None):
            # None = auto default (ON for SAM); only an EXPLICIT request errors
            raise SystemExit("--fused-proposals applies to the SAM backend "
                             "only (matcher_oss has its own program flow)")
        from mars_tpu.pipeline import matcher_oss

        ss_params, ss_cfg = zoo.build_semantic_sam(args.models_path)
        if args.bf16:
            from mars_tpu.models.precision import cast_floating

            ss_params = cast_floating(ss_params)
        backend = matcher_oss.SemanticSamBackend(ss_params, ss_cfg)

        def generate(ep, key):
            out = matcher_oss.generate_proposals_oss(
                key, dino_params, dino_cfg, backend, mcfg,
                ep.support_images, ep.support_masks, ep.support_valid,
                ep.query_image,
            )
            return bucket_generated_proposals(out, args.proposal_bucket)

        return generate

    sam_params, sam_cfg = zoo.build_sam(args.models_path, args.sam_size)
    if args.bf16:
        from mars_tpu.models.precision import cast_floating

        sam_params = cast_floating(sam_params)
    acfg = amg.AmgConfig()

    def generate(ep, key):
        out = matcher.generate_proposals(
            key, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
            ep.support_images, ep.support_masks, ep.support_valid,
            ep.query_image, bucket=args.proposal_bucket,
            # default (None) = fused ON: measured 584 vs 761 ms/episode on
            # hardware (tools/e2e_probe.py --fused A/B, 2026-08 remeasure)
            fuse_programs=getattr(args, "fused_proposals", None) is not False,
        )
        return bucket_generated_proposals(out, args.proposal_bucket)

    return generate


def dump_visualization(model, args, idx, rec, ep, props,
                       class_name, class_description):
    """Write the reference's --visualize debugging figure for one episode
    (per-episode internal state: priors, top proposals, merged mask —
    reference Matcher.py:230-231,872-1037).  Runs the debug variant of the
    fused ranking program (one extra dispatch; visualization is capped to
    the first N episodes, so the hot path is untouched)."""
    from mars_tpu.data.base import episode_host_u8
    from mars_tpu.utils import visualize

    out = model.predict_debug(ep, props, class_name=class_name,
                              class_description=class_description)
    sup_i, sup_m, qry_u8, sup_v = episode_host_u8(
        rec, args.input_size, args.nshot)
    gt, _ = resized_gt(rec, args.input_size)
    viz_dir = os.path.join(args.log_path, "viz")
    os.makedirs(viz_dir, exist_ok=True)
    return visualize.plot_episode(
        os.path.join(viz_dir, f"ep{idx:05d}.png"),
        query_img=qry_u8,
        support_img=sup_i[0] if sup_v[0] else None,
        support_mask=sup_m[0] if sup_v[0] else None,
        vva=out["vva_prior"],
        vta=out["vta_prior"],
        proposals=np.asarray(props.masks),
        proposal_valid=np.asarray(props.valid),
        scores=out["scores"],
        merged=out["merged"],
        gt=gt,
        title=f"episode {idx} — {class_name or rec.class_name}",
    )


def capture_rng_states(rng, ds=None):
    """Snapshot the host RNG streams at an episode boundary.  Must run
    BEFORE the next episode's prefetch is submitted — host_prep advances
    the proposal rng and the dataset's episode-sampling rng (COCO draws
    randomly per __getitem__, matching the reference)."""
    return {
        "rng_state": rng.get_state(),
        "ds_rng_state": (ds.rng.get_state()
                         if ds is not None and hasattr(ds, "rng") else None),
    }


def episode_key(seed: int, idx: int):
    """Stateless per-episode proposal-sampling key: fold_in(PRNGKey(seed),
    idx) — ONE derivation shared by the serial driver and cli_parallel's
    inline-dp path, so the two evaluate the same fold with identical
    sampling streams and their meter traces cross-check (reference
    main_MARS.py:24-25 seeds once globally; a stateful split chain here
    would diverge from any batched driver).  Computed on the host CPU
    backend: threefry bits are platform-independent, and an eager op on
    the axon device costs a ~35 ms tunnel round trip."""
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return jax.random.fold_in(jax.random.PRNGKey(seed), idx)


def save_resume_state(path, next_idx, meter, timing_rows, rng_states):
    """Atomic snapshot of everything the eval loop accumulates: meter
    histograms, timing rows, and the RNG states captured by
    capture_rng_states at the episode boundary.  (Inline-generation keys
    are stateless — episode_key(seed, idx) — so none are snapshotted.)"""
    import pickle

    state = {
        "next_idx": next_idx,
        "inter": meter.inter, "union": meter.union,
        "inter_bad": meter.inter_bad, "union_bad": meter.union_bad,
        "bad_class_ids": list(meter.bad_class_ids),
        "timing_rows": timing_rows,
        **rng_states,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_resume_state(path, meter, rng, ds=None):
    """Restore a save_resume_state snapshot; returns the state dict."""
    import pickle

    with open(path, "rb") as f:
        st = pickle.load(f)
    meter.inter[:], meter.union[:] = st["inter"], st["union"]
    meter.inter_bad[:], meter.union_bad[:] = st["inter_bad"], st["union_bad"]
    meter.bad_class_ids = list(st["bad_class_ids"])
    rng.set_state(st["rng_state"])
    if st.get("ds_rng_state") is not None and ds is not None and hasattr(ds, "rng"):
        ds.rng.set_state(st["ds_rng_state"])
    return st


def add_eval_args(p: argparse.ArgumentParser) -> None:
    """Full reference flag surface (main_MARS.py:106-163 +
    scripts/coco_1shot.sh), snake→kebab spelling."""
    p.add_argument("--benchmark", default="synthetic",
                   choices=["coco", "pascal", "pascal5i", "fss", "lvis", "synthetic"])
    p.add_argument("--annotations-datapath", default=None,
                   help="override the COCO mask-annotation directory "
                        "(reference main_MARS.py:114; defaults to "
                        "<datapath>/COCO2014/annotations)")
    p.add_argument("--datapath", default="",
                   help="dataset root (reference --dataset_path)")
    p.add_argument("--models-path", default=None)
    p.add_argument("--mask-proposals-path", default=None)
    p.add_argument("--nltk-path", default=None,
                   help="extra NLTK data dir for WordNet (reference --nltk_path)")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1, choices=[1, 5])
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("--episodes", type=int, default=0, help="0 = full split")
    p.add_argument("--proposal-bucket", type=int, default=128)
    p.add_argument("--fused-proposals", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="single-program proposal generation (union-family "
                        "rows; bit-exact, saves a dispatch + host sync per "
                        "episode).  Default ON for the SAM backend: measured "
                        "584 vs 761 ms (tools/e2e_probe.py A/B); "
                        "--no-fused-proposals restores the 2-program flow")
    # --- text retrieval / visual prompting (reference :127-141) ---
    p.add_argument("--prompt-type", default="contour",
                   choices=["mask", "bb", "contour", "ellipse"])
    p.add_argument("--zoom-percentage", type=int, default=50)
    p.add_argument("--color", default="red", choices=["red", "green", "blue"])
    p.add_argument("--alpha-blending", type=float, default=0.5)
    p.add_argument("--thickness", type=int, default=2)
    p.add_argument("--ensemble-prompts", action="store_true",
                   help="vote over several prompt types per shot")
    p.add_argument("--ensemble-prompts-list", nargs="+",
                   default=["bb", "contour", "ellipse"])
    p.add_argument("--ensemble-zoom", action="store_true")
    p.add_argument("--ensemble-zoom-list", type=int, nargs="+",
                   default=[0, 30, 50])
    p.add_argument("--ensemble-colors", action="store_true")
    p.add_argument("--ensemble-colors-list", nargs="+",
                   default=["red", "green", "blue"])
    p.add_argument("--vlm4bit", action="store_true",
                   help="4-bit weight-only VLM (JAX path)")
    p.add_argument("--vlm4bit-nf4", action="store_true",
                   help="with --vlm4bit: quantize with the bitsandbytes NF4 "
                        "codebook (the reference's load_in_4bit numerics, "
                        "TextRetrieverModule.py:468-471) instead of the "
                        "hybrid-affine speed kernel")
    p.add_argument("--vlm8bit", action="store_true",
                   help="8-bit weight-only VLM (JAX path)")
    p.add_argument("--vlm-kv8", action="store_true",
                   help="int8 KV cache for the JAX VLM (per-token per-head "
                        "scales; halves resident KV — the reference answers "
                        "VLM memory pressure with quantization, "
                        "TextRetrieverModule.py:468-477).  Greedy tokens "
                        "may differ from bf16 KV at the margin")
    p.add_argument("--vlm-draft-tokens", type=int, default=8,
                   help="prompt-lookup speculative decode width for "
                        "single-query VLM generates (exact greedy; 0 "
                        "disables)")
    p.add_argument("--pipelined-text", action="store_true",
                   help="cross-episode text batching: decode episode N's "
                        "definition together with episode N+1's name "
                        "queries in ONE batched VLM call (one-episode text "
                        "lookahead; per-episode results identical to the "
                        "serial retriever)")
    p.add_argument("--text-block", type=int, default=-1, metavar="D",
                   help="block text batching: answer D episodes' name "
                        "queries in ONE batched VLM decode and their D "
                        "definitions in another, sharing one batched "
                        "prefix prefill (D-1 episode text lookahead; "
                        "per-episode results identical to the serial "
                        "retriever — measured 337 vs 681 ms/episode of "
                        "text at D=4 on the int8 7B).  Default: 4 unless "
                        "--pipelined-text is given; 0/1 restores the "
                        "serial per-episode text stage.")
    p.add_argument("--overlap-ranking", type=int, default=-1, metavar="N",
                   help="complete episode rankings up to N episodes late: "
                        "the fused ranking program is launched per episode "
                        "but its merged mask is pulled a window later, so "
                        "the chip's queue stays fed while the host fetches "
                        "earlier results (bit-identical outputs, FIFO "
                        "meter/CSV order).  -1 = auto (the text block "
                        "size); 0 = synchronous.")
    # --- VTA (reference :143-146) ---
    p.add_argument("--vta-backbone", default="ViT-B/16",
                   choices=["ViT-B/16", "ViT-L/14"])
    p.add_argument("--vta-refinement-box-threshold", type=float, default=0.4)
    p.add_argument("--last-n-attn-for-vta-refinement", type=int, default=8)
    # --- VVA (reference :148-152) ---
    p.add_argument("--vva-backbone", default="dino",
                   choices=["dino", "ViT-B/16", "ViT-L/14"])
    p.add_argument("--dino-backbone", default="vit_large")
    p.add_argument("--num-regs", type=int, default=4)
    p.add_argument("--vva-refinement-box-threshold", type=float, default=0.8)
    p.add_argument("--last-n-attn-for-vva-refinement", type=int, default=24)
    # --- filtering & merging (reference :155-157) ---
    p.add_argument("--static-threshold", type=float, default=0.55)
    p.add_argument("--dynamic-threshold", type=float, default=0.95)
    p.add_argument("--alpha-coverage", type=float, default=0.85)
    # --- VLM source ---
    p.add_argument("--gt-class-names", action="store_true",
                   help="use dataset class names instead of the VLM")
    p.add_argument("--vlm-path", default="llava-hf/vip-llava-7b-hf")
    p.add_argument("--jax-vlm", action="store_true",
                   help="run the VLM on the TPU (JAX port) instead of a "
                        "transformers host side-car")
    # --- inline proposal generation (reference mars/MARS.py:46-51 slot) ---
    p.add_argument("--generate-proposals", action="store_true",
                   help="run the Matcher per episode instead of loading dumps")
    p.add_argument("--sam-size", default="vit_h",
                   choices=["vit_b", "vit_l", "vit_h"])
    p.add_argument("--proposal-model", default="sam",
                   choices=["sam", "semantic-sam"],
                   help="Matcher backend: SAM (reference Matcher.py) or the "
                        "native Semantic-SAM network (the reference's "
                        "Matcher_SemanticSAM external-package configuration)")
    # --- logging (reference :160-161) ---
    p.add_argument("--log-path", default="output",
                   help="reference --log_root_path")
    p.add_argument("--exp-name", default=None)
    p.add_argument("--visualize", type=int, default=0, metavar="N",
                   help="dump per-episode internal-state figures (VVA/VTA "
                        "priors, top proposals with scores, merged mask vs "
                        "gt) for the first N episodes to <log-path>/viz "
                        "(reference Matcher.py:230-231,872-1037 behind "
                        "main_MARS.py's --visualize flag)")
    p.add_argument("--bad-preds-path", default=None,
                   help="per-fold known-bad episode index list (one idx per "
                        "line, reference datasets/COCO2014/fold{f}_badPredsIdxs.txt)")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from "
                        "<log-path>/resume.pkl (meter histograms, timing "
                        "rows and every RNG stream are restored, so the "
                        "episode sequence is identical to an uninterrupted "
                        "run)")
    p.add_argument("--resume-every", type=int, default=20,
                   help="episodes between resume snapshots (0 disables)")
    # --- TPU execution ---
    p.add_argument("--bf16", action="store_true",
                   help="bf16 tower weights (the reference's fp16 analogue)")
    p.add_argument("--int8-towers", action="store_true",
                   help="weight-only int8 tower kernels (combine with --bf16)")
    p.add_argument("--w8a8-alphaclip", action="store_true",
                   help="with --int8-towers: dynamic int8 activations on the "
                        "AlphaCLIP tower too (s8xs8 MXU matmuls — the "
                        "compute-bound ranking stage)")
    p.add_argument("--seed", type=int, default=0)


def main(argv=None):
    p = argparse.ArgumentParser("mars_tpu evaluation")
    add_eval_args(p)
    args = p.parse_args(argv)
    if args.exp_name:
        args.log_path = os.path.join(args.log_path, args.exp_name)

    np.random.seed(args.seed)
    if args.mask_proposals_path and not os.path.isdir(args.mask_proposals_path):
        raise SystemExit(
            f"--mask-proposals-path does not exist: {args.mask_proposals_path}"
        )
    ds_kwargs = {}
    if args.annotations_datapath:
        # only the COCO reader has a separate annotation tree (the reference
        # defines the flag, main_MARS.py:114, but never consumes it; here it
        # is honored for coco and rejected elsewhere instead of silently
        # evaluating against default annotations)
        if args.benchmark != "coco":
            raise SystemExit("--annotations-datapath only applies to "
                             f"--benchmark coco (got {args.benchmark})")
        ds_kwargs["annotations_path"] = args.annotations_datapath
    ds = build_dataset(args.benchmark, args.datapath, args.fold, "test", args.nshot,
                       args.seed, **ds_kwargs)
    model = build_model(args)
    generator = None
    if args.generate_proposals:
        generator = make_inline_generator(
            args, dino_bundle=(model.dino_params, model.dino_cfg))
    meter = evaluation.AverageMeter(ds.benchmark, list(ds.class_ids))
    os.makedirs(args.log_path, exist_ok=True)
    # log.txt + console + arg dump (reference Logger.initialize:172-209)
    logger = mlog.initialize(args.log_path, "", args)
    # TensorBoard/Comet analogue: streams running mIoU/FB-IoU + per-episode
    # time to <log-path>/tbd/runs + scalars.csv (reference logger.py:197,259)
    metrics = mlog.MetricsLogger(args.log_path, meter, append=args.resume)
    t_start = time.time()
    timing_rows = []
    rng = np.random.RandomState(args.seed)
    # curated hard-case regression subset (reference mars/utils/logger.py:80-127)
    bad_idxs = set()
    if args.bad_preds_path and os.path.exists(args.bad_preds_path):
        with open(args.bad_preds_path) as f:
            bad_idxs = {int(x) for x in f.read().split() if x.strip()}

    n = args.episodes or len(ds)

    resume_path = os.path.join(args.log_path, "resume.pkl")
    start_idx = 0
    if args.resume and os.path.exists(resume_path):
        st = load_resume_state(resume_path, meter, rng, ds)
        start_idx = int(st["next_idx"])
        timing_rows = list(st["timing_rows"])
        logger.info(f"resuming from {resume_path} at episode {start_idx}")

    # 1-deep host prefetch: PIL episode prep + proposal load for idx+1
    # overlaps the device work of idx (the main thread blocks in the jitted
    # predict with the GIL released).  One FIFO worker keeps dataset /
    # proposal RNG draw order identical to the serial loop; inline
    # proposal GENERATION stays on the main thread — it shares the chip.
    from concurrent.futures import ThreadPoolExecutor

    def host_prep(idx):
        rec = ds[idx]
        ep = to_device_episode(rec, args.input_size, args.nshot)
        if generator is not None:
            props = None  # device-side, generated below
        elif args.mask_proposals_path:
            props = load_proposals(args, idx, args.input_size)
        else:
            props = synthetic_proposals(rec, args.input_size,
                                        args.proposal_bucket, rng)
        return rec, ep, props

    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(host_prep, start_idx) if n > start_idx else None

    # cross-episode text batching: --text-block D batches D whole episodes'
    # name queries in one VLM decode and their D definitions in another
    # (BlockTextStage); --pipelined-text overlaps episode idx's definition
    # with idx+1's names (PipelinedTextStage).  Either way ranking/metrics
    # for an episode complete up to (lookahead) iterations late with
    # bit-identical per-episode results.
    text_stage = None
    if not args.gt_class_names and model.retriever is not None:
        # -1 = auto: block-4 is the measured production default (337 vs
        # 681 ms/episode of text, BASELINE.md) unless the user explicitly
        # asked for the one-episode pipelined overlap instead
        block = args.text_block
        if block < 0:
            block = 0 if args.pipelined_text else 4
        if block > 1:
            from mars_tpu.text.retriever import BlockTextStage

            text_stage = BlockTextStage(model.retriever, depth=block)
        elif args.pipelined_text:
            from mars_tpu.text.retriever import PipelinedTextStage

            text_stage = PipelinedTextStage(model.retriever)
    from collections import deque

    pendings = deque()  # [idx, rec, ep, props, snap, span]

    def _as_list(res):
        # PipelinedTextStage yields one Optional result; BlockTextStage
        # yields a list — normalize to drain uniformly
        return res if isinstance(res, list) else ([] if res is None else [res])

    # ranking-completion overlap: launch the fused ranking program per
    # episode but pull the merged mask up to ``overlap`` episodes later, so
    # the chip's program queue stays fed (text decode / proposal programs
    # of later episodes) while the host fetches earlier results through
    # the ~35 ms tunnel round trip.  Identical programs and inputs →
    # bit-identical outputs; meter/CSV order stays FIFO (tests pin both).
    overlap = args.overlap_ranking
    if overlap < 0:
        # auto: cover one text block (its rankings drain together); a
        # 2-deep window otherwise
        overlap = (text_stage.depth if text_stage is not None
                   and hasattr(text_stage, "depth") else 2)
    if overlap and not hasattr(model, "predict_launch"):
        overlap = 0
    completions = deque()  # (idx, rec, props, merged_dev, launch_s,
    #                         text_span, snap)

    def drain(results, span):
        per = span / len(results)
        for res in results:
            it = pendings.popleft()
            finish_episode(it[0], it[1], it[2], it[3], *res, per + it[5],
                           it[4])

    def score_episode(idx, rec, props, pred, total, after_text, snap):
        gt, ig = resized_gt(rec, args.input_size)
        inter, union = evaluation.classify_prediction(pred, gt, ig)
        meter.update(inter, union, rec.class_id)
        if idx in bad_idxs:
            meter.update_bad_preds(inter, union, rec.class_id)
        timing_rows.append(
            [idx, total, after_text, int(np.asarray(props.valid).sum())]
        )
        metrics.log_metrics(idx)
        metrics.log_time_batch(total, idx)
        if idx % 20 == 0:
            miou, fb, _ = meter.compute_iou()
            logger.info(f"[{idx + 1}/{n}] mIoU {miou:.2f}  FB-IoU {fb:.2f}")
        if snap is not None:
            # saved only once the episode is fully scored, so a --resume
            # replays from a bit-exact boundary even though the text stage
            # and the ranking window ran ahead
            save_resume_state(resume_path, idx + 1, meter, timing_rows, snap)

    def complete_one():
        idx, rec, props, merged, launch_s, text_span, snap = \
            completions.popleft()
        t0 = time.time()
        pred = np.asarray(merged)
        span = launch_s + (time.time() - t0)
        score_episode(idx, rec, props, pred, span + text_span, span, snap)

    def finish_episode(idx, rec, ep, props, name, desc, text_span, snap):
        if idx < args.visualize:
            if name is None:
                # resolve once here; predict() below reuses the same
                # deterministic (greedy) retriever answer
                name, desc = model.retriever.get_conceptual_information(
                    *model.support_host_arrays(ep))
            dump_visualization(model, args, idx, rec, ep, props, name, desc)
        if not overlap or name is None:
            pred = np.asarray(model.predict(ep, props, class_name=name,
                                            class_description=desc))
            score_episode(idx, rec, props, pred,
                          model.timings["total"] + text_span,
                          model.timings["after_text_extraction"], snap)
            return
        t0 = time.time()
        merged = model.predict_launch(ep, props, name, desc)
        completions.append([idx, rec, props, merged, time.time() - t0,
                            text_span, snap])
        while len(completions) > overlap:
            complete_one()

    for idx in range(start_idx, n):
        rec, ep, props = fut.result()
        # rng states must be captured at the episode boundary, before the
        # prefetch for idx+1 consumes draws for that episode
        snap = (capture_rng_states(rng, ds)
                if args.resume_every and (idx + 1) % args.resume_every == 0
                else None)
        if idx + 1 < n:
            fut = pool.submit(host_prep, idx + 1)
        if generator is not None:
            props = generator(ep, episode_key(args.seed, idx))
        if text_stage is None:
            class_name = rec.class_name if args.gt_class_names else None
            finish_episode(idx, rec, ep, props, class_name, "", 0.0, snap)
            continue
        t0 = time.time()
        results = _as_list(text_stage.step(*model.support_host_arrays(ep)))
        text_span = time.time() - t0
        pendings.append([idx, rec, ep, props, snap, 0.0])
        if results:
            # attribute the block's decode span evenly across the episodes
            # it completed (plus any span their earlier steps accrued)
            drain(results, text_span)
        else:
            # buffering step (no VLM call completed an episode yet): the
            # span rides with this episode until its block drains
            pendings[-1][5] += text_span

    while pendings:
        t0 = time.time()
        results = _as_list(text_stage.flush())
        if not results:
            raise RuntimeError("text stage flush returned no results with "
                               f"{len(pendings)} episodes pending")
        drain(results, time.time() - t0)
    while completions:
        complete_one()

    pool.shutdown(wait=False)
    if os.path.exists(resume_path):
        os.remove(resume_path)  # run completed; a later --resume restarts
    with open(os.path.join(args.log_path, "ranking_time.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "total_s", "after_text_s", "n_proposals"])
        w.writerows(timing_rows)

    if n <= start_idx:
        # zero-episode run (--episodes 0 resolved to 0, or --resume of a
        # completed run): nothing accumulated — emitting step -1 records /
        # computing IoU on an empty meter would write NaN rows
        logger.info("no episodes to run")
        return 0.0, 0.0
    miou, fb, per_class = meter.compute_iou()
    avg_t = float(np.mean([r[1] for r in timing_rows]))
    logger.info(f"\n*** mIoU: {miou:.2f}  FB-IoU: {fb:.2f}  avg time/img: {avg_t:.3f}s ***")
    if meter.bad_class_ids:
        bmiou, bfb, _ = meter.compute_iou_bad_preds()
        logger.info(f"*** known-bad subset — mIoU: {bmiou:.2f}  FB-IoU: {bfb:.2f} ***")
        metrics.log_metrics_bad_preds(n - 1)
    metrics.end(time.time() - t_start, n - 1)
    return miou, fb


if __name__ == "__main__":
    main()
