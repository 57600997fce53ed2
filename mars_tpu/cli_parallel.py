"""Episode-parallel multi-chip evaluation driver.

The serial driver (cli.py) runs one episode at a time — right for the
single tunneled chip this image exposes.  On a real multi-chip slice the
scaling axis is whole episodes (SURVEY §2.5, reference has no distributed
live path): this driver batches episodes over the mesh 'data' axis and
runs the dp proposal generator + dp batched ranker (parallel/runner), one
episode per chip per step; tensor-parallel towers over 'model' compose
via parallel.mesh sharding rules.

Text: the gt-class-name path (reference --gt_class_names,
main_MARS.py:131) or the full VLM retriever — the dp batch doubles as the
text block (one B-row ViP-LLaVA decode per query kind per batch via
BlockTextStage; the decode is tensor-parallel under --mesh-model and
per-row exact, so the (name, definition) stream matches the serial
driver's bit-for-bit).  Proposals: synthetic stand-ins, precomputed dumps
(--mask-proposals-path), or inline episode-parallel generation
(--generate-proposals).

Meter-trace parity vs the serial loop is pinned on the 8-device CPU mesh
(tests/test_cli_parallel.py).
"""
from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np

from mars_tpu.data import build_dataset
from mars_tpu.data.base import episode_host_u8, resized_gt
from mars_tpu.utils import evaluation


def _text_feats(model, class_name: str, cache: dict,
                class_description: str = ""):
    """Per-(class, description) text features (cached — folds share ~tens
    of classes; the VLM's definitions repeat per class too)."""
    key = (class_name, class_description)
    if key not in cache:
        from mars_tpu.text import prompts as prompt_data

        vta_text = model._vta_text_feats(class_name)
        ac_text = model._alpha_clip_text_feats(
            prompt_data.alpha_clip_text(class_name, class_description))
        # cached as numpy: the batch assembly np.stacks host arrays and
        # ships one transfer per field (device stacks are eager dispatches)
        cache[key] = (np.asarray(vta_text), np.asarray(ac_text))
    return cache[key]


def evaluate_parallel(model, ds, mesh, *, input_size: int, nshot: int = 1,
                      episodes: int = None, proposal_bucket: int = 128,
                      seed: int = 0, gen_bundle=None, props_fn=None,
                      local_batch: int = 1, log=print, metrics_fn=None,
                      meter=None, start_idx: int = 0, snapshot=None,
                      bad_idxs=frozenset(), text_stage=None):
    """Run the eval loop in mesh-sized episode batches.

    gen_bundle: (sam_params, sam_cfg, amg_cfg, mcfg) → inline dp proposal
    generation; otherwise ``props_fn(idx, rec) -> Proposals`` supplies a
    host-side bucket (dumps or synthetic stand-ins).

    text_stage: a BlockTextStage-protocol object (step(images, masks) →
    [] | [(name, desc)…], flush() → the partial block) wired to the VLM
    retriever — the dp batch IS its text block: one B-row decode answers
    the whole batch's name queries and another the definitions (the VLM's
    batched decode is per-row exact, so the (name, desc) stream is
    bit-identical to the serial retriever's — reference
    TextRetrieverModule.py:76-122).  None = the gt-class-name path.

    ``local_batch``: episodes per chip per step (the generator lax.maps its
    locals sequentially — dead-chunk conds stay live; the ranker vmaps).

    Resume: pass a restored ``meter`` + batch-aligned ``start_idx``;
    ``snapshot(next_idx, meter)`` fires after every completed batch (the
    host RNG states it must capture advance only during batch prep, so a
    batch boundary is a clean cut — same contract as the serial driver's
    capture_rng_states).

    Returns (miou, fb_iou, meter, batch_times).
    """
    import jax
    import jax.numpy as jnp

    from mars_tpu.parallel import runner

    B = mesh.shape["data"] * local_batch
    n = episodes or len(ds)
    if start_idx < n and start_idx % B:
        raise ValueError(
            f"start_idx {start_idx} is not aligned to the batch size {B} — "
            "resume with the same mesh/local-batch the snapshot was taken at")
    if meter is None:
        meter = evaluation.AverageMeter(ds.benchmark, list(ds.class_ids))
    # e.g. lambda meter: mlog.MetricsLogger(log_path, meter) — the serial
    # driver's TensorBoard/CSV scalar stream (reference logger.py:197,259)
    metrics = metrics_fn(meter) if metrics_fn is not None else None

    params = {"dino": model.dino_params, "clip_v": model.clip_v,
              "ac_v": model.ac_v, "logit_scale": model.clip_scale}
    ranker = runner.make_batched_ranker(
        model.dino_cfg, model.clip_vcfg, model.ac_vcfg,
        model.cfg.vva, model.cfg.vta, model.cfg.filter_merge, mesh=mesh)
    generator = None
    if gen_bundle is not None:
        sam_params, sam_cfg, amg_cfg, mcfg = gen_bundle
        generator = runner.make_batched_proposal_generator(
            model.dino_cfg, sam_cfg, amg_cfg, mcfg, mesh,
            bucket=proposal_bucket)
        gen_params = {"dino": model.dino_params, "sam": sam_params}
    from mars_tpu.data.base import _episode_floats as to_floats

    base_key = jax.random.PRNGKey(seed)
    # per-idx keys in ONE dispatch (deterministic regardless of batching);
    # a per-episode eager fold_in costs a ~35 ms tunnel round trip each.
    # MUST stay bit-equal to cli.episode_key(seed, idx) — the serial
    # driver derives the same stream, so serial and dp meter traces of
    # one fold cross-check (pinned by tests/test_cli_parallel.py)
    fold_keys = jax.jit(jax.vmap(lambda i: jax.random.fold_in(base_key, i)))

    cache: dict = {}
    batch_times = []
    for b0 in range(start_idx, n, B):
        t0 = time.time()
        idxs = list(range(b0, min(b0 + B, n)))
        live = len(idxs)
        # pad the final partial batch by repeating the last episode; the
        # padded rows are computed and discarded (static shapes > ragged)
        padded = idxs + [idxs[-1]] * (B - live)

        # host-side assembly: everything stays numpy until ONE fixed-shape
        # transfer per field per batch (uint8 over the wire for images)
        recs, eps, host_props = [], [], []
        for k, idx in enumerate(padded):
            # pad rows reuse the last live record WITHOUT re-reading the
            # dataset (COCO-style datasets draw from their RNG per getitem)
            rec = ds[idx] if k < live else recs[-1]
            recs.append(rec)
            eps.append(episode_host_u8(rec, input_size, nshot))
            if generator is None:
                # pad rows reuse the last LIVE bucket: props_fn may consume
                # host RNG draws, which must match the serial loop's order
                host_props.append(props_fn(idx, rec) if k < live
                                  else host_props[-1])

        if text_stage is not None:
            # VLM text for the whole batch: step the block stage with each
            # live episode's valid support shots (uint8 HWC + float masks —
            # episode_host_u8's arrays round-trip bit-exact vs the serial
            # driver's support_host_arrays), then flush the partial block
            pairs = []
            for k in range(live):
                sup_i, sup_m, _, sup_v = eps[k]
                ns = int(sup_v.sum())
                pairs += text_stage.step(
                    [sup_i[i] for i in range(ns)],
                    [sup_m[i].astype(np.float32) for i in range(ns)])
            if len(pairs) < live:
                pairs += text_stage.flush()
            texts = [_text_feats(model, nm, cache, desc)
                     for nm, desc in pairs]
            texts += [texts[-1]] * (len(padded) - live)  # pad rows
        else:
            texts = [_text_feats(model, rec.class_name, cache)
                     for rec in recs]

        sup_i, sup_m, qry = to_floats(
            jnp.asarray(np.stack([e[0] for e in eps])),
            jnp.asarray(np.stack([e[1] for e in eps])),
            jnp.asarray(np.stack([e[2] for e in eps])))
        sup_v = jnp.asarray(np.stack([e[3] for e in eps]))
        vta_text = jnp.asarray(np.stack([t[0] for t in texts]))
        ac_text = jnp.asarray(np.stack([t[1] for t in texts]))

        if generator is not None:
            keys = fold_keys(jnp.asarray(padded, jnp.int32))
            sh = runner.shard_batch((keys, sup_i, sup_m, sup_v, qry), mesh)
            gout = generator(gen_params, *sh)
            prop_m = gout["bucket_masks"]
            prop_v = gout["bucket_valid"]
        else:
            prop_m = jnp.asarray(
                np.stack([np.asarray(p.masks) for p in host_props]))
            prop_v = jnp.asarray(
                np.stack([np.asarray(p.valid) for p in host_props]))

        batch = runner.shard_batch(
            (sup_i, sup_m, sup_v, qry, prop_m, prop_v, vta_text, ac_text),
            mesh)
        merged, _scores = ranker(params, *batch)
        merged_np = np.asarray(merged)

        for j in range(live):
            idx, rec = idxs[j], recs[j]
            gt, ig = resized_gt(rec, input_size)
            inter, union = evaluation.classify_prediction(merged_np[j], gt, ig)
            meter.update(inter, union, rec.class_id)
            if idx in bad_idxs:
                meter.update_bad_preds(inter, union, rec.class_id)
            if metrics is not None:
                metrics.log_metrics(idx)
        batch_times.append(time.time() - t0)
        if metrics is not None:
            metrics.log_time_batch(batch_times[-1], b0 // B)
        if snapshot is not None:
            snapshot(min(b0 + B, n), meter)
        if (b0 // B) % 5 == 0:
            miou, fb, _ = meter.compute_iou()
            log(f"[{min(b0 + B, n)}/{n}] mIoU {miou:.2f}  FB-IoU {fb:.2f}  "
                f"({live}/{B} live, {batch_times[-1]:.2f}s/batch)")

    miou, fb, _ = meter.compute_iou()
    return miou, fb, meter, batch_times


def main(argv=None):
    from mars_tpu import cli
    from mars_tpu.parallel import mesh as mesh_lib

    p = argparse.ArgumentParser("mars_tpu episode-parallel evaluation")
    cli.add_eval_args(p)
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-axis size (default: all devices / mesh-model)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel axis size for the towers")
    p.add_argument("--local-batch", type=int, default=1,
                   help="episodes per chip per step")
    args = p.parse_args(argv)
    if args.exp_name:
        args.log_path = os.path.join(args.log_path, args.exp_name)

    np.random.seed(args.seed)
    ds_kwargs = {}
    if args.annotations_datapath:
        if args.benchmark != "coco":
            raise SystemExit("--annotations-datapath only applies to "
                             f"--benchmark coco (got {args.benchmark})")
        ds_kwargs["annotations_path"] = args.annotations_datapath
    ds = build_dataset(args.benchmark, args.datapath, args.fold, "test",
                       args.nshot, args.seed, **ds_kwargs)
    model = cli.build_model(args)
    mesh = mesh_lib.make_mesh(args.mesh_data, args.mesh_model)
    if args.mesh_model > 1:
        model.dino_params = mesh_lib.shard_params(model.dino_params, mesh)
        model.clip_v = mesh_lib.shard_params(model.clip_v, mesh)
        model.ac_v = mesh_lib.shard_params(model.ac_v, mesh)
    print(f"mesh: {dict(mesh.shape)}")

    gen_bundle = None
    props_fn = None
    # props rng: only the synthetic path draws from it, but it is always
    # created + snapshotted so resume restores a consistent state
    rng = np.random.RandomState(args.seed)
    if args.generate_proposals:
        from mars_tpu.models import zoo
        from mars_tpu.pipeline import amg, matcher

        if args.proposal_model == "semantic-sam":
            raise SystemExit("episode-parallel generation drives the SAM "
                             "backend; semantic-sam stays on the serial cli")
        sam_params, sam_cfg = zoo.build_sam(args.models_path, args.sam_size)
        if args.bf16:
            from mars_tpu.models.precision import cast_floating

            sam_params = cast_floating(sam_params)
        mcfg = matcher.MatcherConfig(
            input_size=args.input_size,
            grid=args.input_size // model.dino_cfg.patch_size,
            patch_size=model.dino_cfg.patch_size)
        gen_bundle = (sam_params, sam_cfg, amg.AmgConfig(), mcfg)
    elif args.mask_proposals_path:
        props_fn = lambda idx, rec: cli.load_proposals(
            args, idx, args.input_size)
    else:
        props_fn = lambda idx, rec: cli.synthetic_proposals(
            rec, args.input_size, args.proposal_bucket, rng)

    os.makedirs(args.log_path, exist_ok=True)
    from mars_tpu.utils import logging as mlog

    logger = mlog.initialize(args.log_path, "", args)

    meter = evaluation.AverageMeter(ds.benchmark, list(ds.class_ids))
    bad_idxs = set()
    if args.bad_preds_path and os.path.exists(args.bad_preds_path):
        with open(args.bad_preds_path) as f:
            bad_idxs = {int(x) for x in f.read().split() if x.strip()}

    # batch-granular resume: snapshots fire at batch boundaries (the same
    # meter/RNG schema as the serial driver, cli.save_resume_state); the
    # inline-dp keys are stateless fold_in(seed, idx) so only the dataset
    # and props RNG streams need restoring
    resume_path = os.path.join(args.log_path, "resume.pkl")
    start_idx = 0
    if args.resume and os.path.exists(resume_path):
        st = cli.load_resume_state(resume_path, meter, rng, ds)
        start_idx = int(st["next_idx"])
        logger.info(f"resuming from {resume_path} at episode {start_idx}")
    snapshot = None
    if args.resume_every:
        def snapshot(next_idx, meter):
            cli.save_resume_state(resume_path, next_idx, meter, [],
                                  cli.capture_rng_states(rng, ds))

    text_stage = None
    if not args.gt_class_names and model.retriever is not None:
        # the dp batch is the text block: ONE B-row VLM decode answers the
        # batch's name queries and another the definitions (per-row exact →
        # the (name, desc) stream matches the serial driver's bit-for-bit);
        # the VLM decode itself is tensor-parallel under --mesh-model
        from mars_tpu.text.retriever import BlockTextStage

        text_stage = BlockTextStage(
            model.retriever,
            depth=mesh.shape["data"] * args.local_batch)

    t0 = time.time()
    miou, fb, meter, batch_times = evaluate_parallel(
        model, ds, mesh, input_size=args.input_size, nshot=args.nshot,
        episodes=args.episodes, proposal_bucket=args.proposal_bucket,
        seed=args.seed, gen_bundle=gen_bundle, props_fn=props_fn,
        local_batch=args.local_batch, log=logger.info,
        metrics_fn=lambda m: mlog.MetricsLogger(args.log_path, m,
                                                append=args.resume),
        meter=meter, start_idx=start_idx, snapshot=snapshot,
        bad_idxs=bad_idxs, text_stage=text_stage)
    total = time.time() - t0
    if os.path.exists(resume_path):
        os.remove(resume_path)  # run completed; a later --resume restarts
    n = args.episodes or len(ds)
    with open(os.path.join(args.log_path, "batch_time.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["batch", "seconds"])
        w.writerows(enumerate(batch_times))
    logger.info(f"mIoU {miou:.2f}  FB-IoU {fb:.2f}  ({n} episodes, "
                f"{total:.1f}s total, {total / max(n, 1):.3f}s/episode "
                "amortized)")
    if meter.bad_class_ids:
        bmiou, bfb, _ = meter.compute_iou_bad_preds()
        logger.info(f"*** known-bad subset — mIoU: {bmiou:.2f}  "
                    f"FB-IoU: {bfb:.2f} ***")


if __name__ == "__main__":
    main()
