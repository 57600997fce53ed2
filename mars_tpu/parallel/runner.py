"""Episode-parallel batched ranking over a device mesh.

The primary scaling axis for this workload is whole episodes (SURVEY §2.5):
this module vmaps the device ranking stages over an episode batch and
shards the batch over the mesh 'data' axis while tower weights are
replicated (or tensor-parallel over 'model' via parallel.mesh rules).
Per-episode work never crosses chips, so the only collectives are those
GSPMD inserts for tensor-parallel weights.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mars_tpu.core import imaging
from mars_tpu.pipeline import filtering, vta as vta_m, vva as vva_m


def _manual_axes(mesh: Mesh, axis: str):
    """Mesh axes a runner shard_map runs MANUALLY: the primary ``axis``
    plus every size-1 axis.  When nothing is left auto, pallas kernels in
    the body lower per-chip as written; any remaining auto axis (real
    tensor parallelism over 'model') routes the body through GSPMD, which
    cannot partition a ``pallas_call`` ("Mosaic kernels cannot be
    automatically partitioned") — those programs must trace the XLA
    attention path instead.  → (axis_names set, needs_xla_attention)."""
    manual = {n for n in mesh.axis_names if n == axis or mesh.shape[n] == 1}
    return manual, len(manual) < len(mesh.axis_names)


def _xla_attention_body(fn):
    """Wrap a shard_map body so it TRACES with the XLA attention impl
    (pallas cannot be GSPMD-partitioned over auto mesh axes)."""
    from mars_tpu.models import layers

    def wrapped(*a):
        with layers.attention_impl("xla"):
            return fn(*a)

    return wrapped


def make_batched_ranker(dino_cfg, clip_vcfg, ac_vcfg, vva_cfg, vta_cfg, fm_cfg,
                        mesh: Optional[Mesh] = None):
    """→ ranker(params_bundle, batch) over leading episode axis.

    params_bundle: {"dino", "clip_v", "ac_v", "logit_scale"}
    batch: dict with support_images (B,S,H,W,3), support_masks (B,S,H,W),
      support_valid (B,S), query_image (B,H,W,3),
      proposal_masks (B,P,H,W), proposal_valid (B,P),
      vta_text (B,T,Dc), ac_text (B,1,Da)
    Returns (merged (B,H,W), scores (B,P)).
    """
    g = vva_cfg.grid

    def rank_one(params, sup_i, sup_m, sup_v, qry, prop_m, prop_v, vta_text, ac_text):
        vva_prior, cost, support_fg = vva_m.compute(
            params["dino"], sup_i, sup_m, sup_v, qry, dino_cfg, vva_cfg
        )
        vta_prior = vta_m.compute(
            params["clip_v"], qry, vta_text, params["logit_scale"], clip_vcfg, vta_cfg
        )
        vta_prior = imaging.interpolate_2d(vta_prior, (g, g), "nearest")
        vta_prior = (vta_prior - vta_prior.min()) / (1e-7 + vta_prior.max() - vta_prior.min())
        ac_scores = filtering.alphaclip_scores(
            params["ac_v"], qry, prop_m, ac_text, ac_vcfg, fm_cfg,
            proposal_valid=prop_v,
        )
        return filtering.score_and_merge(
            prop_m, prop_v, support_fg, cost, vva_prior, vta_prior, ac_scores, fm_cfg
        )

    vmapped = jax.vmap(rank_one, in_axes=(None,) + (0,) * 8)

    if mesh is None:
        return jax.jit(vmapped)

    # Manual shard_map over 'data': each chip runs its local episode shard
    # with NO possibility of GSPMD inserting cross-chip collectives on
    # episode tensors (under plain in_shardings GSPMD was observed to
    # all-gather a conv kernel inside the vmapped AlphaCLIP stage).  A
    # real 'model' axis stays auto so tensor-parallel params still work —
    # which forces the XLA attention trace (pallas can't be
    # GSPMD-partitioned); a size-1 'model' axis goes manual so the pallas
    # tap keeps running on TPU.
    manual, needs_xla = _manual_axes(mesh, "data")
    fn = jax.shard_map(
        _xla_attention_body(vmapped) if needs_xla else vmapped,
        mesh=mesh,
        axis_names=manual,
        in_specs=(P(),) + (P("data"),) * 8,
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_batch(batch_args, mesh: Mesh):
    """Place a tuple of per-episode-batched arrays on the data axis."""
    dsh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(x, dsh) for x in batch_args)


def _masked_min_max_psharded(x, valid, axis):
    """imaging.masked_min_max_scale with the vector sharded over ``axis``:
    the min/max reductions cross chips, the scaling stays local."""
    big = jnp.finfo(x.dtype).max
    mn = jax.lax.pmin(jnp.min(jnp.where(valid, x, big)), axis)
    mx = jax.lax.pmax(jnp.max(jnp.where(valid, x, -big)), axis)
    return jnp.where(valid, (x - mn) / (mx - mn + 1e-8), 0.0)


def make_proposal_parallel_ranker(dino_cfg, clip_vcfg, ac_vcfg, vva_cfg,
                                  vta_cfg, fm_cfg, mesh: Mesh,
                                  axis: str = "data"):
    """Single-episode ranking with the PROPOSAL bucket sharded over ``axis``.

    The full-bucket worst case is dominated by per-proposal work — the
    AlphaCLIP tower over every proposal's alpha mask plus the Sinkhorn EMD
    (BASELINE.md: 554 + 178 of ~610 ms on one v5e) — which is
    embarrassingly parallel over the bucket, so sharding proposals cuts
    single-episode LATENCY near-linearly where episode-parallelism
    (make_batched_ranker) only adds throughput.  The per-episode towers
    (VVA support/query pass, VTA Grad-CAM) are replicated compute on every
    chip; cross-chip traffic is only the cross-proposal reductions of
    score_and_merge (reference FilteringMergingModule.py:104-132,209-221):
    the (g, g) footprint union, the min-max score bounds, the top-score
    threshold, and the (H, W) merged-mask union — all tiny next to ICI
    bandwidth.

    → rank(params_bundle, sup_i, sup_m, sup_v, qry, prop_masks, prop_valid,
           vta_text, ac_text) with prop_masks (P, H, W) / prop_valid (P,)
    sharded over ``axis`` (P divisible by the axis size); returns
    (merged (H, W) replicated, final scores (P,) sharded).
    """
    g = vva_cfg.grid
    n_shards = mesh.shape[axis]

    def rank(params, sup_i, sup_m, sup_v, qry, prop_m, prop_v,
             vta_text, ac_text):
        # per-episode priors: replicated compute (identical on every chip)
        vva_prior, cost, support_fg = vva_m.compute(
            params["dino"], sup_i, sup_m, sup_v, qry, dino_cfg, vva_cfg)
        vta_prior = vta_m.compute(
            params["clip_v"], qry, vta_text, params["logit_scale"],
            clip_vcfg, vta_cfg)
        vta_prior = imaging.interpolate_2d(vta_prior, (g, g), "nearest")
        vta_prior = (vta_prior - vta_prior.min()) / (
            1e-7 + vta_prior.max() - vta_prior.min())

        # per-proposal work on the local shard: AlphaCLIP keeps its
        # dead-chunk skip per chip (a shard with no valid rows pays no
        # tower compute), EMD rows are independent
        ac_local = filtering.alphaclip_scores(
            params["ac_v"], qry, prop_m, ac_text, ac_vcfg, fm_cfg,
            proposal_valid=prop_v)

        # the SAME score_and_merge math, cross-proposal reductions ride ICI
        merged, final = filtering.score_and_merge_core(
            prop_m, prop_v, support_fg, cost, vva_prior, vta_prior,
            ac_local, fm_cfg,
            any_reduce=lambda m: jax.lax.pmax(
                m.astype(jnp.float32), axis) > 0,
            minmax=lambda s, v: _masked_min_max_psharded(s, v, axis),
            max_reduce=lambda x: jax.lax.pmax(x, axis))
        return merged, final

    manual, needs_xla = _manual_axes(mesh, axis)
    fn = jax.shard_map(
        _xla_attention_body(rank) if needs_xla else rank,
        mesh=mesh,
        axis_names=manual,
        in_specs=(P(),) + (P(),) * 4 + (P(axis), P(axis)) + (P(),) * 2,
        out_specs=(P(), P(axis)),
        check_vma=False,
    )

    jitted = jax.jit(fn)

    def call(params, sup_i, sup_m, sup_v, qry, prop_m, prop_v,
             vta_text, ac_text):
        if prop_m.shape[0] % n_shards:
            raise ValueError(
                f"proposal bucket {prop_m.shape[0]} not divisible by "
                f"mesh axis '{axis}' of size {n_shards}")
        return jitted(params, sup_i, sup_m, sup_v, qry, prop_m, prop_v,
                      vta_text, ac_text)

    return call


def make_batched_proposal_generator(dino_cfg, sam_cfg, amg_cfg, mcfg,
                                    mesh: Mesh, bucket: int = 128,
                                    axis: str = "data"):
    """Episode-parallel PROPOSAL GENERATION over the mesh ``axis`` — the dp
    vehicle for the Matcher stage (reference Matcher.predict :216-249 runs
    one episode per GPU process; here B episodes run one-per-chip).

    The single-episode flow branches on the host between the two prompt
    families (matcher.generate_proposals); an SPMD batch can't branch per
    episode, so this decodes matcher.union_family_rows — the inactive
    family's rows are invalid in place and each chip's dead-chunk
    ``lax.cond`` skips price only the active family (shard_map keeps the
    conds live where vmap would select both sides).  Outputs are bit-exact
    vs the per-episode path (tests/test_parallel.py).

    → gen(params_bundle, keys (B,2) uint32, support_images (B,S,H,W,3),
         support_masks (B,S,H,W), support_valid (B,S), query (B,H,W,3))
    with B a multiple of the axis size (each chip lax.maps its local
    episodes sequentially); params_bundle: {"dino", "sam"}.  Returns dict
    with the compacted ranking bucket ("bucket_masks"/"bucket_valid",
    feed make_batched_ranker) plus the proposal path's own outputs
    ("merged", "final_score", "mask_score"), all (B, ...)."""
    from mars_tpu.pipeline import matcher

    rows = matcher.union_family_rows(mcfg)
    n_shards = mesh.shape[axis]

    def body(params, keys, sup_i, sup_m, sup_v, qry):
        def one(args):
            key, si, sm, sv, q = args
            _, out = matcher._fused_stage(
                key, params["dino"], params["sam"], si, sm, sv, q, None,
                dino_cfg, sam_cfg, amg_cfg, mcfg, rows, False, bucket=bucket)
            return {"bucket_masks": out["bucket_masks"],
                    "bucket_valid": out["bucket_valid"],
                    "merged": out["merged"],
                    "final_score": out["final_score"],
                    "mask_score": out["mask_score"]}
        return jax.lax.map(one, (keys, sup_i, sup_m, sup_v, qry))

    manual, needs_xla = _manual_axes(mesh, axis)
    fn = jax.shard_map(
        _xla_attention_body(body) if needs_xla else body,
        mesh=mesh,
        axis_names=manual,
        in_specs=(P(),) + (P(axis),) * 5,
        out_specs=P(axis),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def call(params, keys, sup_i, sup_m, sup_v, qry):
        if qry.shape[0] % n_shards:
            raise ValueError(
                f"episode batch {qry.shape[0]} not divisible by mesh axis "
                f"'{axis}' of size {n_shards}")
        return jitted(params, keys, sup_i, sup_m, sup_v, qry)

    return call
