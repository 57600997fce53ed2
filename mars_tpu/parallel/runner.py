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
    # all-gather a conv kernel inside the vmapped AlphaCLIP stage).  The
    # 'model' axis stays auto, so tensor-parallel params still work.
    fn = jax.shard_map(
        vmapped,
        mesh=mesh,
        axis_names={"data"},
        in_specs=(P(),) + (P("data"),) * 8,
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_batch(batch_args, mesh: Mesh):
    """Place a tuple of per-episode-batched arrays on the data axis."""
    dsh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(x, dsh) for x in batch_args)
