"""Mask-generator backend protocol.

The reference has two proposal backends: SAM (matcher/Matcher.py) and
Semantic-SAM (matcher/Matcher_SemanticSAM.py, driving the external
``semantic_sam`` package that the reference does not vendor).  This module
makes the backend a first-class slot: anything implementing
``MaskGeneratorBackend`` can feed the Matcher pipeline, and the MARS
orchestrator's optional ``mask_generator`` hook (reference mars/MARS.py:21,
46-51) accepts the same protocol.
"""
from __future__ import annotations

from typing import Optional, Protocol, Tuple

import jax.numpy as jnp


class MaskGeneratorBackend(Protocol):
    """Prompt-conditioned mask proposal backend."""

    def encode(self, image01: jnp.ndarray) -> jnp.ndarray:
        """(H, W, 3) raw [0,1] image → backend embedding."""

    def decode(
        self,
        embedding: jnp.ndarray,
        point_coords: jnp.ndarray,  # (B, K, 2) original-pixel xy
        point_labels: jnp.ndarray,  # (B, K) {-1, 0, 1}
        set_valid: jnp.ndarray,  # (B,)
        original_size: Tuple[int, int],
        box: Optional[jnp.ndarray] = None,
        mask_input: Optional[jnp.ndarray] = None,
    ) -> dict:
        """→ dict with masks/low_res_logits/iou/stability/boxes/valid/set_index
        (the pipeline.amg.decode_prompt_sets contract)."""


class SamBackend:
    """The built-in SAM backend (pipeline.amg over models.sam)."""

    def __init__(self, params, model_cfg, amg_cfg):
        from mars_tpu.pipeline import amg

        self._amg = amg
        self.params = params
        self.model_cfg = model_cfg
        self.amg_cfg = amg_cfg

    def encode(self, image01):
        return self._amg.encode_target(self.params, image01, self.model_cfg)

    def decode(self, embedding, point_coords, point_labels, set_valid,
               original_size, box=None, mask_input=None):
        return self._amg.decode_prompt_sets(
            self.params, embedding, point_coords, point_labels, set_valid,
            self.model_cfg, self.amg_cfg, original_size=original_size,
            box=box, use_box=box is not None,
            mask_input=mask_input, use_mask_input=mask_input is not None,
        )

    def dense_sweep(self, embedding, original_size):
        return self._amg.generate_dense(
            self.params, embedding, self.model_cfg, self.amg_cfg, original_size
        )


# A Semantic-SAM backend would implement the same protocol over a JAX port of
# SemanticSAMPredictor (the reference's variant consumes point prompts and
# returns multi-granularity masks, matcher/Matcher_SemanticSAM.py:28-481);
# the external `semantic_sam` weights/architecture are not vendored by the
# reference either, so the port is tracked for a later round.
