"""Class-name/definition retrieval: visual-prompted VLM + WordNet (host-side).

Functional parity with the reference's TextRetrieverModule
(reference: mars/components/TextRetrieverModule.py:42-366):
  - per-shot visual prompt drawn on the support image, VLM asked for the
    class name (greedy, max 20 new tokens), majority vote over shots
  - ensemble modes over color x zoom x prompt-type with inner majority vote
  - a second VLM query for a >= 20-token definition
  - WordNet synset lookup with underscore/concatenation/subword fallbacks
    and stopword-filtered token-overlap disambiguation against the VLM
    definition (:139-185)

VLM backends:
  - ``HFVipLlava``: ViP-LLaVA-7B via transformers (the reference's model,
    TextRetrieverModule.py:446-490) — requires local weights.
  - ``OracleVLM``: returns the dataset class name — the "gt class name"
    evaluation mode (the reference conceptually supports this via
    ClipPipeline's args.use_gt_class_names pattern, ClipPipeline.py:302).
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import List, Optional, Protocol, Sequence, Tuple

import numpy as np

from mars_tpu.text.prompts import (
    COLORS,
    VISUAL_PROMPTS,
    VISUAL_PROMPTS_DESCRIPTIONS,
    VLM_SYSTEM_TEMPLATE,
)
from mars_tpu.text.visual_prompts import GENERATORS


class VLM(Protocol):
    def generate(self, image: np.ndarray, prompt: str,
                 max_new_tokens: int = 20, min_new_tokens: int = 0) -> str: ...


class OracleVLM:
    """Answers with a fixed class name/definition (gt-class-name mode and
    tests)."""

    def __init__(self, name: str, definition: str = ""):
        self.name = name
        self.definition = definition

    def generate(self, image, prompt, max_new_tokens=20, min_new_tokens=0):
        if "definition" in prompt:
            return self.definition or f"a {self.name}"
        return self.name


class HFVipLlava:
    """ViP-LLaVA-7B through transformers (reference :446-490).

    Loads fp16 (optionally 4/8-bit when bitsandbytes is available — it is
    not in the TPU image, so quantization silently falls back to fp16).
    """

    def __init__(self, model_path: str = "llava-hf/vip-llava-7b-hf", device_map="auto"):
        import torch
        from transformers import AutoProcessor, VipLlavaForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(model_path)
        self.model = VipLlavaForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float16, device_map=device_map
        )

    def generate(self, image, prompt, max_new_tokens=20, min_new_tokens=0):
        from PIL import Image

        inputs = self.processor(
            text=prompt, images=Image.fromarray(image), return_tensors="pt"
        ).to(self.model.device)
        kwargs = {"max_new_tokens": max_new_tokens}
        if min_new_tokens:
            kwargs["min_new_tokens"] = min_new_tokens
        out = self.model.generate(**inputs, **kwargs)
        return self.processor.decode(
            out[0][len(inputs["input_ids"][0]):], skip_special_tokens=True
        )


class JaxVipLlava:
    """ViP-LLaVA running ON the TPU via the JAX port (models.vip_llava).

    Uses the HF processor for tokenization/image preprocessing (host-side)
    and the jitted multimodal greedy decoder for generation — the VLM stops
    being a second-GPU side-car (reference TextRetrieverModule.py:449) and
    joins the device pipeline.
    """

    # class-level defaults so partially-constructed instances (tests
    # build via object.__new__) inherit the production configuration
    draft_gate = 2
    kv_bits = None

    def __init__(self, model_path: str = "llava-hf/vip-llava-7b-hf",
                 params=None, cfg=None, dtype=None, quantize_bits=None,
                 int4_format: str = "affine", draft_tokens: int = 8,
                 ngram: int = 3, draft_gate: int = 2,
                 kv_bits: int = None):
        from transformers import AutoProcessor

        from mars_tpu.models import vip_llava as vl

        # prompt-lookup speculative decoding for single-query generates
        # (EXACT greedy; see models.vip_llava.generate_greedy) — the
        # definition query restates the class name and prompt phrasing,
        # which n-gram lookup drafts well; 0 disables.  draft_gate > 0
        # acceptance-gates the loop (probe mode until the lookup's first
        # draft token predicts the emitted token ``draft_gate`` steps in a
        # row) so non-drafting output decodes at PLAIN speed — round-4
        # bench measured ungated K=8 at 0.88x on definition-like filler;
        # draft_gate=0 is the ungated legacy loop
        self.draft_tokens = draft_tokens
        self.ngram = ngram
        self.draft_gate = draft_gate
        # kv_bits=8: int8 KV cache (per-token per-head scales, see
        # models.vip_llava._kv_quant) — halves cache residency/traffic;
        # NOT bit-identical to bf16 KV (greedy tokens pinned on the
        # tiny fixture instead).  None/16 = bf16 cache.
        self.kv_bits = kv_bits
        self._prefix_ids_cache = {}
        self._prefix_kv_cache = None
        self.processor = AutoProcessor.from_pretrained(model_path)
        self.cfg = cfg or vl.VipLlavaConfig()
        if params is None:
            from mars_tpu.models import zoo

            sd = zoo.load_torch_state_dict(model_path)
            params = vl.convert_hf(sd, self.cfg)
        if dtype is not None:
            from mars_tpu.models.precision import cast_floating

            params = cast_floating(params, dtype)
        if quantize_bits is not None:
            # int8 fits the full 7B on one v5e (7.35 GB, ~47 tok/s measured)
            from mars_tpu.models.quantization import quantize_params

            params = quantize_params(params, bits=quantize_bits,
                                     int4_format=int4_format)
        self.params = params
        self._vl = vl

    def _eos_id(self):
        return getattr(self.processor.tokenizer, "eos_token_id", None)

    def _draft_slack(self) -> int:
        """KV positions a speculative verify step can write past the
        accepted length (K draft tokens + the bonus token); 0 when
        speculation is off."""
        return self.draft_tokens + 1 if self.draft_tokens else 0

    def _inplace_buffer_len(self, prefix_len: int, bucket: int) -> int:
        """Allocation length for the full-decode-length KV buffer of the
        in-place chained flow.  MUST stay >= _inplace_need() for every
        retriever budget (all are <= _INPLACE_BUDGET), or decodes silently
        drop onto the copy fallback path (2x peak KV — the D=6 OOM)."""
        return prefix_len + bucket + self._INPLACE_BUDGET + self._draft_slack()

    def _inplace_need(self, prefix_len: int, bucket: int, budget: int) -> int:
        """Buffer length a decode with this token budget requires for the
        in-place (donated) path."""
        return prefix_len + bucket + budget + self._draft_slack()

    def _decode_row(self, toks):
        eos = self._eos_id()
        toks = list(toks)
        if eos is not None and eos in toks:
            toks = toks[: toks.index(eos)]
        return self.processor.tokenizer.decode(toks, skip_special_tokens=True).strip()

    # shared-prefix KV reuse is supported (TextRetriever passes the
    # template prefix — name + definition queries share image + prefix)
    supports_shared_prefix = True

    def generate(self, image, prompt, max_new_tokens=20, min_new_tokens=0,
                 shared_prefix: str = None):
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        inputs = self.processor(text=prompt, images=Image.fromarray(image),
                                return_tensors="np")
        ids_np = np.asarray(inputs["input_ids"])
        l0 = ids_np.shape[1]
        pixels = jnp.asarray(np.transpose(inputs["pixel_values"], (0, 2, 3, 1)))

        # shared-prefix KV reuse: the retriever's name and definition
        # queries draw the SAME image and share the prompt up to the
        # question (reference helpers/prompts.py:23 — "Human: <image>\n{}")
        # so the vision tower + ~580-position prefill runs once per image.
        # Guarded by a host-side tokenization check (BPE boundaries could
        # in principle split differently); mismatch falls back to the
        # plain full-prompt path.
        prefix_len, prefix_kv = 0, None
        if shared_prefix:
            prefix_len, prefix_kv = self._prefix_state(
                shared_prefix, image, ids_np, pixels)
        if prefix_kv is not None:
            body = ids_np[:, prefix_len:]
            tl = l0 - prefix_len
        else:
            prefix_len, body, tl = 0, ids_np, l0

        # right-pad the prompt to a 128-bucket so the decoder compiles once
        # per bucket instead of once per prompt length
        lb = body.shape[1]
        bucket = ((lb + 127) // 128) * 128
        body = np.pad(body, ((0, 0), (0, bucket - lb)))
        # eos_id: HF-generate semantics — rows freeze at EOS and the decode
        # loop exits early (a 3-token class name inside a 20-token budget
        # skips ~17 weight-streaming steps); min_new_tokens masks EOS like
        # HF's MinNewTokensLengthLogitsProcessor (the reference's definition
        # query, TextRetrieverModule.py:118)
        budget = max(max_new_tokens, min_new_tokens)
        kw = dict(max_new_tokens=budget, true_length=jnp.int32(tl),
                  eos_id=self._eos_id(), min_new_tokens=min_new_tokens,
                  draft_tokens=self.draft_tokens, ngram=self.ngram,
                  draft_gate=self.draft_gate, kv_bits=self.kv_bits,
                  prefix_kv=prefix_kv, prefix_len=prefix_len)
        need = self._inplace_need(prefix_len, bucket, budget)
        if prefix_kv is not None and prefix_kv[0][0].shape[1] >= need:
            # in-place chained decode (same flow as the batched path): the
            # cached full-length buffer is donated, the decode writes into
            # it, and the returned caches replace it so the definition
            # query chains off the name query's buffer — 1x peak KV,
            # bit-identical (tests/test_vip_llava.py TestInplaceChained)
            toks, new_kv = self._vl.generate_greedy_donate(
                self.params, jnp.asarray(body), None, self.cfg,
                inplace_prefix=True, return_caches=True, **kw)
            self._prefix_kv_cache = (self._prefix_kv_cache[0], new_kv)
        else:
            # plain path: fresh cache (no prefix) or copy fallback when the
            # decode outgrew the prefilled buffer (its head still holds a
            # valid prefix)
            toks = self._vl.generate_greedy(
                self.params, jnp.asarray(body),
                None if prefix_kv is not None else pixels, self.cfg, **kw)
        return self._decode_row(np.asarray(toks)[0])

    def _prefix_state(self, shared_prefix, image, ids_np, pixels):
        """→ (prefix_len, prefix_kv) from the one-slot cache, or (0, None)
        when the prefix tokenization doesn't prefix-match the full prompt."""
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        key_ids = self._prefix_ids_cache.get(shared_prefix)
        if key_ids is None:
            pre = self.processor(text=shared_prefix,
                                 images=Image.fromarray(image),
                                 return_tensors="np")
            key_ids = tuple(np.asarray(pre["input_ids"])[0].tolist())
            self._prefix_ids_cache[shared_prefix] = key_ids
        lp = len(key_ids)
        if ids_np.shape[1] <= lp or tuple(ids_np[0, :lp].tolist()) != key_ids:
            return 0, None
        cache_key = (key_ids, image.shape, hash(image.tobytes()))
        if self._prefix_kv_cache is not None \
                and self._prefix_kv_cache[0] == cache_key:
            return lp, self._prefix_kv_cache[1]
        # full-decode-length buffer for the in-place chained flow (see
        # generate): suffix bucketed to 128 + the retriever budget headroom
        bucket = ((ids_np.shape[1] - lp + 127) // 128) * 128
        max_len = self._inplace_buffer_len(lp, bucket)
        kv = self._vl.prefill_prefix(
            self.params, jnp.asarray(np.asarray(key_ids)[None]), pixels,
            self.cfg, max_len=max_len, kv_bits=self.kv_bits)
        self._prefix_kv_cache = (cache_key, kv)  # one slot: ~0.7 GB of KV
        return lp, kv

    # Largest device batch per decode: each row holds ~0.68 GB of bf16 KV
    # cache at the production 1280-token bucket, so 8 rows + 7 GB int8
    # weights fill a 16 GB v5e comfortably; larger request lists are
    # chunked.  (B=8 measured 462.8 aggregate tok/s — BASELINE.md.)
    MAX_DECODE_BATCH = 8
    # the shared-prefix batched path holds prefix KV AND decode caches per
    # row (~1.3 GB at the production 1155-position prefix), so it chunks
    # tighter; int8 KV (kv_bits=8) halves the per-row residency, so the
    # cap relaxes to MAX_DECODE_BATCH — a D=6/D=8 text block then runs as
    # ONE B=D decode instead of 4+2 chunks (full weight-stream
    # amortization across the block)
    MAX_PREFIX_BATCH = 4

    def generate_batch(self, images, prompts, max_new_tokens=20,
                       min_new_tokens=0, shared_prefix: str = None):
        """Batched decode over variable-length (image, prompt) pairs.

        The B=1 decode step is MXU-weight-feed/HBM bound (each token streams
        every weight byte for one row of MACs); batching the retriever's
        ensemble and multi-shot name queries amortizes that stream across
        rows — measured 292.7/462.8/835.5 aggregate tok/s at B=4/8/16 on one
        v5e vs 98.7 single-stream (BASELINE.md).  Rows are right-padded to a
        shared 128-bucket with per-row true_length (no recompile across
        episodes); request lists longer than MAX_DECODE_BATCH are chunked to
        bound the KV-cache footprint.

        ``max_new_tokens``/``min_new_tokens`` may be per-row sequences
        (PipelinedTextStage batches a min-20/max-50 definition row with
        min-0/max-20 name rows).  Per-row min rides the decoder's per-row
        EOS floor; per-row max is a host-side truncation of the emitted
        tokens — greedy emission is causal, so row i's first max_i tokens
        are bit-identical to a solo max_i-budget decode.

        ``shared_prefix``: per-row prefix-KV reuse for a batch whose rows
        all start with the same template text (BlockTextStage) — the
        prefix CONTENT differs per row (each row's own drawn image feeds
        the vision tower) but its token LENGTH is constant, so one
        batched ``prefill_prefix`` builds a (B, L_prefix) KV stack and
        the decode runs suffix-only.  The stack is cached by the batch's
        image hashes: the block's definition decode reuses the name
        decode's prefill verbatim (same images, same order).  Rows that
        fail the prefix-tokenization check fall back to the plain
        full-prompt path (exact either way).
        """
        b = len(images)
        maxs = (list(max_new_tokens) if isinstance(max_new_tokens, (list, tuple))
                else [max_new_tokens] * b)
        mins = (list(min_new_tokens) if isinstance(min_new_tokens, (list, tuple))
                else [min_new_tokens] * b)
        if shared_prefix:
            chunk = (self.MAX_DECODE_BATCH if self.kv_bits == 8
                     else self.MAX_PREFIX_BATCH)
        else:
            chunk = self.MAX_DECODE_BATCH
        out = []
        for s in range(0, b, chunk):
            out.extend(self._generate_batch_chunk(
                images[s:s + chunk], prompts[s:s + chunk],
                maxs[s:s + chunk], mins[s:s + chunk],
                shared_prefix=shared_prefix))
        return out

    # in-place buffer decode-budget headroom: covers any retriever budget
    # (name 20, definition 50) plus the speculative verify slack, so the
    # definition pass always fits the buffer its name pass prefilled
    _INPLACE_BUDGET = 64

    def _batch_prefix_state(self, shared_prefix, images, ids, lens, pixels):
        """→ (prefix_len, cache_key, stacked prefix KV) for a batch whose
        rows all prefix-match the shared template, or (0, None, None).

        The KV stack is cached by (prefix ids, image hashes) so a block's
        two decodes (names, then definitions over the SAME drawn images)
        pay one prefill.  The buffer is allocated at FULL decode length
        (prefill_prefix max_len) and the decodes run IN PLACE
        (generate_greedy_donate), chaining name → definition through one
        buffer: peak KV is 1x instead of prefill + per-decode copy.  The
        caller must store the decode's returned caches back under
        cache_key — the donated input is invalid afterwards."""
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        key_ids = self._prefix_ids_cache.get(shared_prefix)
        if key_ids is None:
            pre = self.processor(text=shared_prefix,
                                 images=Image.fromarray(images[0]),
                                 return_tensors="np")
            key_ids = tuple(np.asarray(pre["input_ids"])[0].tolist())
            self._prefix_ids_cache[shared_prefix] = key_ids
        lp = len(key_ids)
        ref = np.asarray(key_ids)
        for row, l in zip(ids, lens):
            if l <= lp or not np.array_equal(row[:lp], ref):
                return 0, None, None
        cache_key = (key_ids,
                     tuple(im.shape for im in images),
                     tuple(hash(im.tobytes()) for im in images))
        # tiny FIFO keyed per CHUNK: a block deeper than MAX_PREFIX_BATCH
        # splits into several chunks, and the definition pass replays the
        # name pass's chunk sequence — a single slot would thrash (every
        # definition chunk re-prefilling what its name chunk just built)
        cache = getattr(self, "_batch_prefix_cache", None)
        if cache is None:
            from collections import OrderedDict

            cache = self._batch_prefix_cache = OrderedDict()
        if cache_key in cache:
            return lp, cache_key, cache[cache_key]
        # free all but the most recent entry BEFORE prefilling: a ≤2-chunk
        # block keeps its name chunks alive for the definition pass, while
        # stale previous-block stacks are dropped ahead of the allocation
        # (bounding device KV at ~2 chunks + the one being built)
        while len(cache) > 1:
            cache.popitem(last=False)
        prefix_ids = jnp.asarray(np.broadcast_to(ref, (len(images), lp)))
        bucket = ((max(l - lp for l in lens) + 127) // 128) * 128
        max_len = self._inplace_buffer_len(lp, bucket)
        kv = self._vl.prefill_prefix(self.params, prefix_ids, pixels,
                                     self.cfg, max_len=max_len,
                                     kv_bits=self.kv_bits)
        cache[cache_key] = kv
        return lp, cache_key, kv

    def _generate_batch_chunk(self, images, prompts, maxs, mins,
                              shared_prefix=None):
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        assert len(images) == len(prompts) and images
        per = [
            self.processor(text=pr, images=Image.fromarray(im),
                           return_tensors="np")
            for im, pr in zip(images, prompts)
        ]
        lens = [np.asarray(i["input_ids"]).shape[1] for i in per]
        rows = [np.asarray(i["input_ids"])[0] for i in per]
        pixels = jnp.asarray(np.concatenate(
            [np.transpose(i["pixel_values"], (0, 2, 3, 1)) for i in per]))

        prefix_len, cache_key, prefix_kv = 0, None, None
        if shared_prefix:
            prefix_len, cache_key, prefix_kv = self._batch_prefix_state(
                shared_prefix, images, rows, lens, pixels)
        if prefix_kv is not None:
            rows = [r[prefix_len:] for r in rows]
            lens = [l - prefix_len for l in lens]
            pixels = None  # suffixes are text-only (image slots prefilled)

        bucket = ((max(lens) + 127) // 128) * 128
        ids = np.stack([np.pad(r, (0, bucket - l))
                        for r, l in zip(rows, lens)])
        # a homogeneous min stays a scalar static arg (one compile serves
        # every batch size / composition); mixed floors pass per-row
        mn = mins[0] if len(set(mins)) == 1 else tuple(mins)
        budget = max(max(maxs), max(mins))
        kw = dict(max_new_tokens=budget,
                  true_length=jnp.asarray(lens, jnp.int32),
                  eos_id=self._eos_id(), min_new_tokens=mn,
                  draft_tokens=self.draft_tokens, ngram=self.ngram,
                  draft_gate=self.draft_gate, kv_bits=self.kv_bits,
                  prefix_kv=prefix_kv, prefix_len=prefix_len)
        need = self._inplace_need(prefix_len, bucket, budget)
        # batch x speculation compose: per-row prompt-lookup drafts ride the
        # same (B, K+1)-position verify forward (_speculative_greedy_batched)
        if prefix_kv is not None and prefix_kv[0][0].shape[1] >= need:
            # in-place chained decode: this call consumes (donates) the
            # buffer and the returned caches replace it in the cache, so
            # the definition pass chains off the name pass's buffer —
            # bit-identical to the copy path (tests/test_vip_llava.py
            # TestInplaceChained), at HALF the peak KV
            toks, new_kv = self._vl.generate_greedy_donate(
                self.params, jnp.asarray(ids), pixels, self.cfg,
                inplace_prefix=True, return_caches=True, **kw)
            self._batch_prefix_cache[cache_key] = new_kv
        else:
            # plain copy path (also the fallback when a decode outgrows
            # the prefilled buffer; the oversized buffer's head still
            # serves as a valid prefix source)
            toks = self._vl.generate_greedy(
                self.params, jnp.asarray(ids), pixels, self.cfg, **kw)
        toks = np.asarray(toks)
        return [self._decode_row(toks[i][:mx])
                for i, mx in enumerate(maxs)]


@dataclass(frozen=True)
class PromptGenConfig:
    prompt_type: str = "contour"  # scripts/coco_1shot.sh
    color: str = "red"
    alpha: float = 0.5
    thickness: int = 2
    zoom_percent: int = 50


@dataclass(frozen=True)
class EnsembleConfig:
    """Which prompt dimensions to ensemble over (reference EnsambleConfig
    :383-444 — 6 modes over prompt-type x color x zoom)."""

    colors: Tuple[str, ...] = ()
    zooms: Tuple[int, ...] = ()
    prompt_types: Tuple[str, ...] = ()

    @property
    def active(self) -> bool:
        return bool(self.colors or self.zooms or self.prompt_types)

    def variants(self, base: PromptGenConfig):
        colors = self.colors or (base.color,)
        zooms = self.zooms or (base.zoom_percent,)
        types = self.prompt_types or (base.prompt_type,)
        for t in types:
            for c in colors:
                for z in zooms:
                    yield PromptGenConfig(
                        prompt_type=t, color=c, alpha=base.alpha,
                        thickness=base.thickness, zoom_percent=z,
                    )


class TextRetriever:
    def __init__(self, vlm: VLM, gen_cfg: PromptGenConfig = PromptGenConfig(),
                 ensemble: EnsembleConfig = EnsembleConfig()):
        self.vlm = vlm
        self.gen_cfg = gen_cfg
        self.ensemble = ensemble

    def _name_request(self, image_np, mask_np, cfg: PromptGenConfig):
        drawn = GENERATORS[cfg.prompt_type](
            image_np, mask_np, color=COLORS[cfg.color], alpha=cfg.alpha,
            thickness=cfg.thickness, zoom_percent=cfg.zoom_percent,
        )
        prompt = VLM_SYSTEM_TEMPLATE.format(VISUAL_PROMPTS[cfg.prompt_type].format(cfg.color))
        return drawn, prompt

    def _name_requests(self, support_images, support_masks):
        """All shots x variants as one request list of (shot_idx, drawn,
        prompt); batch-capable VLMs (JaxVipLlava.generate_batch) answer
        them in ONE decode — the per-shot inner vote + outer vote semantics
        (reference TextRetrieverModule.py:42-99) apply to the answers."""
        variants = (list(self.ensemble.variants(self.gen_cfg))
                    if self.ensemble.active else [self.gen_cfg])
        return [
            (si, *self._name_request(img, mask, cfg))
            for si, (img, mask) in enumerate(zip(support_images, support_masks))
            for cfg in variants
        ]

    def _vote(self, requests, answers, n_shots: int) -> str:
        """Inner per-shot majority vote, then outer vote across shots."""
        names: List[str] = []
        for si in range(n_shots):
            votes = [a for (s, _, _), a in zip(requests, answers) if s == si]
            names.append(max(Counter(votes), key=Counter(votes).get))
        counts = Counter(names)
        return max(counts, key=counts.get)

    def _definition_request(self, support_images, support_masks, name: str):
        """→ (drawn, prompt) for the definition query on the LAST support
        shot (reference :103-122 uses the loop-final support image)."""
        img, mask = support_images[-1], support_masks[-1]
        cfg = self.gen_cfg
        drawn = GENERATORS[cfg.prompt_type](
            img, mask, color=COLORS[cfg.color], alpha=cfg.alpha,
            thickness=cfg.thickness, zoom_percent=cfg.zoom_percent,
        )
        dprompt = VLM_SYSTEM_TEMPLATE.format(
            VISUAL_PROMPTS_DESCRIPTIONS[cfg.prompt_type].format(name, cfg.color, name, name)
        )
        return drawn, dprompt

    def _prefix_kw(self):
        # prefix KV reuse: name + definition queries share the template up
        # to the question AND (for the last shot's base-config request) the
        # drawn image — the VLM prefills "Human: <image>\n" once
        # (reference helpers/prompts.py:23; TextRetrieverModule.py:103-122)
        if getattr(self.vlm, "supports_shared_prefix", False):
            return {"shared_prefix": VLM_SYSTEM_TEMPLATE.split("{}")[0]}
        return {}

    @staticmethod
    def _finish(name: str, description: str) -> Tuple[str, str]:
        """WordNet resolution of the voted name against the VLM
        description → (name, synset definition or '')."""
        synset = get_synset(name, description)
        if synset is not None:
            from nltk.corpus import wordnet as wn

            return name, wn.synset(synset).definition()
        return name, ""

    def get_conceptual_information(
        self,
        support_images: Sequence[np.ndarray],  # (H, W, 3) uint8 per shot
        support_masks: Sequence[np.ndarray],  # (H, W) per shot
    ) -> Tuple[str, str]:
        """→ (class name, WordNet definition or '')."""
        requests = self._name_requests(support_images, support_masks)
        prefix_kw = self._prefix_kw()
        if len(requests) > 1 and hasattr(self.vlm, "generate_batch"):
            answers = self.vlm.generate_batch(
                [r[1] for r in requests], [r[2] for r in requests],
                max_new_tokens=20)
        else:
            answers = [self.vlm.generate(d, p, max_new_tokens=20, **prefix_kw)
                       for _, d, p in requests]
        name = self._vote(requests, answers, len(support_images))

        drawn, dprompt = self._definition_request(
            support_images, support_masks, name)
        description = self.vlm.generate(drawn, dprompt, max_new_tokens=50,
                                        min_new_tokens=20, **prefix_kw)
        return self._finish(name, description)


class PipelinedTextStage:
    """Cross-episode text batching: one decode per episode instead of two.

    The per-episode text stage is two SEQUENTIAL decodes — the definition
    prompt consumes the voted name, so they cannot batch WITHIN an episode
    (reference TextRetrieverModule.py:42-122 runs them back to back).  But
    episode N's definition is independent of episode N+1's name queries, so
    with a one-episode lookahead both ride ONE batched decode: the weight
    stream (the B=1 bottleneck, ~10 ms/token for the int8 7B) is amortized
    across the definition row and the next episode's name rows, composing
    with per-row prompt-lookup speculation (_speculative_greedy_batched).

    Protocol::

        stage = PipelinedTextStage(retriever)
        done_prev = stage.step(images_N, masks_N)   # None on the first call
        ...
        done_last = stage.flush()                   # after the final episode

    ``step`` returns the completed (name, wn_description) for the episode
    pushed by the PREVIOUS step.  Per-row greedy decode is row-exact
    (bucketed-decode tests), so the sequence of results is identical to the
    serial retriever's; a fresh stage after --resume recomputes the
    lookahead episode's name deterministically.
    """

    def __init__(self, retriever: TextRetriever):
        self.r = retriever
        self._pending = None  # (name, drawn, dprompt) awaiting definition

    def step(self, support_images, support_masks) -> Optional[Tuple[str, str]]:
        r = self.r
        requests = r._name_requests(support_images, support_masks)
        images = [d for _, d, _ in requests]
        prompts = [p for _, _, p in requests]
        maxs = [20] * len(images)
        mins = [0] * len(images)
        if self._pending is not None:
            name_prev, drawn_d, dprompt = self._pending
            images = [drawn_d] + images
            prompts = [dprompt] + prompts
            maxs = [50] + maxs
            mins = [20] + mins
        answers = self._generate(images, prompts, maxs, mins)
        done = None
        if self._pending is not None:
            done = r._finish(name_prev, answers[0])
            answers = answers[1:]
        name = r._vote(requests, answers, len(support_images))
        self._pending = (name,) + r._definition_request(
            support_images, support_masks, name)
        return done

    def flush(self) -> Optional[Tuple[str, str]]:
        """Run the final pending definition (no next episode to pair it
        with) → (name, wn_description), or None if nothing is pending."""
        if self._pending is None:
            return None
        name, drawn, dprompt = self._pending
        self._pending = None
        answer = self._generate([drawn], [dprompt], [50], [20])[0]
        return self.r._finish(name, answer)

    def _generate(self, images, prompts, maxs, mins):
        vlm = self.r.vlm
        if len(images) > 1 and hasattr(vlm, "generate_batch"):
            return vlm.generate_batch(images, prompts, max_new_tokens=maxs,
                                      min_new_tokens=mins)
        prefix_kw = self.r._prefix_kw()
        return [vlm.generate(im, pr, max_new_tokens=mx, min_new_tokens=mn,
                             **prefix_kw)
                for im, pr, mx, mn in zip(images, prompts, maxs, mins)]


class BlockTextStage:
    """D-episode block text batching: the deepest text-stage lever.

    PipelinedTextStage only overlaps one definition with the next
    episode's names (B=2 → ~10% over serial).  Decode steps are
    weight-stream-bound (~10 ms/token for the int8 7B at B=1, but
    292.7/462.8 aggregate tok/s at B=4/8 — BASELINE.md), so batching
    D whole episodes amortizes the stream D-fold on EVERY round:

      1. one batched decode answers ALL D episodes' name queries
         (shots × ensemble variants rows, 20 new tokens each)
      2. per-episode majority vote (host, reference
         TextRetrieverModule.py:96-99)
      3. one batched decode answers the D definition queries
         (50 new tokens, min 20)

    Name and definition queries of an episode draw the SAME support image
    with the same config, so with a batch-prefix-capable VLM
    (JaxVipLlava.generate_batch shared_prefix) one batched prefill per
    block serves both decodes via per-row prefix KV.

    Per-row greedy decode is row-exact (bucketed-decode tests), so the
    result sequence is identical to the serial retriever's; the episode
    loop just consumes results up to D-1 episodes late.

    Protocol::

        stage = BlockTextStage(retriever, depth=4)
        results = stage.step(images, masks)   # [] until a block fills,
                                              # then D (name, desc) tuples
        ...
        results = stage.flush()               # the final partial block
    """

    def __init__(self, retriever: TextRetriever, depth: int = 4):
        assert depth >= 1
        self.r = retriever
        self.depth = depth
        self._buf: list = []  # (support_images, support_masks) per episode

    def step(self, support_images, support_masks) -> List[Tuple[str, str]]:
        self._buf.append((support_images, support_masks))
        return self._run_block() if len(self._buf) >= self.depth else []

    def flush(self) -> List[Tuple[str, str]]:
        return self._run_block() if self._buf else []

    def _prefix_kw(self):
        # batched prefix KV needs the batch-capable JAX VLM; other
        # backends run the same protocol with full prompts
        vlm = self.r.vlm
        if getattr(vlm, "supports_shared_prefix", False) \
                and hasattr(vlm, "generate_batch"):
            return {"shared_prefix": VLM_SYSTEM_TEMPLATE.split("{}")[0]}
        return {}

    def _generate(self, images, prompts, maxs, mins):
        vlm = self.r.vlm
        kw = self._prefix_kw()
        if hasattr(vlm, "generate_batch"):
            return vlm.generate_batch(images, prompts, max_new_tokens=maxs,
                                      min_new_tokens=mins, **kw)
        return [vlm.generate(im, pr, max_new_tokens=mx, min_new_tokens=mn)
                for im, pr, mx, mn in zip(images, prompts, maxs, mins)]

    def _run_block(self) -> List[Tuple[str, str]]:
        r = self.r
        episodes, self._buf = self._buf, []
        spans, reqs = [], []
        for imgs, masks in episodes:
            ep_reqs = r._name_requests(imgs, masks)
            spans.append((len(reqs), len(ep_reqs), len(imgs)))
            reqs.extend(ep_reqs)
        answers = self._generate([q[1] for q in reqs], [q[2] for q in reqs],
                                 [20] * len(reqs), [0] * len(reqs))
        names, d_imgs, d_prompts = [], [], []
        for (start, cnt, n_shots), (imgs, masks) in zip(spans, episodes):
            name = r._vote(reqs[start:start + cnt],
                           answers[start:start + cnt], n_shots)
            names.append(name)
            drawn, dprompt = r._definition_request(imgs, masks, name)
            d_imgs.append(drawn)
            d_prompts.append(dprompt)
        defs = self._generate(d_imgs, d_prompts, [50] * len(names),
                              [20] * len(names))
        return [r._finish(n, d) for n, d in zip(names, defs)]


def get_synset(class_name: str, vlm_description: str) -> Optional[str]:
    """WordNet synset resolution (reference _get_synset :139-185)."""
    from nltk.corpus import stopwords, wordnet as wn
    from nltk.tokenize import word_tokenize

    lower = class_name.strip().lower()
    stop = set(stopwords.words("english"))
    synsets = list(wn.synsets(lower.replace(" ", "_"), pos=wn.NOUN))
    if not synsets:
        synsets = list(wn.synsets(lower.replace(" ", ""), pos=wn.NOUN))
    if not synsets:
        for word in lower.split():
            synsets += wn.synsets(word.strip(), pos=wn.NOUN)
    if not synsets:
        return None
    if len(synsets) == 1:
        return synsets[0].name()
    desc_tokens = set(word_tokenize(vlm_description.lower())) - stop
    best, best_overlap = None, 0
    for s in synsets:
        def_tokens = set(word_tokenize(s.definition().lower())) - stop
        overlap = len(desc_tokens & def_tokens)
        if overlap > best_overlap:
            best_overlap = overlap
            best = s
    return best.name() if best else None
