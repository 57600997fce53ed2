"""ViP-LLaVA (vision-language model) in pure-function JAX.

The reference queries ViP-LLaVA-7B through HF transformers on a second GPU
(reference: mars/components/TextRetrieverModule.py:446-490) for class names
and definitions.  This is the TPU-native port of the same architecture
(mirroring ``VipLlavaForConditionalGeneration``):

  - HF-CLIP vision tower (pre-layernorm dialect: separate q/k/v/out
    projections, position-id embedding table, quick-gelu MLP) with
    per-layer hidden-state taps
  - ViP-LLaVA feature selection: hidden states of ``vision_feature_layers``
    with CLS dropped, concatenated over channels, then the
    LayerNorm → Linear → GELU → Linear projector
  - LLaMA decoder: RMSNorm, rotary position embeddings (half-rotation),
    grouped-query attention, SwiGLU MLP, causal mask
  - fixed-shape greedy decoding with a KV cache driven by ``lax.scan``

Weights convert from the HF checkpoint (``convert_hf``); parity is tested
against transformers on a tiny random-weight config.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.models import layers as L


@dataclass(frozen=True)
class VipLlavaConfig:
    # vision (CLIP-L/14@336 for the real model)
    v_hidden: int = 1024
    v_intermediate: int = 4096
    v_layers: int = 24
    v_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    vision_feature_layers: Tuple[int, ...] = (-2, -5, -8, -11, 6)
    # text (LLaMA-7B)
    hidden: int = 4096
    intermediate: int = 11008
    layers: int = 32
    heads: int = 32
    kv_heads: int = 32
    vocab: int = 32064
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    image_token_index: int = 32000


TINY = VipLlavaConfig(
    v_hidden=32, v_intermediate=64, v_layers=4, v_heads=2, image_size=56,
    patch_size=14, vision_feature_layers=(-2, -4),
    hidden=32, intermediate=64, layers=2, heads=4, kv_heads=2, vocab=128,
    image_token_index=100,
)


# --------------------------------------------------------------------------
# vision tower (HF CLIP dialect)
# --------------------------------------------------------------------------

def vision_hidden_states(p, pixel_values, cfg: VipLlavaConfig):
    """(B, H, W, 3) → list of (B, 1+P, D) hidden states (len = layers + 1:
    the embeddings output followed by each encoder layer's output)."""
    b = pixel_values.shape[0]
    x = L.conv_patch_embed(p["patch_embed"], pixel_values, cfg.patch_size)
    cls = jnp.broadcast_to(p["class_embedding"], (b, 1, cfg.v_hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"][None]
    x = L.layer_norm(p["pre_layernorm"], x)  # hidden_states[0]
    states = [x]
    for i in range(cfg.v_layers):
        lp = p[f"layer{i}"]
        h = L.layer_norm(lp["ln1"], x)
        h, _ = _hf_attn(lp["attn"], h, cfg.v_heads)
        x = x + h
        h = L.layer_norm(lp["ln2"], x)
        h = L.dense(lp["mlp"]["fc2"], L.quick_gelu(L.dense(lp["mlp"]["fc1"], h)))
        x = x + h
        states.append(x)
    return states


def _hf_attn(p, x, num_heads, mask=None):
    b, l, d = x.shape
    hd = d // num_heads
    q = L.dense(p["q"], x).reshape(b, l, num_heads, hd)
    k = L.dense(p["k"], x).reshape(b, l, num_heads, hd)
    v = L.dense(p["v"], x).reshape(b, l, num_heads, hd)
    logits = jnp.einsum("blhd,bmhd->bhlm", q * (hd ** -0.5), k)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
    return L.dense(p["out"], out), probs


def image_features(p, pixel_values, cfg: VipLlavaConfig):
    """ViP-LLaVA multi-layer feature selection + projector
    (VipLlavaModel.get_image_features + VipLlavaMultiModalProjector)."""
    states = vision_hidden_states(p["vision"], pixel_values, cfg)
    feats = jnp.concatenate(
        [states[i][:, 1:] for i in cfg.vision_feature_layers], axis=-1
    )
    mp = p["projector"]
    h = L.layer_norm(mp["ln"], feats)
    h = L.dense(mp["linear_1"], h)
    h = jax.nn.gelu(h, approximate=False)
    return L.dense(mp["linear_2"], h)


# --------------------------------------------------------------------------
# LLaMA decoder
# --------------------------------------------------------------------------

def _rms_norm(w, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    # normalize and scale in f32, return in the tower dtype (a f32 ``w``
    # must not promote bf16 activations)
    return ((xf * jax.lax.rsqrt(var + eps)) * w).astype(x.dtype)


def _rope(x, positions, theta):
    """HF half-rotation RoPE: x (B, L, H, hd), positions (B, L)."""
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = positions[..., None].astype(jnp.float32) * inv  # (B, L, hd/2)
    cos = jnp.cos(ang)[..., None, :]
    sin = jnp.sin(ang)[..., None, :]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _kv_quant(x):
    """Per-token per-head symmetric int8: (B, L, KVH, hd) → int8 values +
    (B, L, KVH, 1) f32 dequant scales (amax/127 over the head dim).  The
    trailing singleton keeps the scale buffer 4-D so every cache-write
    indexing expression applies to values and scales identically."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    q = jnp.round(xf * (127.0 / s)).astype(jnp.int8)
    return q, (s * (1.0 / 127.0))


def _llama_attention(p, x, positions, cfg, kv_cache=None, cache_pos=None):
    """Self-attention with RoPE + GQA.  With kv_cache=(K, V) of shape
    (B, MAX, KVH, hd) the new keys/values are written at cache_pos and
    attention runs over the cache (masked beyond current length).

    A 4-tuple kv_cache=(K_i8, V_i8, k_scale, v_scale) is the int8-quantized
    cache (prefill_prefix/generate kv_bits=8): K/V quantize per token+head
    at write and dequantize into the attention read — the dequant fuses
    into the einsum's input stream, so cache HBM residency AND traffic
    halve (the reference's own answer to VLM memory pressure is
    quantization, TextRetrieverModule.py:468-477; bf16 KV at the D=6 text
    block held ~3.9 GB resident and degraded the co-resident towers)."""
    b, l, d = x.shape
    hd = d // cfg.heads
    q = L.dense(p["q"], x).reshape(b, l, cfg.heads, hd)
    k = L.dense(p["k"], x).reshape(b, l, cfg.kv_heads, hd)
    v = L.dense(p["v"], x).reshape(b, l, cfg.kv_heads, hd)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)

    if kv_cache is None:
        keys, values = k, v
        kv_positions = positions
    else:
        quant = len(kv_cache) == 4
        if quant:
            kq, ks = _kv_quant(k)
            vq, vs = _kv_quant(v)
            writes = list(zip(kv_cache, (kq, vq, ks, vs)))
        else:
            ck, cv = kv_cache
            writes = [(ck, k.astype(ck.dtype)), (cv, v.astype(cv.dtype))]
        if getattr(cache_pos, "ndim", 0) == 1:
            # per-row write position (batched decode of variable-length
            # prompts: l == 1 plain steps, l == K+1 batched speculative
            # verify chunks): scatter touches only the written slots — a
            # mask/where formulation would rewrite the whole multi-GB
            # cache every step
            rows = jnp.arange(writes[0][0].shape[0])[:, None]
            cols = cache_pos[:, None] + jnp.arange(l)[None]
            kv_cache = tuple(buf.at[rows, cols].set(new.astype(buf.dtype))
                             for buf, new in writes)
        else:
            kv_cache = tuple(
                jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                             (0, cache_pos, 0, 0))
                for buf, new in writes)
        if quant:
            keys = (kv_cache[0] * kv_cache[2]).astype(x.dtype)
            values = (kv_cache[1] * kv_cache[3]).astype(x.dtype)
        else:
            keys, values = kv_cache
        kv_positions = jnp.arange(keys.shape[1])[None]

    rep = cfg.heads // cfg.kv_heads
    if rep > 1:
        keys_r = jnp.repeat(keys, rep, axis=2)
        values_r = jnp.repeat(values, rep, axis=2)
    else:
        keys_r, values_r = keys, values

    logits = jnp.einsum("blhd,bmhd->bhlm", q * (hd ** -0.5), keys_r)
    # causal over absolute positions
    qpos = positions[:, None, :, None]
    kpos = kv_positions[:, None, None, :]
    valid = kpos <= qpos
    if kv_cache is not None:
        cp = cache_pos
        if getattr(cp, "ndim", 0) == 1:
            cp = cp.reshape(-1, 1, 1, 1)
        valid = valid & (kpos <= (cp + l - 1))
    logits = jnp.where(valid, logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, values_r).reshape(b, l, d)
    return L.dense(p["o"], out), kv_cache


def _llama_layer(p, x, positions, cfg, kv_cache=None, cache_pos=None):
    h = _rms_norm(p["input_ln"], x, cfg.rms_eps)
    h, kv_cache = _llama_attention(p["attn"], h, positions, cfg, kv_cache, cache_pos)
    x = x + h
    h = _rms_norm(p["post_ln"], x, cfg.rms_eps)
    gate = jax.nn.silu(L.dense(p["mlp"]["gate"], h))
    up = L.dense(p["mlp"]["up"], h)
    x = x + L.dense(p["mlp"]["down"], gate * up)
    return x, kv_cache


def llama_forward(p, embeds, positions, cfg, kv_caches=None, cache_pos=None):
    """embeds (B, L, D) → (logits (B, L, V), new kv_caches)."""
    x = embeds
    new_caches = []
    for i in range(cfg.layers):
        cache = None if kv_caches is None else kv_caches[i]
        x, cache = _llama_layer(p[f"layer{i}"], x, positions, cfg, cache, cache_pos)
        new_caches.append(cache)
    x = _rms_norm(p["norm"], x, cfg.rms_eps)
    lm = p["lm_head"]
    if isinstance(lm, dict):  # weight-only quantized head
        logits = L.dense({"kernel": lm}, x)
    else:
        logits = x @ lm
    return logits, (new_caches if kv_caches is not None else None)


# --------------------------------------------------------------------------
# multimodal assembly + greedy decoding
# --------------------------------------------------------------------------

def embed_multimodal(p, input_ids, pixel_values, cfg: VipLlavaConfig):
    """Token embeddings with image-token slots replaced by projected image
    features (VipLlavaModel.forward's merge).  input_ids must contain
    exactly (image_size/patch)² image tokens per image."""
    embeds = p["language"]["embed_tokens"][input_ids]
    feats = image_features(p, pixel_values, cfg)  # (B, P, D)
    b, l, d = embeds.shape
    is_img = input_ids == cfg.image_token_index  # (B, L)
    # scatter: for each position, its image-slot ordinal
    ordinal = jnp.cumsum(is_img, axis=1) - 1
    gathered = jnp.take_along_axis(
        feats, jnp.clip(ordinal, 0, feats.shape[1] - 1)[..., None], axis=1
    )
    return jnp.where(is_img[..., None], gathered.astype(embeds.dtype), embeds)


def _alloc_cache(b, length, cfg, dtype, kv_bits=None):
    """One layer's zeroed KV cache: (K, V) at ``dtype``, or the int8
    4-tuple (K_i8, V_i8, k_scale, v_scale) when kv_bits == 8 (see
    _llama_attention; zero scales at unwritten positions are inert — the
    causal mask excludes those slots until they are written)."""
    hd = cfg.hidden // cfg.heads
    shape = (b, length, cfg.kv_heads, hd)
    if kv_bits == 8:
        sshape = (b, length, cfg.kv_heads, 1)
        return (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32))
    if kv_bits not in (None, 16):
        raise ValueError(f"kv_bits must be None/16/8, got {kv_bits}")
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


@partial(jax.jit, static_argnames=("cfg", "max_len", "kv_bits"))
def prefill_prefix(p, prefix_ids, pixel_values, cfg: VipLlavaConfig,
                   max_len: int = 0, kv_bits: int = None):
    """KV caches for a shared multimodal prompt PREFIX, exact length.

    The retriever's name and definition queries share everything up to the
    question ("Human: <image>\\n…" — reference
    mars/components/helpers/prompts.py:23 and
    TextRetrieverModule.py:103-122 reuse the same drawn image), so the
    vision tower + ~580 prefix positions can be prefilled once and reused:
    pass the result to ``generate_greedy(prefix_kv=…, prefix_len=…)`` with
    suffix-only input_ids.  Exact — the prefix KV entries are identical to
    a full-prompt prefill (RoPE runs at the same absolute positions).

    ``max_len`` (static, > prefix length): allocate the caches at the
    FULL decode length up front and write the prefix into their head —
    the in-place decode flow (``generate_greedy_donate(prefix_kv=…,
    inplace_prefix=True)``) then runs the whole name→definition chain in
    this ONE buffer instead of copying the prefix into a fresh
    decode-sized cache per query (the copy doubled peak KV memory:
    ~655 MB/row at the production 7B prompt geometry, the D=6 text-block
    OOM)."""
    b, lp = prefix_ids.shape
    embeds = embed_multimodal(p, prefix_ids, pixel_values, cfg)
    positions = jnp.broadcast_to(jnp.arange(lp)[None], (b, lp))
    hd = cfg.hidden // cfg.heads
    if max_len and max_len < lp:
        raise ValueError(f"max_len {max_len} < prefix length {lp}")
    L = max_len or lp
    caches = [_alloc_cache(b, L, cfg, embeds.dtype, kv_bits)
              for _ in range(cfg.layers)]
    _, caches = llama_forward(p["language"], embeds, positions, cfg,
                              caches, 0)
    return caches


def _generate_greedy_impl(p, input_ids, pixel_values, cfg: VipLlavaConfig,
                          max_new_tokens: int = 20, true_length=None,
                          eos_id: int = None, min_new_tokens: int = 0,
                          draft_tokens: int = 0, ngram: int = 3,
                          draft_gate: int = 2,
                          prefix_kv=None, prefix_len: int = 0,
                          inplace_prefix: bool = False,
                          return_caches: bool = False,
                          kv_bits: int = None):
    """Greedy decode (the reference uses greedy generate with
    max_new_tokens=20/50, TextRetrieverModule.py:76,118).

    input_ids: (B, L) prompt with image tokens; returns (B, max_new_tokens).

    ``true_length`` (scalar or (B,) int array): the real prompt length(s)
    when input_ids is right-padded to a fixed bucket — the jit then compiles
    once per BUCKET, not per prompt length (every real episode has its own
    length; without bucketing each one pays a full recompile).  Stale pad
    slots in the KV cache sit at positions > the current query position,
    so the causal mask already excludes them — and decoded tokens overwrite
    them progressively, so a pad slot is only ever attended after it has
    been replaced by a real token.  A (B,) true_length batches
    variable-length prompts in one decode (the retriever's ensemble /
    multi-shot path): per-row start positions, per-row KV writes.

    ``eos_id``: HF ``generate`` semantics (the reference's decode loop) —
    a row that emits EOS is frozen (its remaining slots filled with EOS),
    and the whole decode EXITS once every row is done, via a
    ``lax.while_loop`` with a dynamic trip count (shapes stay static; at
    ~10 ms/token of weight streaming on the 7B, a 3-token class name
    inside a 20-token budget is a 6× stage saving).  ``min_new_tokens``
    masks the EOS logit for the first N emitted tokens (HF's
    MinNewTokensLengthLogitsProcessor — the reference's definition query
    uses min_new_tokens=20, TextRetrieverModule.py:118); a per-row tuple
    applies a different floor per row (the pipelined text stage batches a
    min-20 definition row with min-0 name rows).  ``eos_id=None``
    keeps the fixed-trip ``lax.scan`` (benchmarks; bit-identical to the
    parity fixtures).

    ``draft_tokens=K > 0`` switches to prompt-lookup speculative
    decoding — EXACT greedy (the output is bit-identical to the plain
    paths; tested) but potentially several-fold faster: each loop
    iteration drafts K continuation tokens per row by matching the
    trailing ``ngram`` of the sequence against its own earlier content
    (prompt + generated so far) and verifies them in ONE forward of K+1
    positions.  Decode steps are weight-streaming-bound (~10 ms for the
    int8 7B at B=1: every weight byte is read per step), so the
    K+1-token verify costs the same HBM traffic as a 1-token step —
    every accepted draft is a token at zero marginal cost.  Definitions
    restate the class name and the prompt's own phrasing (the
    reference's definition query, TextRetrieverModule.py:101-122), which
    is exactly what n-gram lookup drafts well; a worst-case prompt with
    zero matches just degrades to one emitted token per verify (no
    slower than the plain loop).  B > 1 composes speculation with the
    batch (_speculative_greedy_batched): per-row acceptance, per-row
    cache-chunk scatters — the ensemble/multi-shot name queries get both
    levers at once.

    ``prefix_kv`` + ``prefix_len``: resume from a shared-prefix prefill
    (see ``prefill_prefix``).  input_ids is then the SUFFIX only
    (text-only — the vision tower is skipped; pixel_values may be None),
    ``true_length`` counts suffix tokens, and the prefix KV is copied
    into the decode cache at positions [0, prefix_len).  Bit-identical to
    a full-prompt call on every decode path (tested).
    """
    b, l0 = input_ids.shape
    if prefix_kv is not None:
        # text-only suffix: token embeddings, no multimodal merge
        embeds = p["language"]["embed_tokens"][input_ids]
    else:
        embeds = embed_multimodal(p, input_ids, pixel_values, cfg)
    positions = jnp.broadcast_to(
        prefix_len + jnp.arange(l0)[None], (b, l0))

    # speculative verify writes K+1 cache rows at positions up to
    # start+i+K; give the cache that headroom so no write ever clamps
    max_len = (prefix_len + l0 + max_new_tokens
               + (draft_tokens + 1 if draft_tokens else 0))
    hd = cfg.hidden // cfg.heads
    if inplace_prefix:
        # the caller prefilled a FULL-decode-length buffer
        # (prefill_prefix(max_len=…)) and this decode writes into it
        # directly — no decode-sized copy, so peak KV memory is ONE
        # buffer.  Pair with generate_greedy_donate so XLA aliases the
        # input buffer instead of copying it.  Chaining is exact: a
        # later query's suffix forward rewrites the suffix positions with
        # identical KV, and positions past its own progress hold stale
        # values that are always rewritten before they are attended (the
        # same argument that makes right-pad bucketing exact).
        if prefix_kv is None:
            raise ValueError("inplace_prefix needs prefix_kv")
        if prefix_kv[0][0].shape[1] < max_len:
            raise ValueError(
                f"inplace prefix_kv length {prefix_kv[0][0].shape[1]} < "
                f"required {max_len} (prefill with max_len>=this)")
        caches = prefix_kv
    else:
        # the prefix's format wins over kv_bits (the leafwise copy below
        # must be structure- and scale-preserving: casting bf16 values
        # into an int8 buffer without quantizing would silently corrupt)
        bits = ((8 if len(prefix_kv[0]) == 4 else None)
                if prefix_kv is not None else kv_bits)
        caches = [_alloc_cache(b, max_len, cfg, embeds.dtype, bits)
                  for _ in range(cfg.layers)]
        if prefix_kv is not None:
            # slice: prefix_kv may be an oversized in-place buffer whose
            # head holds the prefix (the copy-path fallback for a decode
            # that outgrew its buffer)
            caches = [
                tuple(buf.at[:, :prefix_len].set(
                    pbuf[:, :prefix_len].astype(buf.dtype))
                    for buf, pbuf in zip(cache, pcache))
                for cache, pcache in zip(caches, prefix_kv)
            ]
    logits, caches = llama_forward(p["language"], embeds, positions, cfg,
                                   caches, prefix_len)
    per_row = getattr(true_length, "ndim", 0) == 1

    # min_new_tokens: an int, or a per-row tuple (the pipelined text stage
    # batches a definition row needing min 20 with name rows needing 0 —
    # a scalar min would force EOS suppression on the name rows and change
    # their answers).  Tuples are static (hashable): one compile per
    # min-pattern, which is fixed per retriever configuration.
    min_any = (max(min_new_tokens) if isinstance(min_new_tokens, tuple)
               else min_new_tokens) > 0
    min_arr = jnp.asarray(min_new_tokens, jnp.int32)  # () or (B,)

    def pick_next(last, emit_idx):
        # last: (B, V) logits for the position about to be emitted at slot
        # ``emit_idx``.  Static-bounds EOS mask for min_new_tokens (HF's
        # MinNewTokensLengthLogitsProcessor).
        if eos_id is not None and min_any:
            masked = last.at[:, eos_id].set(-jnp.inf)
            low = jnp.broadcast_to(jnp.asarray(emit_idx) < min_arr,
                                   (last.shape[0],))
            last = jnp.where(low[:, None], masked, last)
        return jnp.argmax(last, axis=-1)

    # start: ABSOLUTE cache position of the first generated token
    # (true_length counts SUFFIX tokens when a prefix is given)
    if true_length is None:
        next_tok = pick_next(logits[:, -1], 0)
        start = prefix_len + l0
    elif per_row:
        tl = jnp.asarray(true_length, jnp.int32)  # (B,)
        last = jnp.take_along_axis(logits, (tl - 1)[:, None, None], axis=1)
        next_tok = pick_next(last[:, 0], 0)
        start = prefix_len + tl
    else:
        last = jax.lax.dynamic_index_in_dim(
            logits, jnp.asarray(true_length, jnp.int32) - 1, axis=1,
            keepdims=False)
        next_tok = pick_next(last, 0)
        start = prefix_len + jnp.asarray(true_length, jnp.int32)

    if draft_tokens > 0:
        # the n-gram lookup buffer holds only the (suffix) input_ids, so it
        # indexes at buffer-relative positions; cache writes stay absolute
        if b == 1:
            start_s = start[0] if per_row else jnp.asarray(start, jnp.int32)
            mnt = (min_new_tokens[0] if isinstance(min_new_tokens, tuple)
                   else min_new_tokens)
            out, _, caches = _speculative_greedy(
                p, cfg, input_ids, caches, next_tok,
                jnp.asarray(start_s) - prefix_len,
                max_new_tokens, eos_id, mnt, draft_tokens, ngram,
                cache_offset=prefix_len, gate=draft_gate)
            return (out, caches) if return_caches else out
        start_b = (start if per_row
                   else jnp.broadcast_to(jnp.asarray(start, jnp.int32), (b,)))
        out, _, caches = _speculative_greedy_batched(
            p, cfg, input_ids, caches, next_tok,
            jnp.asarray(start_b, jnp.int32) - prefix_len,
            max_new_tokens, eos_id, min_new_tokens, draft_tokens, ngram,
            cache_offset=prefix_len, gate=draft_gate)
        return (out, caches) if return_caches else out

    def advance(tok, caches, i):
        """One cached decode step: emit slot i+1's token from slot i's."""
        pos = start + i  # (B,) when per_row else scalar
        emb = p["language"]["embed_tokens"][tok][:, None]
        positions = pos[:, None] if per_row else jnp.broadcast_to(pos, (b, 1))
        logits, caches = llama_forward(p["language"], emb, positions, cfg,
                                       caches, pos)
        return pick_next(logits[:, -1], i + 1), caches

    if eos_id is None:  # fixed-trip scan: benchmarks / parity fixtures
        if max_new_tokens == 1:
            return (next_tok[:, None], caches) if return_caches \
                else next_tok[:, None]

        def step(carry, i):
            tok, caches = carry
            nxt, caches = advance(tok, caches, i)
            return (nxt, caches), tok

        # N-1 advances emit slots 0..N-2; the final carry IS slot N-1 — the
        # old N-trip scan paid one extra decode step for a discarded token
        (last, caches), toks = jax.lax.scan(step, (next_tok, caches),
                                            jnp.arange(max_new_tokens - 1))
        out = jnp.concatenate(
            [jnp.swapaxes(toks, 0, 1), last[:, None]], axis=1)
        return (out, caches) if return_caches else out

    # EOS path: dynamic trip count, static shapes.  ``buf`` starts full of
    # EOS so never-written tail slots read as finished rows downstream.
    buf0 = jnp.full((b, max_new_tokens), eos_id, next_tok.dtype)

    def cond(c):
        i, tok, caches, done, buf = c
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(c):
        i, tok, caches, done, buf = c
        buf = jax.lax.dynamic_update_slice_in_dim(buf, tok[:, None], i,
                                                  axis=1)
        done = done | (tok == eos_id)
        # the advance whose output would never be emitted (everything just
        # finished, or the budget boundary) is skipped — one decode step
        # (~10 ms on the 7B) saved on EVERY call
        nxt, caches = jax.lax.cond(
            jnp.all(done) | (i + 1 >= max_new_tokens),
            lambda tok, caches: (tok, caches),
            lambda tok, caches: advance(tok, caches, i),
            tok, caches)
        # frozen rows keep streaming EOS (their KV writes are inert: the
        # emitted tokens are forced, never read)
        nxt = jnp.where(done, jnp.asarray(eos_id, nxt.dtype), nxt)
        return (i + 1, nxt, caches, done, buf)

    c = (jnp.int32(0), next_tok, caches, jnp.zeros((b,), bool), buf0)
    _, _, caches, _, buf = jax.lax.while_loop(cond, body, c)
    return (buf, caches) if return_caches else buf  # (B, max_new_tokens)


_GENERATE_STATIC = ("cfg", "max_new_tokens", "eos_id", "min_new_tokens",
                    "draft_tokens", "ngram", "draft_gate", "prefix_len",
                    "inplace_prefix", "return_caches", "kv_bits")

generate_greedy = partial(jax.jit,
                          static_argnames=_GENERATE_STATIC)(
    _generate_greedy_impl)

# Donating variant for the in-place prefix flow: XLA aliases the prefix_kv
# buffers into the decode's caches, so chaining name → definition through
# ONE prefill_prefix(max_len=…) buffer never holds two decode-length KV
# copies (the copy was the block-text memory ceiling: D=6 OOMed).  The
# donated input is INVALID after the call — callers must thread the
# returned caches (return_caches=True) into the next query.
generate_greedy_donate = partial(jax.jit,
                                 static_argnames=_GENERATE_STATIC,
                                 donate_argnames=("prefix_kv",))(
    _generate_greedy_impl)


def _prompt_lookup_draft(seq, end, n: int, K: int):
    """Draft K tokens by n-gram self-lookup: find the most recent earlier
    occurrence of seq[end-n+1 .. end] and copy the K tokens that followed
    it.  No match (or a match whose continuation runs past ``end``) drafts
    stale/garbage tokens, which verification simply rejects — control flow
    stays static either way."""
    L = seq.shape[0]
    gram = jax.lax.dynamic_slice(seq, (jnp.maximum(end - n + 1, 0),), (n,))
    idx = jnp.arange(L)
    # ok[j] ⇔ seq[j-n+1 .. j] == gram, for match END positions j < end
    ok = (idx >= n - 1) & (idx < end)
    for t in range(n):  # static n, tiny VPU work over a ~1.3k buffer
        ok &= jnp.roll(seq, t) == gram[n - 1 - t]
    q = jnp.max(jnp.where(ok, idx, -1))
    return jax.lax.dynamic_slice(seq, (jnp.maximum(q + 1, 0),), (K,))


def _speculative_greedy(p, cfg, input_ids, caches, next_tok, start,
                        max_new_tokens: int, eos_id, min_new_tokens: int,
                        K: int, n: int, cache_offset: int = 0,
                        gate: int = 0):
    """Prompt-lookup speculative greedy loop (B=1).  Invariant: the carry
    token is a CORRECT greedy next token not yet emitted; each iteration
    emits it, then one K+1-position verify forward either extends the
    emission by up to K accepted drafts or (zero accepts) just yields the
    next carry — never slower than one token per forward.

    ``gate > 0`` enables acceptance gating: the loop starts in PROBE mode
    (plain 1-position steps — exactly the plain-decode cost), scoring the
    lookup's would-be first draft token against the actually-emitted next
    token for free each step, and only switches to K+1-position verify
    forwards after ``gate`` consecutive hits; a zero-accept verify drops
    straight back to probe mode.  Non-drafting text therefore decodes at
    plain speed (round-4 verdict: ungated K=8 verifies made realistic text
    a measured 0.88x NET LOSS), while self-repeating output still reaches
    full speculation a couple of tokens in.  Emitted tokens are exact
    greedy on every path.  ``gate == 0`` is the ungated legacy loop.

    ``start`` is relative to the lookup buffer (== input_ids);
    ``cache_offset`` shifts KV-cache positions when input_ids is a suffix
    resumed from a shared-prefix prefill (generate_greedy prefix_kv)."""
    l0 = input_ids.shape[1]
    fill = eos_id if eos_id is not None else 0
    seq_len = l0 + max_new_tokens + K + 1
    seq0 = jnp.full((seq_len,), -1, input_ids.dtype).at[:l0].set(input_ids[0])
    buf0 = jnp.full((1, max_new_tokens + K), fill, next_tok.dtype)

    def verify(tok, d, caches, i):
        end = start + i  # buffer position of ``tok``
        x_ids = jnp.concatenate([tok, d])  # (K+1,)
        emb = p["language"]["embed_tokens"][x_ids][None]
        positions = (cache_offset + end + jnp.arange(K + 1))[None]
        logits, caches = llama_forward(p["language"], emb, positions, cfg,
                                       caches, cache_offset + end)
        lg = logits[0].astype(jnp.float32)  # (K+1, V)
        if eos_id is not None and min_new_tokens > 0:
            emit_idx = i + 1 + jnp.arange(K + 1)
            masked = lg.at[:, eos_id].set(-jnp.inf)
            lg = jnp.where((emit_idx < min_new_tokens)[:, None], masked, lg)
        g = jnp.argmax(lg, axis=-1).astype(tok.dtype)  # (K+1,) greedy truths
        # accepted prefix: d[j] must equal the greedy continuation g[j-1]
        acc = jnp.cumprod((d == g[:-1]).astype(jnp.int32))
        a = jnp.sum(acc)  # 0..K correct tokens beyond g[0]
        if eos_id is not None:
            # an EOS inside the accepted prefix becomes the carry (emitted
            # by the next iteration's top-of-loop, which then freezes)
            j = jnp.arange(K + 1)
            is_eos = (g == eos_id) & (j <= a)
            f = jnp.min(jnp.where(is_eos, j, K + 1))
            w = jnp.minimum(a, f)
        else:
            w = a
        return w, g[w][None], g[:K], caches

    def probe(tok, d, caches, i):
        # plain 1-position step (the l==1 fast decode path) — identical
        # cost to the ungated greedy loop; ``d`` is only scored by the body
        end = start + i
        emb = p["language"]["embed_tokens"][tok][None]  # (1, 1, C)
        positions = (cache_offset + end)[None, None]
        logits, caches = llama_forward(p["language"], emb, positions, cfg,
                                       caches, cache_offset + end)
        lg = logits[0, -1].astype(jnp.float32)
        if eos_id is not None and min_new_tokens > 0:
            lg = jnp.where(i + 1 < min_new_tokens,
                           lg.at[eos_id].set(-jnp.inf), lg)
        g0 = jnp.argmax(lg).astype(tok.dtype)
        return (jnp.int32(0), g0[None],
                jnp.full((K,), fill, tok.dtype), caches)

    def skip(tok, d, caches, i):
        return jnp.int32(0), tok, jnp.full((K,), fill, tok.dtype), caches

    def cond(c):
        i, r, tok, caches, seq, buf, done, score = c
        return (i < max_new_tokens) & ~done

    def body(c):
        i, r, tok, caches, seq, buf, done, score = c
        buf = jax.lax.dynamic_update_slice_in_dim(buf, tok[:, None], i, axis=1)
        if eos_id is not None:
            done = done | (tok[0] == eos_id)
        # the carry must land in seq BEFORE the lookup: the gram ends at
        # seq[start+i] == tok.  (Writing it only after verify left that slot
        # stale on iteration 0 and after every full-K acceptance — the next
        # draft was then always garbage, halving best-case acceptance.)
        seq = jax.lax.dynamic_update_slice(
            seq, tok.astype(seq.dtype), (start + i,))
        d = _prompt_lookup_draft(seq, start + i, n, K).astype(tok.dtype)
        run = ~done & (i + 1 < max_new_tokens)
        if gate > 0:
            spec = score >= gate
            idx = jnp.where(run, jnp.where(spec, 2, 1), 0)
            w, carry, g, caches = jax.lax.switch(
                idx, [skip, probe, verify], tok, d, caches, i)
            # probe: count consecutive d[0]-predicts-emitted hits; verify:
            # stay while accepting, zero-accept drops back to probe
            hit = d[0] == carry[0]
            score = jnp.where(
                run & ~spec, jnp.where(hit, score + 1, jnp.int32(0)),
                jnp.where(run & spec,
                          jnp.where(w > 0, score, jnp.int32(0)), score))
        else:
            w, carry, g, caches = jax.lax.cond(run, verify, skip,
                                               tok, d, caches, i)
        # seq gets ALL K verify outputs unconditionally: slots past the
        # accepted prefix are stale but sit beyond the lookup window
        # (idx < end) until later iterations' writes overwrite them
        seq = jax.lax.dynamic_update_slice(
            seq, g.astype(seq.dtype), (start + i + 1,))
        # buf gets only the w accepted tokens; untouched tail slots keep
        # the EOS fill (they are never-emitted budget slack)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, jnp.where(jnp.arange(K) < w, g, fill)[None], i + 1, axis=1)
        return (i + 1 + w, r + 1, carry, caches, seq, buf, done, score)

    c = (jnp.int32(0), jnp.int32(0), next_tok, caches, seq0, buf0,
         jnp.bool_(False), jnp.int32(0))
    _, rounds, _, caches, _, buf, _, _ = jax.lax.while_loop(cond, body, c)
    # rounds = loop iterations (acceptance telemetry: N/rounds is the
    # mean emitted-tokens-per-forward; tests bound it on periodic output)
    return buf[:, :max_new_tokens], rounds, caches


def _speculative_greedy_batched(p, cfg, input_ids, caches, next_tok, start,
                                max_new_tokens: int, eos_id,
                                min_new_tokens: int, K: int, n: int,
                                cache_offset: int = 0, gate: int = 0):
    """Prompt-lookup speculative greedy for B > 1 — the composition of the
    two text-stage levers: the batch amortizes the weight stream across
    rows, speculation amortizes it across positions.  Exact greedy per row
    (bit-identical to the plain batched paths, tests/test_vip_llava.py).

    Per-row state generalizes _speculative_greedy: every row carries its
    own emitted-count ``i``, lookup buffer, and done flag; each loop round
    runs ONE (B, K+1)-position verify forward with per-row cache offsets
    (the l>1 scatter branch of _llama_attention).  Rows that finish early
    ride along frozen (their writes are no-ops / junk beyond their last
    token, same as the plain batched decode's inert EOS streaming).

    ``gate > 0``: per-row probe/verify acceptance gating (see
    _speculative_greedy).  A round runs the K+1 verify forward iff every
    LAGGARD (min-progress live row) is in verify mode — the loop is paced
    by its slowest row, so verifying when laggards don't draft well costs
    K extra positions per row with zero round savings; when laggards
    don't draft the round is a plain (B, 1) decode step (leaders ride the
    next verify the moment a laggard's probe hits accumulate) — so a
    batch whose slowest row doesn't self-repeat decodes at plain batched
    speed."""
    bsz, l0 = input_ids.shape
    N = max_new_tokens
    fill = eos_id if eos_id is not None else 0
    # scalar or per-row (B,) EOS-suppression floor (see generate_greedy)
    min_any = (max(min_new_tokens) if isinstance(min_new_tokens, tuple)
               else min_new_tokens) > 0
    min_arr = jnp.broadcast_to(jnp.asarray(min_new_tokens, jnp.int32), (bsz,))
    # 2K slack: a frozen row's i can sit at up to N+K while others run, and
    # its (ignored) writes still index i+K past that
    seq_len = l0 + N + 2 * K + 1
    seq0 = jnp.full((bsz, seq_len), -1, input_ids.dtype)
    seq0 = seq0.at[:, :l0].set(input_ids)
    buf0 = jnp.full((bsz, N + 2 * K), fill, next_tok.dtype)
    rows = jnp.arange(bsz)
    draft = jax.vmap(_prompt_lookup_draft, in_axes=(0, 0, None, None))

    def cond(c):
        i, r, tok, caches, seq, buf, done, score = c
        return jnp.any(~done & (i < N))

    def body(c):
        i, r, tok, caches, seq, buf, done, score = c
        active = ~done & (i < N)  # rows emitting their carry this round
        buf = buf.at[rows, i].set(jnp.where(active, tok, buf[rows, i]))
        if eos_id is not None:
            done = done | (active & (tok == eos_id))
        # the carry must land in the lookup buffer BEFORE the lookup (the
        # gram ends at seq[start+i]); frozen rows keep their old value
        seq = seq.at[rows, start + i].set(
            jnp.where(active, tok.astype(seq.dtype), seq[rows, start + i]))
        live = ~done & (i + 1 < N)  # rows whose verify result is used

        end = start + i
        d = draft(seq, end, n, K).astype(tok.dtype)  # (B, K)

        def verify_all(tok, d, caches):
            x_ids = jnp.concatenate([tok[:, None], d], axis=1)  # (B, K+1)
            emb = p["language"]["embed_tokens"][x_ids]
            positions = (cache_offset + end)[:, None] \
                + jnp.arange(K + 1)[None]
            logits, caches = llama_forward(p["language"], emb, positions,
                                           cfg, caches, cache_offset + end)
            lg = logits.astype(jnp.float32)  # (B, K+1, V)
            if eos_id is not None and min_any:
                emit_idx = (i + 1)[:, None] + jnp.arange(K + 1)[None]
                masked = lg.at[:, :, eos_id].set(-jnp.inf)
                lg = jnp.where((emit_idx < min_arr[:, None])[..., None],
                               masked, lg)
            g = jnp.argmax(lg, axis=-1).astype(tok.dtype)  # (B, K+1)
            acc = jnp.cumprod((d == g[:, :-1]).astype(jnp.int32), axis=1)
            a = jnp.sum(acc, axis=1)  # (B,) 0..K correct beyond g[:, 0]
            if eos_id is not None:
                j = jnp.arange(K + 1)
                is_eos = (g == eos_id) & (j[None] <= a[:, None])
                f = jnp.min(jnp.where(is_eos, j[None], K + 1), axis=1)
                w = jnp.minimum(a, f)
            else:
                w = a
            w = jnp.where(live, w, 0)
            carry = jnp.where(
                live, jnp.take_along_axis(g, w[:, None], axis=1)[:, 0], tok)
            gd = jnp.where(live[:, None], g[:, :K],
                           jnp.asarray(fill, g.dtype))
            return w, carry, gd, caches

        def probe_all(tok, d, caches):
            # plain (B, 1) decode step — the l==1 fast path; ``d`` is only
            # scored against the emitted token by the body
            emb = p["language"]["embed_tokens"][tok][:, None]
            positions = (cache_offset + end)[:, None]
            logits, caches = llama_forward(p["language"], emb, positions,
                                           cfg, caches, cache_offset + end)
            lg = logits[:, -1].astype(jnp.float32)  # (B, V)
            if eos_id is not None and min_any:
                masked = lg.at[:, eos_id].set(-jnp.inf)
                lg = jnp.where(((i + 1) < min_arr)[:, None], masked, lg)
            g0 = jnp.argmax(lg, axis=-1).astype(tok.dtype)
            carry = jnp.where(live, g0, tok)
            return (jnp.zeros((bsz,), jnp.int32), carry,
                    jnp.full((bsz, K), fill, tok.dtype), caches)

        if gate > 0:
            spec = score >= gate
            # Gate verify on the LAGGARDS (min-progress live rows), not on
            # ANY live row: the loop's round count is paced by its slowest
            # row, so a K+1-position verify round whose laggards accept
            # nothing costs every row K extra positions for ZERO round
            # savings — one spuriously-drafting row taxed realistic-filler
            # blocks ~26% under the any-row gate (BASELINE.md).  Leaders
            # in spec mode keep their score through probe rounds via the
            # hit counter and re-engage the moment a laggard drafts well.
            # B=1 reduces to the plain score >= gate rule.
            min_i = jnp.min(jnp.where(live, i, jnp.iinfo(jnp.int32).max))
            lag = live & (i == min_i)
            any_spec = jnp.any(live & spec) & ~jnp.any(lag & ~spec)
            w, carry, gd, caches = jax.lax.cond(
                any_spec, verify_all, probe_all, tok, d, caches)
            # a verify round scores every live row on its OWN acceptance
            # (probe-mode rows ride the forward for free and may enter
            # verify mode directly); probe rounds count consecutive
            # d[:, 0]-predicts-emitted hits
            hit = d[:, 0] == carry
            score = jnp.where(
                ~live, score,
                jnp.where(any_spec,
                          jnp.where(w > 0, jnp.maximum(score, gate),
                                    jnp.int32(0)),
                          jnp.where(hit, score + 1, jnp.int32(0))))
        else:
            w, carry, gd, caches = verify_all(tok, d, caches)

        cols = (start + i + 1)[:, None] + jnp.arange(K)[None]
        seq = seq.at[rows[:, None], cols].set(gd.astype(seq.dtype))
        bcols = (i + 1)[:, None] + jnp.arange(K)[None]
        vals = jnp.where(jnp.arange(K)[None] < w[:, None], gd,
                         buf[rows[:, None], bcols])
        buf = buf.at[rows[:, None], bcols].set(vals)
        i = i + jnp.where(active, 1 + w, 0)
        return (i, r + 1, carry, caches, seq, buf, done, score)

    c = (jnp.zeros((bsz,), jnp.int32), jnp.int32(0), next_tok, caches, seq0,
         buf0, jnp.zeros((bsz,), bool), jnp.zeros((bsz,), jnp.int32))
    _, rounds, _, caches, _, buf, _, _ = jax.lax.while_loop(cond, body, c)
    return buf[:, :N], rounds, caches


def forward_logits(p, input_ids, pixel_values, cfg: VipLlavaConfig):
    """Full-sequence logits (parity testing)."""
    embeds = embed_multimodal(p, input_ids, pixel_values, cfg)
    b, l = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    logits, _ = llama_forward(p["language"], embeds, positions, cfg)
    return logits


# --------------------------------------------------------------------------
# HF checkpoint conversion
# --------------------------------------------------------------------------

def init_random_params(seed: int, cfg: VipLlavaConfig,
                       quantize_bits: int = None,
                       dtype=jnp.bfloat16,
                       int4_format: str = "affine") -> dict:
    """Random params with convert_hf's exact tree structure — smoke runs
    and throughput benchmarks without local weights (the zoo's random-init
    fallback pattern).  With ``quantize_bits=8`` the 2-D kernels are
    generated DIRECTLY as int8 on device: materializing a 7B model in f32
    first would need 27 GB of host RAM and OOM the image.

    All draws run as per-shape-cached jitted programs (one compile per
    distinct shape, ~15 for LLaMA-7B) so initialization stays seconds even
    on a remote-attached chip.
    """
    counter = [seed * 1000]

    @partial(jax.jit, static_argnums=(1, 2))
    def _draw(s, shape, dt):
        k = jax.random.PRNGKey(s)
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dt)

    @partial(jax.jit, static_argnums=(1,))
    def _draw_q8(s, shape):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        q = jax.random.randint(k1, shape, -127, 128, jnp.int32).astype(jnp.int8)
        scale = jax.random.uniform(k2, (shape[1],), jnp.float32,
                                   1e-4, 3e-4)
        return {"q": q, "scale": scale}

    @partial(jax.jit, static_argnums=(1,))
    def _draw_q4(s, shape):
        from mars_tpu.ops.int4_matmul import pack_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        q = jax.random.randint(k1, shape, -7, 8, jnp.int32).astype(jnp.int8)
        scale = jax.random.uniform(k2, (shape[1],), jnp.float32,
                                   1e-4, 3e-4)
        return {"q4": pack_int4(q), "scale": scale}

    @partial(jax.jit, static_argnums=(1,))
    def _draw_nf4(s, shape):
        from mars_tpu.models.quantization import quantize_kernel_nf4

        k = jax.random.PRNGKey(s)
        w = jax.random.normal(k, shape, jnp.float32) * 0.02
        return quantize_kernel_nf4(w)

    def vec(*shape):
        counter[0] += 1
        return _draw(counter[0], shape, dtype)

    def kernel(din, dout):
        counter[0] += 1
        if din * dout >= (1 << 14):
            if quantize_bits == 8:
                return _draw_q8(counter[0], (din, dout))
            if quantize_bits == 4:  # packed nibbles (ops.int4_matmul)
                if int4_format == "nf4":
                    return _draw_nf4(counter[0], (din, dout))
                return _draw_q4(counter[0], (din, dout))
        return _draw(counter[0], (din, dout), dtype)

    def ln(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    c = cfg
    g = c.image_size // c.patch_size
    vision = {
        "patch_embed": {"kernel": vec(c.patch_size, c.patch_size, 3, c.v_hidden)},
        "class_embedding": vec(c.v_hidden),
        "position_embedding": vec(g * g + 1, c.v_hidden),
        "pre_layernorm": ln(c.v_hidden),
    }
    for i in range(c.v_layers):
        vision[f"layer{i}"] = {
            "ln1": ln(c.v_hidden), "ln2": ln(c.v_hidden),
            "attn": {n: {"kernel": kernel(c.v_hidden, c.v_hidden),
                         "bias": jnp.zeros((c.v_hidden,), dtype)}
                     for n in ("q", "k", "v", "out")},
            "mlp": {
                "fc1": {"kernel": kernel(c.v_hidden, c.v_intermediate),
                        "bias": jnp.zeros((c.v_intermediate,), dtype)},
                "fc2": {"kernel": kernel(c.v_intermediate, c.v_hidden),
                        "bias": jnp.zeros((c.v_hidden,), dtype)},
            },
        }
    n_feat = len(c.vision_feature_layers)
    projector = {
        "ln": ln(c.v_hidden * n_feat),
        "linear_1": {"kernel": kernel(c.v_hidden * n_feat, c.hidden),
                     "bias": jnp.zeros((c.hidden,), dtype)},
        "linear_2": {"kernel": kernel(c.hidden, c.hidden),
                     "bias": jnp.zeros((c.hidden,), dtype)},
    }
    hd = c.hidden // c.heads
    language = {
        "embed_tokens": vec(c.vocab, c.hidden),
        "norm": jnp.ones((c.hidden,), dtype),
        # floating head regardless of quantize_bits (mirrors bitsandbytes,
        # which skips lm_head)
        "lm_head": _draw(counter[0] + 7777, (c.hidden, c.vocab), dtype),
    }
    for i in range(c.layers):
        language[f"layer{i}"] = {
            "input_ln": jnp.ones((c.hidden,), dtype),
            "post_ln": jnp.ones((c.hidden,), dtype),
            "attn": {
                "q": {"kernel": kernel(c.hidden, c.hidden)},
                "k": {"kernel": kernel(c.hidden, c.kv_heads * hd)},
                "v": {"kernel": kernel(c.hidden, c.kv_heads * hd)},
                "o": {"kernel": kernel(c.hidden, c.hidden)},
            },
            "mlp": {
                "gate": {"kernel": kernel(c.hidden, c.intermediate)},
                "up": {"kernel": kernel(c.hidden, c.intermediate)},
                "down": {"kernel": kernel(c.intermediate, c.hidden)},
            },
        }
    return {"vision": vision, "projector": projector, "language": language}


def convert_hf(sd: dict, cfg: VipLlavaConfig) -> dict:
    """HF VipLlavaForConditionalGeneration state_dict (numpy) → params."""
    def t(w):
        return np.ascontiguousarray(w.T)

    def pre(prefix, k):
        return sd[prefix + k]

    v = "model.vision_tower.vision_model."
    vision = {
        "patch_embed": {"kernel": np.transpose(
            sd[v + "embeddings.patch_embedding.weight"], (2, 3, 1, 0))},
        "class_embedding": sd[v + "embeddings.class_embedding"],
        "position_embedding": sd[v + "embeddings.position_embedding.weight"],
        "pre_layernorm": {"scale": sd[v + "pre_layrnorm.weight"],
                          "bias": sd[v + "pre_layrnorm.bias"]},
    }
    for i in range(cfg.v_layers):
        b = f"{v}encoder.layers.{i}."
        vision[f"layer{i}"] = {
            "ln1": {"scale": sd[b + "layer_norm1.weight"], "bias": sd[b + "layer_norm1.bias"]},
            "ln2": {"scale": sd[b + "layer_norm2.weight"], "bias": sd[b + "layer_norm2.bias"]},
            "attn": {
                "q": {"kernel": t(sd[b + "self_attn.q_proj.weight"]), "bias": sd[b + "self_attn.q_proj.bias"]},
                "k": {"kernel": t(sd[b + "self_attn.k_proj.weight"]), "bias": sd[b + "self_attn.k_proj.bias"]},
                "v": {"kernel": t(sd[b + "self_attn.v_proj.weight"]), "bias": sd[b + "self_attn.v_proj.bias"]},
                "out": {"kernel": t(sd[b + "self_attn.out_proj.weight"]), "bias": sd[b + "self_attn.out_proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": t(sd[b + "mlp.fc1.weight"]), "bias": sd[b + "mlp.fc1.bias"]},
                "fc2": {"kernel": t(sd[b + "mlp.fc2.weight"]), "bias": sd[b + "mlp.fc2.bias"]},
            },
        }

    mp = "model.multi_modal_projector."
    projector = {
        "ln": {"scale": sd[mp + "projector_layernorm.weight"],
               "bias": sd[mp + "projector_layernorm.bias"]},
        "linear_1": {"kernel": t(sd[mp + "linear_1.weight"]), "bias": sd[mp + "linear_1.bias"]},
        "linear_2": {"kernel": t(sd[mp + "linear_2.weight"]), "bias": sd[mp + "linear_2.bias"]},
    }

    lm = "model.language_model."
    language = {
        "embed_tokens": sd[lm + "embed_tokens.weight"],
        "norm": sd[lm + "norm.weight"],
        "lm_head": t(sd["lm_head.weight"]),
    }
    for i in range(cfg.layers):
        b = f"{lm}layers.{i}."
        language[f"layer{i}"] = {
            "input_ln": sd[b + "input_layernorm.weight"],
            "post_ln": sd[b + "post_attention_layernorm.weight"],
            "attn": {
                "q": {"kernel": t(sd[b + "self_attn.q_proj.weight"])},
                "k": {"kernel": t(sd[b + "self_attn.k_proj.weight"])},
                "v": {"kernel": t(sd[b + "self_attn.v_proj.weight"])},
                "o": {"kernel": t(sd[b + "self_attn.o_proj.weight"])},
            },
            "mlp": {
                "gate": {"kernel": t(sd[b + "mlp.gate_proj.weight"])},
                "up": {"kernel": t(sd[b + "mlp.up_proj.weight"])},
                "down": {"kernel": t(sd[b + "mlp.down_proj.weight"])},
            },
        }
    return {"vision": vision, "projector": projector, "language": language}
