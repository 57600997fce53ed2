"""Benchmark: MARS episode-ranking throughput on one chip.

Measures the device ranking path of one episode at full model scale
(the reference's per-episode "ranking time after text extraction",
main_MARS.py:76-89): DINOv2 ViT-L/14 VVA prior (features + attention tap in
one pass), CLIP ViT-B/16 Grad-CAM VTA prior, AlphaCLIP ViT-L/14@336 over a
128-proposal bucket, batched Sinkhorn EMD + score fusion + merge.

Weights are random (throughput is weight-independent); shapes/configs match
the shipped evaluation scripts (scripts/coco_1shot.sh).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline``: speedup vs the torch reference's per-episode ranking time —
the MEASURED 1.191 s/episode A100-granted denominator from
BASELINE_MEASURED.json (tools/measure_reference_baseline.py times the
reference's own towers on this image's CPU and scales per stage with
documented factors; BASELINE.md).  Falls back to the retired 2.0 s
round-1 estimate only if that file is missing.
"""
import json
import signal
import subprocess
import sys
import threading
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.time()

# Record-so-far, printed by the SIGTERM handler if the driver's `timeout`
# fires mid-run: remote-compile latency on the axon service varies from
# ~95 s to 20+ min with load (CLAUDE.md), so a loaded day must degrade to
# "whatever was measured before the deadline", never to a lost bench line.
_RECORD = {
    "metric": "episode_ranking_throughput",
    "value": 0.0,
    "unit": "episodes/sec/chip",
    "vs_baseline": 0.0,
}
_PRINTED = False
# RLock, not Lock: the SIGTERM handler runs ON the main thread — if the
# signal lands while main() itself is inside _emit's critical section, a
# plain Lock would deadlock the handler against its own thread and the
# JSON line would never flush (plain `timeout` sends no follow-up SIGKILL).
_EMIT_LOCK = threading.RLock()


def _emit():
    # Lock: SIGTERM (main thread) and the measurement worker can race here;
    # exactly ONE JSON line must ever reach stdout.
    global _PRINTED
    with _EMIT_LOCK:
        if _PRINTED:
            return
        _PRINTED = True
    print(json.dumps(_RECORD), flush=True)


def _on_term(signum, frame):  # noqa: ARG001
    if _RECORD["value"] == 0.0:
        _RECORD["error"] = (
            f"SIGTERM at +{time.time() - _T0:.0f}s before the ranking "
            "measurement completed (remote-compile service load)")
    else:
        _RECORD["partial"] = (
            f"SIGTERM at +{time.time() - _T0:.0f}s; stages measured "
            "before the deadline are reported")
    _emit()
    # 143 = 128+SIGTERM: a supervisor that isn't `timeout` can still tell a
    # deadline-truncated run from a clean one by exit code.
    sys.exit(143)


signal.signal(signal.SIGTERM, _on_term)


def _mark(msg):
    """Progress marker on stderr (stdout stays the single JSON line) — the
    remote-compile service's latency varies from seconds to many minutes,
    so a silent bench run is indistinguishable from a hung one without
    these."""
    print(f"[bench +{time.time() - _T0:6.0f}s] {msg}", file=sys.stderr, flush=True)

import os

# Single-A100 torch reference per-episode ranking latency (s).  The repo
# publishes no numbers; BASELINE_MEASURED.json is produced by
# tools/measure_reference_baseline.py (reference towers timed on this
# image's CPU, scaled per stage by documented FLOPs/core factors —
# BASELINE.md).  Legacy fallback: the round-1 2.0 s estimate.
_MEASURED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_MEASURED.json")
if os.path.exists(_MEASURED):
    with open(_MEASURED) as _f:
        BASELINE_EPISODE_SECONDS = json.load(_f)["baseline_episode_seconds_a100"]
else:
    BASELINE_EPISODE_SECONDS = 2.0

PROPOSAL_BUCKET = 128


def _probe_device(timeout_s=60):
    """Health-check the tunnel-attached TPU in a SUBPROCESS (the CLAUDE.md
    recipe): a sick axon backend hangs `jax.devices()` indefinitely, and a
    hang inside THIS process would take the whole bench (and its SIGTERM
    record-so-far guard) with it.  Returns True iff a device answered."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True, timeout=timeout_s, text=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _retry_stage(fn, label, backoff_s=20):
    """Run a measurement stage; on failure re-probe the device, back off,
    and retry ONCE (transient axon outages recover within seconds;
    persistent ones fail the probe and we surface the original error)."""
    try:
        return fn()
    except Exception as exc:  # noqa: BLE001 — one retry, then re-raise
        _mark(f"{label} failed ({type(exc).__name__}: {exc}); probing "
              f"device and retrying once after {backoff_s}s")
        time.sleep(backoff_s)
        if not _probe_device():
            _mark(f"{label}: device probe failed after backoff; giving up")
            raise
        return fn()


def main():
    """Run the measurement in a daemon worker thread: a Python signal
    handler only runs when the MAIN thread re-enters the interpreter, and
    a remote-compile RPC can block in C for minutes — parking the main
    thread in short joins keeps the SIGTERM guard responsive throughout.

    ANY exception (device down, compile failure, OOM) still emits the
    record-so-far JSON with an ``error`` field: the driver artifact must
    never be a bare crash (round-3 lesson — BENCH_r03.json was rc=1 with
    nothing parsed because an axon outage raised through main())."""
    if not _probe_device():
        _mark("device probe failed; waiting 30s and probing again")
        time.sleep(30)
        if not _probe_device():
            _RECORD["error"] = (
                f"TPU device probe failed twice at +{time.time() - _T0:.0f}s"
                " (axon backend unavailable); no measurement attempted")
            _emit()
            sys.exit(1)
    _mark("device probe ok")

    exc_box = []

    def _worker():
        try:
            _run()
        except BaseException as e:  # noqa: BLE001 — reported below
            exc_box.append(e)

    t = threading.Thread(target=_worker, daemon=True)
    t.start()
    while t.is_alive():
        t.join(0.5)
    if exc_box:
        exc = exc_box[0]
        traceback.print_exception(exc, file=sys.stderr)
        key = "error" if _RECORD["value"] == 0.0 else "partial"
        _RECORD[key] = (f"{type(exc).__name__} at +{time.time() - _T0:.0f}s:"
                        f" {exc}")
        _emit()
        sys.exit(1 if _RECORD["value"] == 0.0 else 0)
    _emit()


def _run():
    from mars_tpu.core.episode import pad_proposals
    from mars_tpu.data import build_dataset, to_device_episode
    from mars_tpu.models import clip as clip_m, dinov2
    from mars_tpu.pipeline import filtering, vta as vta_m, vva as vva_m

    dcfg = dinov2.DINOV2_VARIANTS["vit_large"]
    cvcfg = clip_m.CLIP_B16_VISUAL
    avcfg = clip_m.ALPHA_CLIP_L14_336_VISUAL

    from mars_tpu.models import zoo

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dino_params = zoo._on_host(dinov2.init_params, ks[0], dcfg)
    clip_v = zoo._on_host(clip_m.init_visual_params, ks[1], cvcfg)
    ac_v = zoo._on_host(clip_m.init_visual_params, ks[2], avcfg)
    # host Python float, NOT a device scalar: closure constants are fetched
    # from the device during jit lowering, and round-3's bench died exactly
    # there when the backend sickened between init and trace (VERDICT r3 #1)
    logit_scale = float(np.log(1 / 0.07))

    # production precision: bf16 tower weights (the reference runs fp16 on
    # GPU); LN/softmax/PIR/EMD stay f32 by construction (models.precision)
    import os as _os

    dtype_name = _os.environ.get("MARS_BENCH_DTYPE", "bfloat16")
    if dtype_name == "bfloat16":
        from mars_tpu.models.precision import cast_floating

        dino_params = cast_floating(dino_params)
        clip_v = cast_floating(clip_v)
        ac_v = cast_floating(ac_v)
    # int8 towers are OPT-IN (MARS_BENCH_INT8=1; cli --int8-towers): at the
    # 128-proposal bucket the AlphaCLIP stage is MXU-compute-bound, so
    # weight-only int8 measured the same speed as bf16 (609.8 vs 602 ms) —
    # it is a memory play only — while tools/w8a8_accuracy.py measured
    # MATERIAL accuracy drift vs bf16 (240 kept-set flips / 8 episodes,
    # min merged-mask IoU 0.61 under the fusion's min-max amplification,
    # reference FilteringMergingModule.py:125-132).  bf16 is the default,
    # matching the reference's fp16 towers (BASELINE.md).
    if _os.environ.get("MARS_BENCH_INT8", "0") == "1":
        from mars_tpu.models.quantization import quantize_params

        dino_params = quantize_params(dino_params)
        clip_v = quantize_params(clip_v)
        # MARS_BENCH_W8A8=1: dynamic int8 activations on the AlphaCLIP
        # tower (s8xs8 MXU) — cli --w8a8-alphaclip
        ac_act = 8 if _os.environ.get("MARS_BENCH_W8A8", "0") == "1" else None
        ac_v = quantize_params(ac_v, act_bits=ac_act)

    vva_cfg = vva_m.VVAConfig()
    vta_cfg = vta_m.VTAConfig()
    fm_cfg = filtering.FilterMergeConfig()

    ds = build_dataset("synthetic", shot=1, size=518, num_episodes=2)
    rec = ds[0]
    ep = to_device_episode(rec, size=518, max_shots=1)
    rng = np.random.RandomState(0)
    prop_np = np.zeros((PROPOSAL_BUCKET, 518, 518), np.float32)
    for i in range(PROPOSAL_BUCKET):
        y, x = rng.randint(0, 400, 2)
        prop_np[i, y : y + rng.randint(40, 118), x : x + rng.randint(40, 118)] = 1
    props = pad_proposals(jnp.asarray(prop_np), PROPOSAL_BUCKET)
    vta_text = jnp.asarray(rng.rand(2, cvcfg.output_dim).astype(np.float32))
    ac_text = jnp.asarray(rng.rand(1, avcfg.output_dim).astype(np.float32))
    ac_text = ac_text / jnp.linalg.norm(ac_text)

    from mars_tpu.core import imaging

    g = vva_cfg.grid

    # ONE jitted program for all four device stages — the production
    # orchestrator's fused single-dispatch graph (pipeline/mars.py _fused).
    # Tower params are explicit jit ARGUMENTS, not closure constants: the
    # axon remote-compile service ships closure constants in the request
    # body, and ~1 GB of tower weights now trips its length limit
    # (HTTP 413) — the orchestrator itself already passes params as args.
    @jax.jit
    def _episode_rank(dino_params, clip_v, ac_v, ep, props, vta_text,
                      ac_text):
        vva_prior, cost, support_fg = vva_m.compute(
            dino_params, ep.support_images, ep.support_masks, ep.support_valid,
            ep.query_image, dcfg, vva_cfg,
        )
        vta_prior = vta_m.compute(
            clip_v, ep.query_image, vta_text, logit_scale, cvcfg, vta_cfg
        )
        vta_prior = imaging.interpolate_2d(vta_prior, (g, g), "nearest")
        vta_prior = (vta_prior - vta_prior.min()) / (1e-7 + vta_prior.max() - vta_prior.min())
        ac_scores = filtering.alphaclip_scores(
            ac_v, ep.query_image, props.masks, ac_text, avcfg, fm_cfg,
            proposal_valid=props.valid,
        )
        merged, scores = filtering.score_and_merge(
            props.masks, props.valid, support_fg, cost, vva_prior, vta_prior,
            ac_scores, fm_cfg,
        )
        return merged

    def episode_rank(ep, props, vta_text, ac_text):
        return _episode_rank(dino_params, clip_v, ac_v, ep, props, vta_text,
                             ac_text)

    _mark("compiling episode_rank (full 128-bucket ranking program)")
    t_compile0 = time.time()

    def _compile_rank():
        out = episode_rank(ep, props, vta_text, ac_text)
        # force completion (block_until_ready is lazy on axon)
        return float(out[0, 0])

    _retry_stage(_compile_rank, "episode_rank compile")
    compile_s = time.time() - t_compile0
    _mark(f"episode_rank compiled in {compile_s:.0f}s; timing 8 iters")

    # per-iteration sync + min-of-N: the tunnel-attached device shows ±15%
    # run-to-run variance; the min is the sustainable per-episode rate
    n_iter = 8
    times = []
    for _ in range(n_iter):
        t0 = time.time()
        out = episode_rank(ep, props, vta_text, ac_text)
        _ = float(out[0, 0])
        times.append(time.time() - t0)
    per_episode = min(times)
    eps_per_sec = 1.0 / per_episode

    record = _RECORD
    record.update({
        "metric": "episode_ranking_throughput",
        "value": round(eps_per_sec, 4),
        "unit": "episodes/sec/chip",
        "vs_baseline": round(eps_per_sec * BASELINE_EPISODE_SECONDS, 3),
        "per_episode_ms": round(per_episode * 1000, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    })

    # ---- full-episode end-to-end: text (int8 7B VLM) + inline proposal
    # generation (DINOv2-L shared with VVA + SAM) + ranking — the
    # reference's own headline unit (main_MARS.py:76-89,103 logs the full
    # per-episode total).  Gated so a degraded remote-compile day can't
    # sink the primary metric (MARS_BENCH_E2E=0 skips).
    if _os.environ.get("MARS_BENCH_E2E", "1") == "1":
        try:
            record.update(_retry_stage(
                lambda: _measure_e2e(dino_params, dcfg, episode_rank, ep,
                                     vta_text, ac_text),
                "end-to-end stage"))
        except Exception as exc:  # noqa: BLE001 — never lose the primary line
            record["end_to_end_error"] = f"{type(exc).__name__}: {exc}"

    _emit()


def _measure_e2e(dino_params, dcfg, episode_rank, ep, vta_text, ac_text):
    """Measure text + proposal generation + ranking as one eps/s number."""
    from mars_tpu.cli import bucket_generated_proposals
    from mars_tpu.models import sam as sam_m, vip_llava as vl, zoo
    from mars_tpu.models.precision import cast_floating
    from mars_tpu.pipeline import amg, matcher

    # ViP-LLaVA-7B int8 (the production retriever backend, cli --jax-vlm)
    _mark("e2e: initializing 7B int8 VLM params on device")
    vcfg = vl.VipLlavaConfig()
    vlm_p = vl.init_random_params(0, vcfg, quantize_bits=8)
    # production prompt shape: the processor expands <image> to gtok=576
    # slots, so 600 text ids become a 1175-position multimodal prompt
    # (embed_multimodal requires exactly gtok image tokens per image)
    gtok = (vcfg.image_size // vcfg.patch_size) ** 2
    name_ids = np.full((1, 600 + gtok - 1), 5, np.int64)
    name_ids[0, 10:10 + gtok] = vcfg.image_token_index
    pixels = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))

    # name + definition queries share the image and the prompt up to the
    # question ("Human: <image>\n…", reference helpers/prompts.py:23 +
    # TextRetrieverModule.py:103-122) — the retriever prefills that prefix
    # ONCE per episode image and both queries decode suffix-only
    # (JaxVipLlava shared_prefix / models.vip_llava.prefill_prefix)
    prefix_len = 580 + gtok - 1
    prefix_ids = jnp.asarray(name_ids[:, :prefix_len])
    suffix_ids = jnp.asarray(name_ids[:, prefix_len:])

    # block text batching (cli --text-block default 4): D episodes' name
    # queries ride ONE B=D decode and their D definitions another, off one
    # batched prefix prefill — decode steps are weight-stream-bound, so the
    # batch amortizes the stream D-fold (measured 337 vs 681 ms/episode at
    # D=4, tools/pipelined_text_bench.py).  MARS_BENCH_TEXT_BLOCK=1
    # restores the serial per-episode stage.
    text_div = max(int(os.environ.get("MARS_BENCH_TEXT_BLOCK", "4")), 1)
    # MARS_BENCH_KV_BITS=8: int8 KV cache (models.vip_llava kv_bits) —
    # halves resident KV, the lever for re-trying D=6 (bf16 KV at D=6 held
    # ~3.9 GB and degraded the co-resident stages, round-4 notes)
    kv_bits = 8 if os.environ.get("MARS_BENCH_KV_BITS") == "8" else None
    if text_div > 1:
        D = text_div
        prefix_ids_d = jnp.asarray(
            np.repeat(name_ids[:, :prefix_len], D, axis=0))
        pixels_d = jnp.zeros((D, vcfg.image_size, vcfg.image_size, 3))
        sfx = np.zeros((D, suffix_ids.shape[1]), name_ids.dtype)
        sfx[:] = name_ids[0, prefix_len:]
        suffix_d = jnp.asarray(sfx)
        tl_d = jnp.full((D,), suffix_ids.shape[1], jnp.int32)

        # chained in-place KV (the production retriever path): ONE
        # full-length buffer per block — prefill writes the prefix, the
        # name decode runs in place (donated) and the definition decode
        # chains off its returned caches.  Peak KV is 1x instead of
        # prefill + per-decode copy (bit-identical; TestInplaceChained)
        buf_len = prefix_len + suffix_d.shape[1] + 50 + 8 + 1

        def text_launch(suffix=None):
            # one block of D episodes: batched prefill + B=D name decode +
            # B=D definition decode, per-row prompt-lookup drafts.  Returns
            # DEVICE arrays — callers sync (the pipelined loop launches the
            # block and keeps the chip queue fed with proposal programs
            # while the host waits on the decode)
            s = suffix_d if suffix is None else suffix
            kv = vl.prefill_prefix(vlm_p, prefix_ids_d, pixels_d, vcfg,
                                   max_len=buf_len, kv_bits=kv_bits)
            n, kv = vl.generate_greedy_donate(
                vlm_p, s, None, vcfg, max_new_tokens=20, true_length=tl_d,
                draft_tokens=8, prefix_kv=kv, prefix_len=prefix_len,
                inplace_prefix=True, return_caches=True)
            # return_caches even on the last decode: without a cache
            # output XLA has nothing to alias the donated buffer INTO, so
            # the donation is unusable (warning + 2x peak KV on this call)
            d, _ = vl.generate_greedy_donate(
                vlm_p, s, None, vcfg, max_new_tokens=50, true_length=tl_d,
                min_new_tokens=20, draft_tokens=8, prefix_kv=kv,
                prefix_len=prefix_len, inplace_prefix=True,
                return_caches=True)
            return n, d

        def text_stage(suffix=None):
            n, d = text_launch(suffix)
            # cost is reported per episode via text_div
            return np.asarray(d[0, -1]) + np.asarray(n[0, -1])
    else:
        def text_stage():
            # 1-shot name query (max 20 new tokens) + definition (max 50)
            # (reference TextRetrieverModule.py:76,118), with the
            # retriever's production prompt-lookup speculative decode
            # (draft_tokens=8).  Caveat: random-weight output is
            # repetitive → near-max draft acceptance; real definitions
            # accept less (BASELINE.md), so the plain-decode text time is
            # also reported (end_to_end_stage_ms carries the speculative
            # number).
            kv = vl.prefill_prefix(vlm_p, prefix_ids, pixels, vcfg,
                                   kv_bits=kv_bits)
            n = vl.generate_greedy(vlm_p, suffix_ids, None, vcfg,
                                   max_new_tokens=20, draft_tokens=8,
                                   prefix_kv=kv, prefix_len=prefix_len)
            d = vl.generate_greedy(vlm_p, suffix_ids, None, vcfg,
                                   max_new_tokens=50, min_new_tokens=20,
                                   draft_tokens=8,
                                   prefix_kv=kv, prefix_len=prefix_len)
            return np.asarray(d[0, -1]) + np.asarray(n[0, -1])

    # ViT-H @1024 encode is the reference's config (build_sam.py:14-23,
    # predictor.py:36-98) AND this repo's own cli default (--sam-size
    # vit_h): the e2e baseline denominator charges ViT-H, so the numerator
    # must too (VERDICT r3 weak #3).  MARS_BENCH_SAM=vit_b for the
    # lighter secondary config.
    sam_variant = os.environ.get("MARS_BENCH_SAM", "vit_h")
    sam_params, sam_cfg = zoo.build_sam(None, sam_variant)
    sam_params = cast_floating(sam_params)
    mcfg = matcher.MatcherConfig(input_size=518, grid=37, patch_size=14)
    acfg = amg.AmgConfig()
    key = jax.random.PRNGKey(0)

    # single-program proposal flow (union-family rows, cli default):
    # measured 584 vs 761 ms/episode (tools/e2e_probe.py A/B);
    # MARS_BENCH_FUSED=0 restores the 2-program flow
    fused = os.environ.get("MARS_BENCH_FUSED", "1") == "1"

    def proposal_stage(k):
        return matcher.generate_proposals(
            k, dino_params, dcfg, sam_params, sam_cfg, acfg, mcfg,
            ep.support_images, ep.support_masks, ep.support_valid,
            ep.query_image, bucket=PROPOSAL_BUCKET, fuse_programs=fused,
        )

    # compile all three stages once
    t0 = time.time()
    _mark("e2e: compiling text stage (7B int8 VLM, speculative decode)")
    text_stage()
    _mark("e2e: compiling proposal stage (match + propose programs)")
    out = proposal_stage(key)
    props = bucket_generated_proposals(out, PROPOSAL_BUCKET)
    merged = episode_rank(ep, props, vta_text, ac_text)
    _ = float(merged[0, 0])
    e2e_compile_s = time.time() - t0
    _mark(f"e2e compiled in {e2e_compile_s:.0f}s; timing 6 episodes")

    # min-of-6: the tunnel shows ±15% run-to-run variance (and occasional
    # multi-hundred-ms stalls), so 3 samples routinely overstate the
    # proposal span by 300+ ms vs matcher_bench's steady state
    stage_ms = {"text": [], "proposals": [], "ranking": []}
    totals = []
    for i in range(6):
        key, k = jax.random.split(key)
        t0 = time.time()
        text_stage()
        t1 = time.time()
        # one text block serves text_div episodes: per-episode text cost
        # is the block span / D (the proposals/ranking below run once per
        # episode as in the real loop)
        text_span = (t1 - t0) / text_div
        out = proposal_stage(k)
        props = bucket_generated_proposals(out, PROPOSAL_BUCKET)
        _ = float(props.masks[0, 0, 0])
        t2 = time.time()
        merged = episode_rank(ep, props, vta_text, ac_text)
        _ = float(merged[0, 0])
        t3 = time.time()
        stage_ms["text"].append(text_span)
        stage_ms["proposals"].append(t2 - t1)
        stage_ms["ranking"].append(t3 - t2)
        totals.append(text_span + (t2 - t1) + (t3 - t2))
    best = min(totals)

    extras = {}
    if os.environ.get("MARS_BENCH_NATURAL", "1") == "1":
        # ---- natural-statistics proposal span (VERDICT r4 weak #4): the
        # synthetic dataset's low-texture episode drives the auction into
        # near-tie bidding wars and overstates the proposal stage
        # (913 → 259 ms across the round-3 fixes, vs 143 ms on
        # matcher_bench inputs).  Time the SAME compiled proposal program
        # on matcher_bench-style inputs (uniform-noise images: textured,
        # non-degenerate similarity — tools/matcher_bench.py episode())
        # so the span is bounded from both sides in every bench artifact.
        rng_n = np.random.RandomState(3)
        sup_n = jnp.asarray(rng_n.rand(1, 518, 518, 3), jnp.float32)
        qry_n = jnp.asarray(rng_n.rand(518, 518, 3), jnp.float32)
        m_n = np.zeros((1, 518, 518), np.float32)
        m_n[0, 60:240, 80:300] = 1.0
        msk_n, val_n = jnp.asarray(m_n), jnp.ones((1,), bool)
        _mark("e2e: timing proposal stage on natural-statistics inputs")
        nat = []
        for _ in range(4):
            key, k = jax.random.split(key)
            t0 = time.time()
            out_n = matcher.generate_proposals(
                k, dino_params, dcfg, sam_params, sam_cfg, acfg, mcfg,
                sup_n, msk_n, val_n, qry_n, bucket=PROPOSAL_BUCKET,
                fuse_programs=fused)
            props_n = bucket_generated_proposals(out_n, PROPOSAL_BUCKET)
            _ = float(props_n.masks[0, 0, 0])
            nat.append(time.time() - t0)
        # same shapes → the already-compiled program; min-of-4 matches the
        # serial loop's variance discipline
        extras["proposals_natural_ms"] = round(min(nat) * 1000, 1)
    if text_div > 1 and os.environ.get("MARS_BENCH_PIPELINED", "1") == "1":
        # ---- pipelined loop: the PRODUCTION cli.py structure.  The three
        # stages above are timed with a host sync after each program, so
        # every one pays the tunnel's ~35 ms round trip with an idle chip.
        # The real loop is async: proposal programs for a block's episodes
        # are enqueued BEFORE its text decode (cli.py launches the
        # generator, then text_stage.step buffers), ranking launches as
        # soon as the block's text is read, and merged masks are pulled a
        # block late — the device queue stays fed while the host waits.
        # per-episode keys on the host CPU backend (an eager split on the
        # axon device is a ~35 ms tunnel dispatch each — cli.episode_key
        # does the same)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            base7 = jax.random.PRNGKey(7)
            all_keys = [jax.random.fold_in(base7, i)
                        for i in range(3 * text_div)]

        def pipelined(n_blocks, suffix=None):
            # min-of-block-spans, mirroring the serial loop's min-of-6 —
            # the tunnel's ±15% variance (and occasional multi-hundred-ms
            # stalls) otherwise penalizes the mean-measured loop against
            # the min-measured serial stages
            marks = [time.time()]
            prev = []
            for blk in range(n_blocks):
                keys = all_keys[blk * text_div:(blk + 1) * text_div]
                plist = [bucket_generated_proposals(proposal_stage(k),
                                                    PROPOSAL_BUCKET)
                         for k in keys]
                n_t, d_t = text_launch(suffix)
                # the real loop reads the decoded ids here (host parses the
                # class name / definition before text features exist)
                _ = np.asarray(n_t[0, -1]) + np.asarray(d_t[0, -1])
                merged = [episode_rank(ep, p, vta_text, ac_text)
                          for p in plist]
                for m in prev:
                    _ = float(m[0, 0])
                prev = merged
                marks.append(time.time())
            for m in prev:
                _ = float(m[0, 0])
            marks[-1] = time.time()  # the last block owns its own drain
            spans = [b - a for a, b in zip(marks, marks[1:])]
            # block 1 never pulls a previous block's merged masks — it is
            # systematically light, so steady state is blocks 2..n
            if len(spans) > 1:
                spans = spans[1:]
            return min(spans) / text_div

        _mark("e2e: timing pipelined loop (async cli.py structure)")
        pipelined(1)  # warm the block-of-keys proposal variants
        per_ep = pipelined(3)
        extras["episode_end_to_end_throughput_pipelined"] = round(
            1.0 / per_ep, 4)
        extras["end_to_end_pipelined_per_episode_ms"] = round(
            per_ep * 1000, 1)

        if os.environ.get("MARS_BENCH_TEXT_REALISTIC", "1") == "1":
            # ---- definition-like filler (VERDICT r3 weak #6): the
            # worst-case prompt above fills the suffix with ONE constant id,
            # which pins every n-gram lookup to the degenerate suffix match
            # and defeats prompt-lookup entirely (0 accepted drafts).  Real
            # definitions are natural text — repeated phrases, zipfian ids —
            # so the drafter matches the sequence's own earlier content.  A
            # seeded order-1 Markov stream over a small id range is the
            # definition-like proxy; same shapes → same compiled programs.
            rng_m = np.random.RandomState(11)
            trans = rng_m.randint(1000, 1256, size=(256, 4))
            sfx_m = np.zeros((text_div, suffix_d.shape[1]), name_ids.dtype)
            for r in range(text_div):
                tok = 1000 + r
                for j in range(sfx_m.shape[1]):
                    sfx_m[r, j] = tok
                    tok = trans[tok - 1000, rng_m.randint(4)]
            suffix_m = jnp.asarray(sfx_m)
            _mark("e2e: timing text stage with definition-like filler")
            spans = []
            for _ in range(3):
                t0 = time.time()
                text_stage(suffix_m)
                spans.append((time.time() - t0) / text_div)
            worst = min(stage_ms["text"])
            extras["text_realistic_ms_per_episode"] = round(
                min(spans) * 1000, 1)
            # zero acceptance emits exactly one token per verify forward,
            # so the worst/realistic span ratio IS the mean tokens emitted
            # per forward (prefill rides in both numerator and denominator)
            extras["text_realistic_speculation_speedup"] = round(
                worst / min(spans), 2)
            pr = pipelined(3, suffix_m)
            extras["episode_end_to_end_throughput_realistic"] = round(
                1.0 / pr, 4)

    # full-episode baseline (text + proposals + ranking on the granted
    # A100; tools/measure_reference_baseline.py --e2e) when measured
    e2e_base = None
    if os.path.exists(_MEASURED):
        with open(_MEASURED) as f:
            e2e_base = json.load(f).get("baseline_e2e_seconds_a100")
    return {
        **extras,
        "episode_end_to_end_throughput": round(1.0 / best, 4),
        **({"end_to_end_vs_baseline": round(e2e_base / best, 3)}
           if e2e_base else {}),
        "end_to_end_per_episode_ms": round(best * 1000, 1),
        "end_to_end_stage_ms": {
            k: round(min(v) * 1000, 1) for k, v in stage_ms.items()
        },
        "end_to_end_compile_s": round(e2e_compile_s, 1),
        "end_to_end_config": "vlm=vip-llava-7b-int8 "
                             f"text=20+50tok(draft=8,prefix-kv,"
                             f"block={text_div}) "
                             f"proposals=dinov2-l@518+sam-{sam_variant}"
                             f"@{sam_cfg.img_size} "
                             "ranking=full-128-bucket",
    }


if __name__ == "__main__":
    main()
