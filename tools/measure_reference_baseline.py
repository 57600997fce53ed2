"""Measure the torch reference's ranking stages on this image's CPU and
derive a documented per-stage A100 baseline (BASELINE.md action item).

What runs: the reference's OWN vendored towers (/root/reference, imported
read-only — nothing is copied) at full model scale with random weights
(wall time is weight-independent), arranged exactly as the reference's
per-episode ranking path:

  VVA  — DINOv2 ViT-L/14 reg4 @518: support pass + query pass + a third
         full pass for attention maps (VisualVisualAlignmentModule.py:66-68)
  VTA  — CLIP ViT-B/16 @528: Grad-CAM = full forward + backward
         (SoftmaxGradCAM / forward_last_layer)
  AC   — AlphaCLIP ViT-L/14@336 forward per proposal, 128-proposal episode
         (FilteringMergingModule._compute_alphaclip_vis_feats:183-207)
  EMD  — per-proposal host loop: adaptive_max_pool2d + cost slicing +
         exact transport solve (the ot.emd2 pattern, :112-116,143-171);
         POT is absent in this image so the solve uses this repo's exact
         C++ min-cost-flow (same algorithm class as POT's network simplex)

Scaling to A100 (documented, per stage):
  * GPU-eligible tower stages scale by FLOPs: stage FLOPs are counted
    analytically (validated against the CPU measurement via a calibrated
    single-core GEMM rate), and the A100 is GRANTED 30% fp16 MFU =
    0.30 x 312 = 93.6 TFLOP/s — above the 24% MFU our own XLA stack
    reaches on v5e for the same stage, i.e. generous to torch eager.
  * Host-side stages (the EMD loop) do not benefit from the GPU; they are
    granted a 3x faster single core than this image's vCPU.

Writes BASELINE_MEASURED.json at the repo root; bench.py prefers it over
the legacy 2.0 s estimate.  Runtime: ~4-6 min on one core.
"""
import json
import os
import sys
import time

import numpy as np
import torch

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REFERENCE)
sys.path.insert(0, REPO)

torch.manual_seed(0)
A100_GRANTED_TFLOPS = 0.30 * 312.0  # fp16, 30% MFU granted
HOST_CORE_FACTOR = 3.0  # modern server core vs this image's vCPU
# POT's ot.emd2 uses the network simplex, typically faster than our exact
# shortest-augmenting-path stand-in on these submatrix sizes; grant it 3x
# on top of the core factor.
EMD_SOLVER_FACTOR = 3.0
PROPOSALS = 128  # full bucket, matching bench.py


def timeit(fn, repeats=2):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def vit_flops(tokens: int, width: int, depth: int, mlp_ratio: float = 4.0):
    """Multiply-accumulate-counted-as-2 transformer FLOPs per forward."""
    per_block = (
        8 * tokens * width ** 2            # qkv + out proj
        + 4 * tokens ** 2 * width          # scores + apply
        + 4 * mlp_ratio * tokens * width ** 2  # mlp in + out
    )
    return depth * per_block


def calibrate_cpu_gflops():
    a = torch.randn(1024, 1024)
    b = torch.randn(1024, 1024)
    t = timeit(lambda: a @ b, repeats=3)
    return 2 * 1024 ** 3 / t / 1e9


def measure_vva():
    from dinov2.models.vision_transformer import DinoVisionTransformer

    model = DinoVisionTransformer(
        img_size=518, patch_size=14, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4, init_values=1e-5, block_chunks=0, num_register_tokens=4,
    ).eval()
    x = torch.randn(1, 3, 518, 518)
    with torch.no_grad():
        fwd = timeit(lambda: model.forward_features(x), repeats=1)
        attn = timeit(lambda: model.get_last_self_attention(x), repeats=1)
    # 1-shot: support + query forwards + the attention pass (:66-68)
    cpu_s = 2 * fwd + attn
    tokens = 37 * 37 + 1 + 4
    flops = 3 * vit_flops(tokens, 1024, 24)
    return cpu_s, flops, {"fwd_pass_s": fwd, "attn_pass_s": attn}


def measure_vta():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", f"{REFERENCE}/clip/model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model = mod.CLIP(
        embed_dim=512, image_resolution=224, vision_layers=12,
        vision_width=768, vision_patch_size=16, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ).float().eval()
    img = torch.randn(1, 3, 528, 528)
    text = torch.randn(2, 512)
    text = text / text.norm(dim=1, keepdim=True)

    def grad_cam():
        feats, _ = model.encode_image(img, 528, 528)
        logits, _ = model.forward_last_layer(feats, text)
        model.zero_grad(set_to_none=True)
        logits[:, 0].sum().backward()

    cpu_s = timeit(grad_cam, repeats=1)
    with torch.no_grad():
        fwd_s = timeit(lambda: model.encode_image(img, 528, 528), repeats=1)
    tokens = 33 * 33 + 1
    fwd_flops = vit_flops(tokens, 768, 12)
    # empirical fwd+bwd multiple applied to analytic forward FLOPs
    flops = fwd_flops * (cpu_s / max(fwd_s, 1e-9))
    return cpu_s, flops, {"fwd_only_s": fwd_s}


def measure_alphaclip():
    import importlib.util
    import types

    # loralib is only touched when lora_adapt=True (model.py:197-217);
    # stub it so the import succeeds
    sys.modules.setdefault("loralib", types.ModuleType("loralib"))
    # load model.py directly: the package __init__ pulls pkg_resources
    spec = importlib.util.spec_from_file_location(
        "ref_alpha_clip_model", f"{REFERENCE}/alpha_clip/model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model = mod.VisionTransformer(
        input_resolution=336, patch_size=14, width=1024, layers=24,
        heads=16, output_dim=768,
    ).float().eval()
    n_sub = 4
    img = torch.randn(n_sub, 3, 336, 336)
    alpha = torch.randn(n_sub, 1, 336, 336)
    with torch.no_grad():
        sub = timeit(lambda: model(img, alpha), repeats=1)
    cpu_s = sub * (PROPOSALS / n_sub)
    flops = PROPOSALS * vit_flops(24 * 24 + 1, 1024, 24)
    return cpu_s, flops, {"subset_n": n_sub, "subset_s": sub}


def measure_emd_loop():
    import torch.nn.functional as F

    from mars_tpu import native

    rng = np.random.RandomState(0)
    cost = rng.rand(300, 37 * 37).astype(np.float64)
    sup_rows = np.arange(300)
    # box proposals with bench.py's size distribution → realistic pooled
    # column counts (~10-80 live grid cells per proposal)
    props = []
    for _ in range(16):
        m = np.zeros((518, 518), np.float32)
        y, x = rng.randint(0, 400, 2)
        m[y:y + rng.randint(40, 118), x:x + rng.randint(40, 118)] = 1
        props.append(m)

    def loop():
        for m in props:
            # the reference's per-proposal glue (:104-116)
            pooled = F.adaptive_max_pool2d(
                torch.from_numpy(m)[None], (37, 37))[0].numpy() > 0
            cols = pooled.reshape(-1)
            sub = cost[sup_rows][:, cols]
            if sub.shape[1]:
                native.emd_exact(np.ascontiguousarray(sub))

    subset_s = timeit(loop, repeats=1)
    cpu_s = subset_s * (PROPOSALS / len(props))
    return cpu_s, {"subset_n": len(props), "subset_s": subset_s}


def measure_matcher_proposals():
    """Per-episode cost of the reference's proposal generation
    (matcher/Matcher.py:216-249 — DINOv2-L features, patch-level matching
    with scipy LSA on the host, SAM ViT-H encode + per-prompt-set decodes,
    per-candidate EMD scoring).  The canonical scripts consume precomputed
    proposal dumps (scripts/coco_1shot.sh --mask_proposals_path), so this
    stage is the offline half of the reference's episode; the e2e baseline
    charges it per episode exactly like our own inline-proposal bench."""
    import types

    # the reference's segment_anything package imports torchvision (absent
    # in this image) for ResizeLongestSide, which this measurement never
    # invokes — satisfy the import with an inert surface
    if "torchvision" not in sys.modules:
        mods = {}
        for name in ("torchvision", "torchvision.transforms",
                     "torchvision.transforms.functional",
                     "torchvision.ops", "torchvision.ops.boxes"):
            m = types.ModuleType(name)
            m.__path__ = []  # mark as package so submodule imports resolve
            parent, _, leaf = name.rpartition(".")
            if parent:
                setattr(mods[parent], leaf, m)
            mods[name] = m
            sys.modules[name] = m
        fn = mods["torchvision.transforms.functional"]
        fn.resize = fn.to_pil_image = None
        bx = mods["torchvision.ops.boxes"]
        bx.batched_nms = bx.box_area = None
        mods["torchvision.ops"].batched_nms = None
    from dinov2.models.vision_transformer import DinoVisionTransformer
    from segment_anything import sam_model_registry

    stages = {}

    # --- DINOv2-L feature passes: support + query (features only;
    # Matcher.extract_img_feats — no attention pass on this path)
    model = DinoVisionTransformer(
        img_size=518, patch_size=14, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4, init_values=1e-5, block_chunks=0, num_register_tokens=4,
    ).eval()
    x = torch.randn(1, 3, 518, 518)
    with torch.no_grad():
        fwd = timeit(lambda: model.forward_features(x), repeats=1)
    tokens = 37 * 37 + 1 + 4
    feat_flops = 2 * vit_flops(tokens, 1024, 24)
    stages["dino_feats"] = {
        "cpu_s": round(2 * fwd, 3), "flops": feat_flops,
        "a100_s": round(feat_flops / (A100_GRANTED_TFLOPS * 1e12), 4),
    }
    del model

    # --- SAM ViT-H image encode @1024 (set_target → predictor.set_image;
    # ResizeLongestSide upscales the 518 episode image to 1024)
    sam = sam_model_registry["vit_h"]().eval()
    img1024 = torch.randn(1, 3, 1024, 1024)
    with torch.no_grad():
        enc_s = timeit(lambda: sam.image_encoder(img1024), repeats=1)
    # windowed ViTDet FLOPs: 64x64 patches, width 1280, depth 32; window
    # 14x14 except 4 global blocks (segment_anything/build_sam.py:9-16,
    # image_encoder.py:83)
    t_all, t_win = 64 * 64, 14 * 14
    per_block_proj = (8 + 16) * t_all * 1280 ** 2  # qkv+out + mlp(4x)
    win_attn = 4 * t_all * t_win * 1280    # windowed scores+apply
    glob_attn = 4 * t_all * t_all * 1280
    enc_flops = 32 * per_block_proj + 28 * win_attn + 4 * glob_attn
    stages["sam_encode"] = {
        "cpu_s": round(enc_s, 3), "flops": enc_flops,
        "a100_s": round(enc_flops / (A100_GRANTED_TFLOPS * 1e12), 4),
    }

    # --- SAM prompt decodes: the RobustPromptSampler emits up to
    # max_sample_iterations=30 sets per size in sample_range=(4,6)
    # (Matcher.py:41-42,1229-1295; the n<=8 combinations family is
    # smaller), each decoded as one SamPredictor.predict call, plus
    # multimask triples.  Charge N_DECODES single-set decodes.
    N_DECODES = 64
    from segment_anything.modeling.prompt_encoder import PromptEncoder  # noqa: F401  (import sanity)
    with torch.no_grad():
        emb = sam.prompt_encoder(
            points=(torch.rand(1, 6, 2) * 1024, torch.ones(1, 6).long()),
            boxes=None, masks=None)
        image_emb = torch.randn(1, 256, 64, 64)

        def decode():
            sam.mask_decoder(
                image_embeddings=image_emb,
                image_pe=sam.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=emb[0],
                dense_prompt_embeddings=emb[1],
                multimask_output=True,
            )

        dec_s = timeit(decode, repeats=2) * N_DECODES
    # decoder FLOPs are dominated by the 2 token-to-image attentions +
    # output upscaling over 64x64x256; measure-implied GPU grant via the
    # calibrated GEMM rate is noisier than just charging the CPU time at
    # the host factor — but the decoder IS GPU work; grant it the measured
    # CPU time scaled by (calibrated cpu GFLOPs / granted A100), i.e.
    # FLOPs-implied from the measurement itself.
    cpu_gflops = calibrate_cpu_gflops()
    dec_flops = dec_s * cpu_gflops * 1e9
    stages["sam_decodes"] = {
        "cpu_s": round(dec_s, 3), "flops": dec_flops, "n_decodes": N_DECODES,
        "a100_s": round(dec_flops / (A100_GRANTED_TFLOPS * 1e12), 4),
    }
    del sam

    # --- host-side patch-level matching: scipy linear_sum_assignment on
    # the full similarity matrices (Matcher.py:364-376,449-471 — forward
    # on the fg-patch rows, reverse on the 1369x1369 transpose).  Pure
    # host work on the reference too; granted the 3x faster core.
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(0)
    s_fwd = rng.rand(300, 1369)
    s_rev = rng.rand(1369, 1369)

    def lsa():
        linear_sum_assignment(s_fwd, maximize=True)
        linear_sum_assignment(s_rev, maximize=True)

    lsa_s = timeit(lsa, repeats=2)
    stages["host_matching"] = {
        "cpu_s": round(lsa_s, 3),
        "a100_s": round(lsa_s / HOST_CORE_FACTOR, 4),
    }

    # --- per-candidate EMD scoring (mask_generation scores each sampled
    # mask with the ot.emd2 pattern; ~N_DECODES candidate masks)
    from mars_tpu import native

    cost = rng.rand(300, 37 * 37)
    masks = []
    for _ in range(8):
        m = np.zeros((37, 37), bool)
        y, x0 = rng.randint(0, 30, 2)
        m[y:y + rng.randint(3, 7), x0:x0 + rng.randint(3, 7)] = True
        masks.append(m.reshape(-1))

    def emd_loop():
        for m in masks:
            sub = cost[:, m]
            if sub.shape[1]:
                native.emd_exact(np.ascontiguousarray(sub))

    emd_sub = timeit(emd_loop, repeats=2)
    emd_s = emd_sub * (N_DECODES / len(masks))
    stages["emd_scoring"] = {
        "cpu_s": round(emd_s, 3),
        "a100_s": round(emd_s / (HOST_CORE_FACTOR * EMD_SOLVER_FACTOR), 4),
    }

    total = sum(s["a100_s"] for s in stages.values())
    return total, stages


def estimate_text_stage():
    """Granted-rate estimate of the reference's per-episode text stage —
    ViP-LLaVA-7B bnb-NF4 (--vlm4bit, TextRetrieverModule.py:42-122): a
    name query (max_new_tokens=20) and a definition query (max 50, min 20)
    via HF ``generate``, each with a full ~1175-position multimodal
    prefill (HF re-prefills per query; no prefix-KV sharing).

    The 7B cannot be measured on this image's single core, so the decode
    is GRANTED 60 tok/s on A100 — above public fp16 HF eager measurements
    (30-45 tok/s) and far above published bnb-4bit rates (18-25 tok/s:
    NF4 dequant makes bs=1 decode slower than fp16), i.e. generous to the
    reference.  Prefill is granted the same 30%-MFU 93.6 TFLOP/s as the
    tower stages.  Budgets are charged in full on both sides (our bench's
    random-weight decode also runs its full budget)."""
    GRANTED_DECODE_TOK_S = 60.0
    params = 6.74e9  # ViP-LLaVA-7B language+projector
    prompt_positions = 1175  # 600 text ids with <image> -> 576 slots
    prefill_flops = 2 * 2 * params * prompt_positions  # two queries
    prefill_s = prefill_flops / (A100_GRANTED_TFLOPS * 1e12)
    decode_s = (20 + 50) / GRANTED_DECODE_TOK_S
    return prefill_s + decode_s, {
        "granted_decode_tok_s": GRANTED_DECODE_TOK_S,
        "prefill_s": round(prefill_s, 4),
        "decode_s": round(decode_s, 4),
        "tokens": 70,
        "prompt_positions": prompt_positions,
    }


def add_e2e(out):
    """Extend BASELINE_MEASURED.json with the full-episode baseline:
    text + proposal generation + ranking (the ranking number is the
    existing per-stage sum)."""
    text_s, text_detail = estimate_text_stage()
    print(f"text stage (granted): {text_s:.3f}s  {text_detail}")
    prop_s, prop_stages = measure_matcher_proposals()
    for k, v in prop_stages.items():
        print(f"proposal/{k}: cpu {v['cpu_s']}s  a100 {v['a100_s']*1e3:.1f}ms")
    ranking_s = out["baseline_episode_seconds_a100"]
    out["text_stage"] = {"a100_s": round(text_s, 4), **text_detail}
    out["proposal_stages"] = prop_stages
    out["baseline_proposals_seconds_a100"] = round(prop_s, 4)
    out["baseline_e2e_seconds_a100"] = round(text_s + prop_s + ranking_s, 4)
    print(f"A100 per-episode e2e baseline: text {text_s:.3f} + proposals "
          f"{prop_s:.3f} + ranking {ranking_s:.3f} = "
          f"{out['baseline_e2e_seconds_a100']:.3f}s")


def main():
    if "--e2e-only" in sys.argv:
        # extend an existing BASELINE_MEASURED.json without re-timing the
        # ranking towers (~15 min of CPU forwards)
        path = os.path.join(REPO, "BASELINE_MEASURED.json")
        with open(path) as f:
            out = json.load(f)
        add_e2e(out)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return

    out = {"cpu_gflops": calibrate_cpu_gflops(),
           "proposals": PROPOSALS,
           "a100_granted_tflops": A100_GRANTED_TFLOPS,
           "host_core_factor": HOST_CORE_FACTOR,
           "stages": {}}
    print(f"calibrated single-core GEMM: {out['cpu_gflops']:.1f} GFLOP/s")

    for name, fn in (("vva", measure_vva), ("vta", measure_vta),
                     ("alphaclip", measure_alphaclip)):
        cpu_s, flops, extra = fn()
        a100_s = flops / (A100_GRANTED_TFLOPS * 1e12)
        implied = flops / cpu_s / 1e9
        out["stages"][name] = {
            "cpu_s": round(cpu_s, 3), "flops": flops,
            "implied_cpu_gflops": round(implied, 1),
            "a100_s": round(a100_s, 4), **extra,
        }
        print(f"{name}: cpu {cpu_s:.1f}s  flops {flops/1e12:.2f}T  "
              f"implied {implied:.0f} GFLOP/s  a100 {a100_s*1e3:.1f}ms")

    emd_cpu, extra = measure_emd_loop()
    granted = emd_cpu / (HOST_CORE_FACTOR * EMD_SOLVER_FACTOR)
    out["stages"]["emd_loop"] = {
        "cpu_s": round(emd_cpu, 3),
        "a100_s": round(granted, 4),  # host-bound (ot.emd2 runs on CPU)
        "emd_solver_factor": EMD_SOLVER_FACTOR,
        **extra,
    }
    print(f"emd_loop: cpu {emd_cpu:.1f}s  granted-host {granted:.2f}s")

    episode = sum(s["a100_s"] for s in out["stages"].values())
    out["baseline_episode_seconds_a100"] = round(episode, 4)
    print(f"A100 per-episode ranking baseline: {episode:.3f}s")
    if "--e2e" in sys.argv:
        add_e2e(out)
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
