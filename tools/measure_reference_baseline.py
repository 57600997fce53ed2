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


def main():
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
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
