"""Pre-convert torch checkpoints to orbax param caches.

Converts the reference's checkpoint set (models/README.md there) once and
stores orbax trees so runtime never touches torch:

  python tools/convert_checkpoints.py --models-path /models --out /models/orbax
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models-path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--vlm-path", default=None, help="local HF ViP-LLaVA dir")
    args = p.parse_args()

    from mars_tpu.models import zoo

    os.makedirs(args.out, exist_ok=True)
    jobs = [
        ("dinov2_vitl14_reg4", lambda: zoo.build_dinov2(args.models_path, "vit_large", 4)[0]),
        ("clip_b16", lambda: zoo.build_clip_b16(args.models_path)[:3]),
        ("alpha_clip_l14_336", lambda: zoo.build_alpha_clip(args.models_path)[:3]),
        ("sam_vit_h", lambda: zoo.build_sam(args.models_path, "vit_h")[0]),
    ]
    for name, fn in jobs:
        out = os.path.join(args.out, name)
        if os.path.exists(out):
            print(f"skip {name} (exists)")
            continue
        print(f"converting {name}...")
        params = fn()
        if isinstance(params, tuple):
            params = {"visual": params[0], "text": params[1], "logit_scale": params[2]}
        zoo.save_params(params, out)
        print(f"  -> {out}")

    if args.vlm_path:
        from mars_tpu.models import vip_llava as vl

        print("converting vip-llava...")
        sd = zoo.load_torch_state_dict(args.vlm_path)
        zoo.save_params(vl.convert_hf(sd, vl.VipLlavaConfig()),
                        os.path.join(args.out, "vip_llava_7b"))


if __name__ == "__main__":
    main()
