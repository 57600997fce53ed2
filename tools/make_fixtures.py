"""Generate golden parity fixtures from the reference torch implementation.

Runs the reference models (mounted read-only at /root/reference) with seeded
random weights on tiny configs and saves inputs, torch state_dicts, and
outputs as .npz under tests/fixtures/.  Tests then convert the state_dicts
with mars_tpu.models.convert and assert numerical parity — so the fixtures
encode the reference's semantics without any reference code in this repo.

Run once (fixtures are committed):  python tools/make_fixtures.py
"""
import os
import sys

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REFERENCE)

torch.manual_seed(0)


def sd_to_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def save(name, **arrays):
    path = os.path.join(OUT, name + ".npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {len(arrays)} arrays")


def flat(prefix, d):
    return {f"{prefix}{k}": v for k, v in d.items()}


# ---------------------------------------------------------------- DINOv2
def make_dinov2():
    from dinov2.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(1)
    model = DinoVisionTransformer(
        img_size=56, patch_size=14, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4, init_values=1e-5, block_chunks=0, num_register_tokens=4,
    ).eval()
    # randomize params (init sets many to zero)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        out = model.forward_features(x)
        attn_maps = model.get_last_self_attention(x[:1])
    # PIR-style stripped mean over last 2 blocks & heads
    # (PriorInformationRefinementModule.py:31-44, num_regs=4)
    stacked = torch.stack([aw[0, :, 5:, 5:] for aw in attn_maps], dim=0)[-2:]
    attn_mean = stacked.mean(dim=(0, 1))
    save(
        "dinov2_tiny",
        input=x.numpy(),
        x_prenorm=out["x_prenorm"].numpy(),
        x_norm_patch=out["x_norm_patchtokens"].numpy(),
        attn_mean_last2=attn_mean.numpy(),
        **flat("sd.", sd_to_np(model)),
    )


# ---------------------------------------------------------------- CLIP
def _load_module(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_clip():
    # import clip/model.py directly: the package __init__ pulls pkg_resources
    CLIP = _load_module("ref_clip_model", f"{REFERENCE}/clip/model.py").CLIP

    torch.manual_seed(2)
    model = CLIP(
        embed_dim=16, image_resolution=32, vision_layers=3, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=100,
        transformer_width=16, transformer_heads=2, transformer_layers=2,
    ).float().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        model.logit_scale.copy_(torch.tensor(np.log(1 / 0.07), dtype=torch.float32))

    img = torch.randn(1, 3, 64, 64)  # grid 4x4 -> pos embed upsampled from 2x2
    H = W = 64
    image_features, attn_list = model.encode_image(img, H, W)  # runs layers-1 = 2 blocks
    text_tokens = torch.zeros(3, 77, dtype=torch.long)
    # fake tokenization: random ids with eot = max id at a known position
    g = torch.Generator().manual_seed(3)
    for i in range(3):
        n = 5 + i
        text_tokens[i, :n] = torch.randint(1, 90, (n,), generator=g)
        text_tokens[i, n - 1] = 99  # eot = argmax
    with torch.no_grad():
        text_feats = model.encode_text(text_tokens)

    # forward_last_layer with Grad-CAM (reference math of
    # pytorch_grad_cam base_cam.py:62-158 + grad_cam.py:16-23 at target layer
    # resblocks[-1].ln_1, reshape_transform stripping CLS)
    tf = text_feats / text_feats.norm(dim=1, keepdim=True)
    acts = {}

    def hook(module, inp, out):
        acts["a"] = out
        out.retain_grad()

    h = model.visual.transformer.resblocks[-1].ln_1.register_forward_hook(hook)
    logits, attn_last = model.forward_last_layer(image_features, tf)
    loss = logits[:, 0].sum()
    loss.backward()
    h.remove()
    a = acts["a"]  # (L, B, D)
    grad = a.grad  # (L, B, D)
    act_p = a.detach().permute(1, 0, 2)[:, 1:, :]  # (B, P, D)
    grad_p = grad.permute(1, 0, 2)[:, 1:, :]
    weights = grad_p.mean(dim=1)  # (B, D)
    cam = torch.relu(torch.einsum("bpd,bd->bp", act_p, weights))

    save(
        "clip_tiny",
        image=img.numpy(),
        image_tokens_prefinal=image_features.detach().permute(1, 0, 2).numpy(),  # LND->BLD
        attn_l0=attn_list[0].detach().numpy(),
        attn_l1=attn_list[1].detach().numpy(),
        text_tokens=text_tokens.numpy(),
        text_feats=text_feats.numpy(),
        probs=logits.detach().numpy(),
        attn_last=attn_last.detach().numpy(),
        cam=cam.detach().numpy(),
        logit_scale=model.logit_scale.detach().numpy(),
        **flat("sd.", sd_to_np(model)),
    )


# ---------------------------------------------------------------- AlphaCLIP
def make_alpha_clip():
    import types

    sys.modules.setdefault("loralib", types.ModuleType("loralib"))  # unused unless lora_adapt
    CLIP = _load_module("ref_alpha_clip_model", f"{REFERENCE}/alpha_clip/model.py").CLIP

    torch.manual_seed(4)
    model = CLIP(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=12, vocab_size=100,
        transformer_width=16, transformer_heads=2, transformer_layers=2,
    ).float().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    img = torch.randn(2, 3, 32, 32)
    alpha = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        cls_emb = model.visual(img, alpha)
    save(
        "alpha_clip_tiny",
        image=img.numpy(),
        alpha=alpha.numpy(),
        cls_emb=cls_emb.numpy(),
        **flat("sd.", sd_to_np(model)),
    )


# ---------------------------------------------------------------- SAM
def make_sam():
    # load the modeling files directly: the package __init__ pulls torchvision
    import types
    from functools import partial

    pkg = types.ModuleType("sam_modeling")
    sys.modules["sam_modeling"] = pkg
    common = _load_module("sam_modeling.common", f"{REFERENCE}/segment_anything/modeling/common.py")
    sys.modules["sam_modeling.common"] = common

    def _load_rel(name):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            f"sam_modeling.{name}", f"{REFERENCE}/segment_anything/modeling/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"sam_modeling.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    ImageEncoderViT = _load_rel("image_encoder").ImageEncoderViT
    PromptEncoder = _load_rel("prompt_encoder").PromptEncoder
    TwoWayTransformer = _load_rel("transformer").TwoWayTransformer
    MaskDecoder = _load_rel("mask_decoder").MaskDecoder

    torch.manual_seed(5)
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4, out_chans=16, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    ).eval()
    pe = PromptEncoder(
        embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=8,
    ).eval()
    dec = MaskDecoder(
        transformer_dim=16,
        transformer=TwoWayTransformer(depth=2, embedding_dim=16, mlp_dim=32, num_heads=2),
        num_multimask_outputs=3,
    ).eval()
    with torch.no_grad():
        for m in (enc, pe, dec):
            for p in m.parameters():
                p.copy_(torch.randn_like(p) * 0.05)

    img = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        emb = enc(img)  # (1, 16, 4, 4)
        coords = torch.tensor([[[10.0, 20.0], [40.0, 50.0], [5.0, 5.0]]])
        labels = torch.tensor([[1, 0, -1]])
        boxes = torch.tensor([[8.0, 8.0, 48.0, 56.0]])
        mask_in = torch.randn(1, 1, 16, 16)
        sparse_pts, dense_no = pe(points=(coords, labels), boxes=None, masks=None)
        sparse_box, dense_m = pe(points=(coords, labels), boxes=boxes, masks=mask_in)
        dpe = pe.get_dense_pe()
        masks, iou = dec(
            image_embeddings=emb, image_pe=dpe,
            sparse_prompt_embeddings=sparse_pts, dense_prompt_embeddings=dense_no,
            multimask_output=False,
        )
        masks_m, iou_m = dec(
            image_embeddings=emb, image_pe=dpe,
            sparse_prompt_embeddings=sparse_box, dense_prompt_embeddings=dense_m,
            multimask_output=True,
        )
    sd = {}
    sd.update({f"image_encoder.{k}": v for k, v in sd_to_np(enc).items()})
    sd.update({f"prompt_encoder.{k}": v for k, v in sd_to_np(pe).items()})
    sd.update({f"mask_decoder.{k}": v for k, v in sd_to_np(dec).items()})
    save(
        "sam_tiny",
        image=img.numpy(),
        embedding=emb.detach().numpy(),
        coords=coords.numpy(),
        labels=labels.numpy(),
        boxes=boxes.numpy(),
        mask_in=mask_in.numpy(),
        sparse_pts=sparse_pts.detach().numpy(),
        dense_no=dense_no.detach().numpy(),
        sparse_box=sparse_box.detach().numpy(),
        dense_m=dense_m.detach().numpy(),
        dense_pe=dpe.detach().numpy(),
        masks_single=masks.detach().numpy(),
        iou_single=iou.detach().numpy(),
        masks_multi=masks_m.detach().numpy(),
        iou_multi=iou_m.detach().numpy(),
        **flat("sd.", sd),
    )


# ------------------------------------------------- multi-crop dense AMG
def _stub_torchvision():
    """torchvision is absent in this image; the reference AMG only needs
    batched_nms/box_area and the PIL resize wrappers."""
    import types

    if "torchvision" in sys.modules:
        return
    from PIL import Image

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True, stable=True)
        areas = box_area(boxes)
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        keep = []
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            xx0 = torch.maximum(boxes[:, 0], boxes[i, 0])
            yy0 = torch.maximum(boxes[:, 1], boxes[i, 1])
            xx1 = torch.minimum(boxes[:, 2], boxes[i, 2])
            yy1 = torch.minimum(boxes[:, 3], boxes[i, 3])
            inter = (xx1 - xx0).clamp(min=0) * (yy1 - yy0).clamp(min=0)
            iou = inter / (areas + areas[i] - inter)
            suppressed |= iou > iou_threshold
        return torch.tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty(0, dtype=torch.long)
        offset = idxs.to(boxes) * (boxes.max() + torch.tensor(1.0))
        return nms(boxes + offset[:, None], scores, iou_threshold)

    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.boxes = types.ModuleType("torchvision.ops.boxes")
    tv.ops.boxes.batched_nms = batched_nms
    tv.ops.boxes.box_area = box_area
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
    tv.transforms.functional.resize = (
        lambda img, size, **kw: img.resize((size[1], size[0]), Image.BILINEAR)
    )
    tv.transforms.functional.to_pil_image = Image.fromarray
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops
    sys.modules["torchvision.ops.boxes"] = tv.ops.boxes
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = tv.transforms.functional


def make_amg_multicrop():
    """Dense AMG with crop_n_layers=1 end-to-end through the reference
    SamAutomaticMaskGenerator (tiny SAM, seeded): pins crop-box enumeration,
    per-crop grid+filters+NMS, uncrop, and cross-crop NMS."""
    from functools import partial

    _stub_torchvision()
    from segment_anything.automatic_mask_generator import SamAutomaticMaskGenerator
    from segment_anything.modeling.image_encoder import ImageEncoderViT
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.sam import Sam
    from segment_anything.modeling.transformer import TwoWayTransformer
    from segment_anything.utils.amg import rle_to_mask

    torch.manual_seed(11)
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4, out_chans=16, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    )
    pe = PromptEncoder(
        embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=8,
    )
    dec = MaskDecoder(
        transformer_dim=16,
        transformer=TwoWayTransformer(depth=2, embedding_dim=16, mlp_dim=32,
                                      num_heads=2),
        num_multimask_outputs=3,
    )
    model = Sam(image_encoder=enc, prompt_encoder=pe, mask_decoder=dec).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    rng = np.random.RandomState(3)
    image = np.kron(
        rng.randint(0, 256, (8, 8, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)

    amg = SamAutomaticMaskGenerator(
        model, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        sel_pred_iou_thresh=0.0, sel_stability_score_thresh=0.0,
        box_nms_thresh=0.5, crop_n_layers=1, crop_nms_thresh=0.5,
        output_layer=3, sel_output_layer=3,
        multimask_output=True, sel_multimask_output=True, dense_pred=True,
    )
    with torch.no_grad():
        data = amg._generate_masks(image)
    masks = np.stack([rle_to_mask(r) for r in data["rles"]])
    save(
        "amg_multicrop_tiny",
        image=image,
        masks=masks.astype(np.uint8),
        boxes=np.asarray(data["boxes"], np.float32),
        iou=np.asarray(data["iou_preds"], np.float32),
        crop_boxes=np.asarray(data["crop_boxes"], np.float32),
        **flat("sd.", sd_to_np(model)),
    )


if __name__ == "__main__":
    make_dinov2()
    make_clip()
    make_alpha_clip()
    make_sam()
    make_amg_multicrop()


# ---------------------------------------------------------------- PIR
def make_pir():
    from mars.components.PriorInformationRefinementModule import (
        PriorInformationRefinementModule,
    )

    torch.manual_seed(6)
    g = 6
    n_regs = 4
    L = g * g
    heads = 2
    prior = torch.rand(g, g)
    # blocky prior so thresholding yields nontrivial components
    prior[1:3, 1:4] += 1.0
    prior[4:, 4:] += 0.8
    prior = (prior - prior.min()) / (prior.max() - prior.min())
    attn_maps = [torch.rand(1, heads, L + 1 + n_regs, L + 1 + n_regs) + 0.01 for _ in range(3)]
    pirm = PriorInformationRefinementModule(
        box_threshold=0.4, last_n_attention_maps_for_refinement=2,
        device="cpu", num_regs=n_regs,
    )
    refined = pirm.compute(prior.clone(), attn_maps)
    stacked = torch.stack([aw[0, :, 1 + n_regs:, 1 + n_regs:] for aw in attn_maps], dim=0)[-2:]
    attn_mean = stacked.mean(dim=(0, 1))
    save(
        "pir_tiny",
        prior=prior.numpy(),
        attn_mean=attn_mean.numpy(),
        refined=refined.numpy(),
    )


if __name__ == "__main__":
    make_pir()


# ---------------------------------------------------------------- ViP-LLaVA
def make_vip_llava():
    from transformers import (CLIPVisionConfig, LlamaConfig, VipLlavaConfig,
                              VipLlavaForConditionalGeneration)

    torch.manual_seed(7)
    cfg = VipLlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=2, image_size=56, patch_size=14),
        text_config=LlamaConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
            max_position_embeddings=128),
        vision_feature_layers=[-2, -4],
        image_token_index=100,
    )
    model = VipLlavaForConditionalGeneration(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    pixels = torch.randn(1, 3, 56, 56)
    # prompt: 3 text tokens, 16 image tokens, 4 text tokens
    ids = torch.tensor([[5, 9, 2] + [100] * 16 + [7, 3, 11, 4]])
    with torch.no_grad():
        out = model(input_ids=ids, pixel_values=pixels,
                    attention_mask=torch.ones_like(ids))
        gen = model.generate(ids, pixel_values=pixels, max_new_tokens=6,
                             do_sample=False)
    save(
        "vip_llava_tiny",
        input_ids=ids.numpy(),
        pixels=pixels.numpy(),
        logits=out.logits.numpy(),
        generated=gen[:, ids.shape[1]:].numpy(),
        **flat("sd.", sd_to_np(model)),
    )


if __name__ == "__main__":
    make_vip_llava()
