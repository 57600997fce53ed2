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
    # non-native size: grid 5 ≠ pos-embed grid 4 fires the
    # interpolate_offset=0.1 scale-factor bicubic (:204-209)
    x70 = torch.randn(1, 3, 70, 70)
    with torch.no_grad():
        out = model.forward_features(x)
        attn_maps = model.get_last_self_attention(x[:1])
        out70 = model.forward_features(x70)
        pe70 = model.interpolate_pos_encoding(
            torch.zeros(1, 26, 32), 70, 70)  # npatch+1=26 ≠ N+1=17
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
        input70=x70.numpy(),
        x_prenorm70=out70["x_prenorm"].numpy(),
        pos_embed70=pe70.numpy(),
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

    # --- transform classes (tensor-native; enough for the reference's
    # Compose pipelines at identity-resize geometry — resampling parity is
    # pinned separately by the per-component fixtures) ---
    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, x):
            if isinstance(x, torch.Tensor):
                return x.float()
            x = np.asarray(x)
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            x = x[None] if x.ndim == 2 else x.transpose(2, 0, 1)
            return torch.from_numpy(np.ascontiguousarray(x)).float()

    class ToPILImage:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):  # tensor-native: skip the PIL round trip
            return x

    class _NoOp:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.as_tensor(mean, dtype=torch.float32).reshape(-1, 1, 1)
            self.std = torch.as_tensor(std, dtype=torch.float32).reshape(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    class Resize:
        def __init__(self, size, interpolation="bilinear", **kw):
            self.size = (size, size) if isinstance(size, int) else tuple(size)
            self.mode = getattr(interpolation, "value", interpolation)

        def __call__(self, x):
            import torch.nn.functional as F

            squeeze = x.ndim == 3
            if squeeze:
                x = x[None]
            kw = {} if self.mode == "nearest" else {"align_corners": False}
            y = F.interpolate(x.float(), size=self.size, mode=self.mode, **kw)
            return y[0] if squeeze else y

    class CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, x):
            h, w = x.shape[-2:]
            th, tw = self.size
            i, j = (h - th) // 2, (w - tw) // 2
            return x[..., i:i + th, j:j + tw]

    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # capability probing) sees a well-formed module
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    tv = _mod("torchvision")
    tv.ops = _mod("torchvision.ops")
    tv.ops.boxes = _mod("torchvision.ops.boxes")
    tv.ops.boxes.batched_nms = batched_nms
    tv.ops.boxes.box_area = box_area
    tv.transforms = _mod("torchvision.transforms")
    for name, cls in (
        ("InterpolationMode", InterpolationMode), ("Compose", Compose),
        ("ToTensor", ToTensor), ("ToPILImage", ToPILImage),
        ("Normalize", Normalize), ("Resize", Resize),
        ("CenterCrop", CenterCrop), ("RandomApply", _NoOp),
        ("RandomHorizontalFlip", _NoOp), ("RandomResizedCrop", _NoOp),
        ("GaussianBlur", _NoOp),
    ):
        setattr(tv.transforms, name, cls)
    tv.transforms.functional = _mod("torchvision.transforms.functional")
    tv.transforms.functional.resize = (
        lambda img, size, **kw: img.resize((size[1], size[0]), Image.BILINEAR)
    )
    tv.transforms.functional.to_pil_image = Image.fromarray
    tv.transforms.functional.InterpolationMode = InterpolationMode

    class VisionDataset:  # dinov2.data.datasets.extended subclasses this
        def __init__(self, root=None, transforms=None, transform=None,
                     target_transform=None):
            self.root = root
            self.transform = transform
            self.target_transform = target_transform

    tv.datasets = _mod("torchvision.datasets")
    tv.datasets.VisionDataset = VisionDataset
    sys.modules["torchvision.datasets"] = tv.datasets
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




# ---------------------------------------------------------------- Swin
def make_swin():
    """transformers SwinModel oracle for the Semantic-SAM backbone
    (models/swin.py).  Image 56: grid 14 with window 4 exercises the
    per-block zero-padding; stage resolutions 14/7/4 exercise shift
    masking, odd-dim patch merging, and the window-clamp path."""
    from transformers import SwinConfig, SwinModel

    torch.manual_seed(12)
    cfg = SwinConfig(
        image_size=56, patch_size=4, num_channels=3, embed_dim=24,
        depths=[2, 2, 2], num_heads=[2, 4, 8], window_size=4,
        mlp_ratio=4.0, hidden_act="gelu", use_absolute_embeddings=False,
        drop_path_rate=0.0, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = SwinModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        out = model(x, output_hidden_states=True)
    hs = {f"h{i}": h.numpy() for i, h in enumerate(out.hidden_states)}
    save(
        "swin_tiny",
        input=x.numpy(),
        last_hidden=out.last_hidden_state.numpy(),
        **hs,
        **flat("sd.", sd_to_np(model)),
    )


# ------------------------------------------------- golden full episode
def _stub_runtime_deps():
    """pkg_resources / ttach / ot are absent in this image.  The golden
    episode needs packaging metadata, no TTA, and an exact stand-in for
    POT's ot.emd2: the same optimal-transport LP solved by scipy HiGHS."""
    import importlib.machinery
    import types

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    try:
        import pkg_resources  # noqa: F401
    except ModuleNotFoundError:
        import packaging
        import packaging.version  # noqa: F401

        pr = _mod("pkg_resources")
        pr.packaging = packaging
        sys.modules["pkg_resources"] = pr
    sys.modules.setdefault("ttach", _mod("ttach"))
    try:
        import ftfy  # noqa: F401
    except ModuleNotFoundError:
        # identity fix_text is exact for the ASCII prompts used here
        ftfy = _mod("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    if "ot" not in sys.modules:
        from scipy.optimize import linprog

        def emd2(a, b, M):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            M = np.asarray(M, np.float64)
            n, m = M.shape
            A_eq = np.zeros((n + m, n * m))
            for i in range(n):
                A_eq[i, i * m:(i + 1) * m] = 1.0
            for j in range(m):
                A_eq[n + j, j::m] = 1.0
            res = linprog(
                M.ravel(), A_eq=A_eq[:-1], b_eq=np.concatenate([a, b])[:-1],
                bounds=(0, None), method="highs",
            )
            assert res.success, res.message
            return float(res.fun)

        ot = types.ModuleType("ot")
        ot.emd2 = emd2
        sys.modules["ot"] = ot


def make_golden_episode():
    """The reference MARS orchestrator end-to-end on one tiny episode
    (reference: mars/MARS.py:33-104), with seeded random weights and a
    stubbed VLM.  Pins the cross-stage WIRING the per-component fixtures
    can't: VTA nearest-resize to the VVA grid + min-max (:77-82), the
    AlphaCLIP text construction (:84-89), score fusion, and merging.

    Geometry is chosen so every image resample is identity (112 px episode:
    DINOv2 grid 8, VTA ceil(112/16)*16 = 112, AlphaCLIP resolution 112) —
    resampling parity is pinned separately; here only wiring is under test.
    """
    import types

    _stub_torchvision()
    _stub_runtime_deps()
    import torch.nn.functional as F
    from torchvision import transforms as T

    # CPU stand-ins for the reference's hard-coded .cuda()/.half() calls
    # (SoftmaxGradCAM.py:148, FilteringMergingModule.py:189-195)
    orig_cuda, orig_half = torch.Tensor.cuda, torch.Tensor.half
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.half = lambda self: self
    import importlib.machinery as _ilm
    _lora = types.ModuleType("loralib")
    _lora.__spec__ = _ilm.ModuleSpec("loralib", None)
    sys.modules.setdefault("loralib", _lora)
    try:
        from dinov2.models.vision_transformer import DinoVisionTransformer
        from mars.MARS import MARS
        from mars.components.VisualVisualAlignmentModule import (
            VisualVisualAlignmentModule,
        )
        from mars.components.VisualTextAlignmentModule import (
            VisualTextAlignmentModule,
        )
        from mars.components.FilteringMergingModule import FilteringMergingModule
        import clip as ref_clip_pkg
        import alpha_clip as ref_aclip_pkg

        ref_clip = sys.modules["clip.model"]
        ref_aclip = sys.modules["alpha_clip.model"]

        S = 112  # episode size: all image resamples are identity at 112
        torch.manual_seed(21)
        dino = DinoVisionTransformer(
            img_size=S, patch_size=14, embed_dim=32, depth=3, num_heads=2,
            mlp_ratio=4, init_values=1e-5, block_chunks=0, num_register_tokens=4,
        ).eval()
        clip_model = ref_clip.CLIP(
            embed_dim=16, image_resolution=S, vision_layers=3, vision_width=64,
            vision_patch_size=16, context_length=77, vocab_size=49408,
            transformer_width=16, transformer_heads=2, transformer_layers=2,
        ).float().eval()
        aclip_model = ref_aclip.CLIP(
            embed_dim=16, image_resolution=S, vision_layers=2, vision_width=64,
            vision_patch_size=16, context_length=77, vocab_size=49408,
            transformer_width=16, transformer_heads=2, transformer_layers=2,
        ).float().eval()
        with torch.no_grad():
            # dino gets a larger scale: more feature diversity -> wider EMD
            # spread across proposals (min-max scaling amplifies otherwise)
            for m, sc in ((dino, 0.15), (clip_model, 0.05), (aclip_model, 0.05)):
                for p in m.parameters():
                    p.copy_(torch.randn_like(p) * sc)
            clip_model.logit_scale.copy_(torch.tensor(np.log(1 / 0.07)))
            aclip_model.logit_scale.copy_(torch.tensor(np.log(1 / 0.07)))
        if not hasattr(clip_model.visual, "patch_size"):
            clip_model.visual.patch_size = 16

        vva_mod = VisualVisualAlignmentModule(
            model=dino,
            model_transforms=T.Compose([
                T.Normalize((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
            ]),
            model_patch_size=14, model_embedding_spatial_dimensions=8,
            model_num_regs=4, vva_refinement_box_threshold=0.8,
            last_n_attention_maps_for_refinement=2, device="cpu",
        )
        vta_mod = VisualTextAlignmentModule(
            model=clip_model,
            model_transforms=T.Compose([
                T.Resize((S, S), interpolation=T.InterpolationMode.BICUBIC),
                T.Normalize((0.48145466, 0.4578275, 0.40821073),
                            (0.26862954, 0.26130258, 0.27577711)),
            ]),
            model_patch_size=16, model_embedding_spatial_dimensions=7,
            model_num_regs=0, vta_refinement_box_threshold=0.4,
            last_n_attention_maps_for_refinement=3, device="cpu",
        )
        fm_mod = FilteringMergingModule(
            alpha_clip_model=aclip_model,
            img_transforms=T.Compose([
                T.ToTensor(),
                T.Resize(S, interpolation=T.InterpolationMode.BICUBIC),
                T.CenterCrop(S),
                T.Normalize((0.48145466, 0.4578275, 0.40821073),
                            (0.26862954, 0.26130258, 0.27577711)),
            ]),
            mask_transforms=T.Compose([
                T.ToTensor(), T.Resize((S, S)), T.Normalize(0.5, 0.26)
            ]),
            alpha=0.85, static_threshold=0.55, dynamic_threshold=0.95,
            device="cpu",
        )

        class _StubRetriever:
            def get_conceptual_information(self, support_images, support_masks):
                return "dog", "a domesticated carnivorous mammal"

        mars = MARS(
            text_retriever_component=_StubRetriever(),
            visual_text_alignment_component=vta_mod,
            visual_visual_alignment_component=vva_mod,
            filtering_merging_component=fm_mod,
        )

        def build_episode(seed):
            rng = np.random.RandomState(seed)
            sup = rng.rand(1, 2, 3, S, S).astype(np.float32)
            qry = rng.rand(1, 3, S, S).astype(np.float32)
            sup_m = np.zeros((1, 2, S, S), np.float32)
            sup_m[0, 0, 20:64, 30:80] = 1
            sup_m[0, 1, 56:100, 14:60] = 1
            props = np.zeros((6, S, S), np.float32)
            for i in range(6):
                y, x = rng.randint(0, S - 24, 2)
                h, w = rng.randint(14, 96, 2)
                props[i, y:y + h, x:x + w] = 1
            return sup, qry, sup_m, props

        text = ["a dog, a domesticated carnivorous mammal."]

        def run_stepwise(sup_t, supm_t, qry_t, props_t, props):
            """The exact call sequence of MARS.predict (mars/MARS.py:33-104),
            capturing intermediates predict doesn't expose."""
            vva_mod.clear()
            vva_out = vva_mod.compute(sup_t, supm_t, qry_t)
            cost = vva_mod.cost_matrix.clone()
            vta_out = vta_mod.compute(qry_t, "dog", [])
            vta_rs = F.interpolate(
                torch.as_tensor(vta_out)[None, None], vva_out.shape,
                mode="nearest")[0, 0]
            vta_rs = (vta_rs - vta_rs.min()) / (
                1e-7 + vta_rs.max() - vta_rs.min())
            scored = fm_mod._score_proposals(
                query_img=qry_t, mask_proposals=props_t, support_mask=supm_t,
                cost_matrix=cost, patch_features_spatial_dimension=8,
                vva=vva_out, vta=vta_rs, text=text,
            )
            merged = fm_mod._merge_masks(scored)
            # map sorted (mask, score) back to original proposal order
            final_scores = np.full(6, np.nan, np.float64)
            for m_p, s in scored:
                idx = [i for i in range(6)
                       if np.array_equal(props[i], m_p.numpy())]
                assert len(idx) == 1
                final_scores[idx[0]] = float(np.asarray(s).reshape(()))
            assert not np.isnan(final_scores).any()
            # raw per-stage scores via the same helpers _score_proposals calls
            tf = fm_mod._compute_alphaclip_text_feats(text)
            imf = fm_mod._compute_alphaclip_vis_feats(qry_t[0], props_t)
            ac_raw = (imf @ tf.T).detach().numpy().reshape(6)
            pooled_sup = F.adaptive_max_pool2d(
                supm_t.permute(1, 0, 2, 3).float(), (8, 8))
            emd_raw = np.array([
                fm_mod._compute_emd(
                    pooled_sup.cpu(),
                    F.adaptive_max_pool2d(p[None].float(), (8, 8))[0],
                    cost,
                )
                for p in props_t
            ])
            return dict(vva=vva_out, cost=cost, vta=vta_out, vta_rs=vta_rs,
                        scores=final_scores, ac_raw=ac_raw, emd_raw=emd_raw,
                        merged=merged)

        # seed search: the fixture must sit comfortably away from the merge
        # threshold so the JAX side's Sinkhorn EMD (abs err ~1e-3) can't
        # flip the decision through the min-max amplification
        for seed in range(31, 71):
            sup, qry, sup_m, props = build_episode(seed)
            sup_t, qry_t = torch.from_numpy(sup), torch.from_numpy(qry)
            supm_t, props_t = torch.from_numpy(sup_m), torch.from_numpy(props)
            r = run_stepwise(sup_t, supm_t, qry_t, props_t, props)
            top = r["scores"].max()
            thr = 0.95 * top if top < 0.55 else 0.55
            # the dynamic threshold co-moves with the top score, so the top
            # proposal can't flip — fragility is (a) the OTHER proposals'
            # distance to thr and (b) the static/dynamic regime boundary
            others = np.delete(r["scores"], r["scores"].argmax())
            margin = np.abs(others - thr).min()
            regime_gap = abs(top - 0.55)
            spread = r["emd_raw"].max() - r["emd_raw"].min()
            print(f"golden seed {seed}: margin={margin:.4f} "
                  f"regime_gap={regime_gap:.4f} spread(emd)={spread:.4f} "
                  f"top={top:.4f} kept={(r['scores'] >= thr).sum()}")
            if margin > 0.03 and regime_gap > 0.02 and spread > 0.04:
                break
        else:
            raise AssertionError("no seed met the margin/spread bar")

        vva_mod.clear()
        merged = mars.predict(sup_t, supm_t, qry_t, mask_proposals=props_t)
        assert torch.equal(merged, r["merged"]), \
            "stepwise rerun drifted from predict"
        vva_out, cost = r["vva"], r["cost"]
        vta_out, vta_rs = r["vta"], r["vta_rs"]
        final_scores, ac_raw, emd_raw = r["scores"], r["ac_raw"], r["emd_raw"]

        sd = {}
        sd.update({f"dino.{k}": v for k, v in sd_to_np(dino).items()})
        sd.update({f"clip.{k}": v for k, v in sd_to_np(clip_model).items()})
        sd.update({f"aclip.{k}": v for k, v in sd_to_np(aclip_model).items()})
        save(
            "golden_episode_tiny",
            support_images=sup, support_masks=sup_m, query_image=qry,
            proposals=props,
            class_name=np.array("dog"),
            class_description=np.array("a domesticated carnivorous mammal"),
            vva=vva_out.detach().numpy(), cost_matrix=cost.detach().numpy(),
            vta_refined=np.asarray(torch.as_tensor(vta_out).detach()),
            vta_resized=vta_rs.detach().numpy(),
            ac_raw=ac_raw, emd_raw=emd_raw, final_scores=final_scores,
            merged=merged.detach().numpy(),
            **flat("sd.", sd),
        )
    finally:
        torch.Tensor.cuda, torch.Tensor.half = orig_cuda, orig_half


# ------------------------------------------------- golden Matcher.predict
def make_golden_matcher():
    """The reference Matcher end-to-end on one tiny episode (reference:
    matcher/Matcher.py:216-249,619-834): DINOv2 matching → combination
    prompt sampling → SAM sel-batch decode + NMS → purity/coverage/EMD →
    metric filters → score-filter merge (and a top-k-path variant).

    Pins the cross-stage WIRING of the proposal path that the piecewise
    oracles (matching vs scipy, EMD vs exact, AMG fixture) cannot.
    Geometry/config are chosen so the flow is fully DETERMINISTIC: ≤8
    matched points → the combinations prompt family (no random.sample),
    use_points_or_centers=True (no kmeans RNG), sel thresholds 0 (no
    random-weight rejections).
    """
    import types
    from functools import partial

    _stub_torchvision()
    _stub_runtime_deps()
    import importlib.machinery as _ilm

    for name in ("timm", "loralib"):  # import-only in the Matcher chain
        mod = types.ModuleType(name)
        mod.__spec__ = _ilm.ModuleSpec(name, None)
        sys.modules.setdefault(name, mod)
    if "pytorch_lightning" not in sys.modules:  # utils/misc.py:19
        pl = types.ModuleType("pytorch_lightning")
        pl.__spec__ = _ilm.ModuleSpec("pytorch_lightning", None)
        pl.seed_everything = lambda *a, **k: None
        sys.modules["pytorch_lightning"] = pl
    from dinov2.models.vision_transformer import DinoVisionTransformer
    from segment_anything.automatic_mask_generator import SamAutomaticMaskGenerator
    from segment_anything.modeling.image_encoder import ImageEncoderViT
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.sam import Sam
    from segment_anything.modeling.transformer import TwoWayTransformer
    from matcher.Matcher import Matcher
    from torchvision import transforms as T

    # 64-px episode, DINOv2 patch 8 (grid 8x8), SAM img_size 64: the target
    # needs NO resize on the SAM path, and inputs are pre-quantized uint8 —
    # so the reference's mul(255).byte() truncation and PIL-resize round
    # trip (set_target :199-201, transforms.py:26-31) are exactly lossless
    # and the fixture pins pipeline semantics, not resampling deltas.
    S = 64
    torch.manual_seed(31)
    dino = DinoVisionTransformer(
        img_size=S, patch_size=8, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4, init_values=1e-5, block_chunks=0, num_register_tokens=4,
    ).eval()
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4, out_chans=32, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    )
    pe = PromptEncoder(embed_dim=32, image_embedding_size=(4, 4),
                       input_image_size=(64, 64), mask_in_chans=8)
    dec = MaskDecoder(
        transformer_dim=32,
        transformer=TwoWayTransformer(depth=2, embedding_dim=32, mlp_dim=64,
                                      num_heads=2),
        num_multimask_outputs=3,
    )
    sam_model = Sam(image_encoder=enc, prompt_encoder=pe, mask_decoder=dec).eval()
    with torch.no_grad():
        for p in dino.parameters():
            p.copy_(torch.randn_like(p) * 0.15)  # feature diversity → EMD spread
        for p in enc.parameters():
            p.copy_(torch.randn_like(p) * 0.25)
        for p in pe.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
        for p in dec.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    dino.family = "vits14"  # BackboneLoader attribute the Matcher dispatches on

    # Brief synthetic prompt-conditioning training.  With iid random weights
    # the tiny decoder's output is prompt-INDEPENDENT (the LayerNorm stack
    # washes the point tokens out), so every prompt set decodes the same
    # mask and NMS collapses each episode to one proposal.  1500 Adam steps
    # of "slot k = union of radius-(8+5k) disks around the prompt points"
    # make decoding genuinely prompt-driven — diverse overlapping proposals,
    # as with real SAM weights.  Fully seeded → deterministic fixture.
    opt = torch.optim.Adam(list(dec.parameters()) + list(pe.parameters()),
                           lr=3e-3)
    gtr = torch.Generator().manual_seed(5)
    gy, gx = torch.meshgrid(torch.arange(16.) * 4 + 2,
                            torch.arange(16.) * 4 + 2, indexing="ij")
    bt = 4
    with torch.no_grad():
        emb_fixed = enc(torch.rand(1, 3, 64, 64, generator=gtr))
    for _ in range(1500):
        k = int(torch.randint(1, 4, (1,), generator=gtr))
        pts = torch.rand(bt, k, 2, generator=gtr) * 56 + 4
        d2 = ((gy[None, None] - pts[:, :, 1].reshape(bt, -1, 1, 1)) ** 2
              + (gx[None, None] - pts[:, :, 0].reshape(bt, -1, 1, 1)) ** 2)
        target = torch.stack([
            (d2 < (8 + 5 * s) ** 2).any(dim=1).float() for s in range(4)
        ], dim=1)  # (bt, 4, 16, 16): slot 0 = single-output head
        sparse, dense = pe(points=(pts, torch.ones(bt, k)), boxes=None,
                           masks=None)
        lr_m, iou_p = dec.predict_masks(
            image_embeddings=emb_fixed, image_pe=pe.get_dense_pe(),
            sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(lr_m, target)
        loss = loss + ((iou_p - target.mean(dim=(2, 3))) ** 2).mean()
        opt.zero_grad(); loss.backward(); opt.step()
    dec.eval(); pe.eval()

    generator = SamAutomaticMaskGenerator(
        sam_model, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        sel_pred_iou_thresh=0.0, sel_stability_score_thresh=0.0,
        box_nms_thresh=0.5, output_layer=3, sel_output_layer=3,
        multimask_output=True, sel_multimask_output=True, dense_pred=False,
    )
    score_filter_cfg = dict(emd=0.0, purity=0.02, coverage=0.0,
                            score_filter=True, score=0.6, score_norm=0.4,
                            topk_scores_threshold=0.0)

    def run(seed):
        generator.reset_stored_features()  # per-episode reset (Matcher.clear
        # :1097-1134 does this between episodes in the reference flow)
        rng = np.random.RandomState(seed)
        sup = (rng.randint(0, 256, (1, 1, 3, S, S)) / 255.0).astype(np.float32)
        qry = (rng.randint(0, 256, (1, 3, S, S)) / 255.0).astype(np.float32)
        supm = np.zeros((1, 1, S, S), np.float32)
        supm[..., 16:32, 0:32] = 1  # 8 pooled cells → combinations family
        m = Matcher(
            encoder=dino,
            encoder_transforms=T.Compose([
                T.Normalize((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
            ]),
            use_encoder_registers=True, generator=generator, input_size=S,
            num_centers=8, use_points_or_centers=True, sample_range=(2, 3),
            max_sample_iterations=4, alpha=1.0, beta=0.0, exp=0.0,
            score_filter_cfg=dict(score_filter_cfg), num_merging_mask=10,
            device=torch.device("cpu"),
        )
        m.set_reference(torch.from_numpy(sup), torch.from_numpy(supm))
        m.set_target(torch.from_numpy(qry))
        # predict, stepwise (predict :216-249) to keep the intermediates
        ref_feats, tar_feat = m.extract_img_feats()
        with torch.no_grad():
            all_points, neg_points, box, S_mat, C_mat, _, _ = \
                m.patch_level_matching(ref_feats=ref_feats, tar_feat=tar_feat)
            m.set_rps()
            merged, final_score = m.mask_generation(
                m.tar_img_np, all_points, box, all_points, m.ref_masks_pool,
                C_mat, neg_points)
        unfiltered = (m.unfiltered_generated_masks.numpy() > 0)
        # per-mask scores over the post-NMS set (recomputed with the same
        # helper mask_generation used, get_mask_scores :1152-1210)
        pur, cov, emdv = [], [], []
        for mk in unfiltered:
            p_, c_, e_, *_ = m.rps.get_mask_scores(
                points=all_points, masks=mk[None], all_points=all_points,
                emd_cost=C_mat, ref_masks_pool=m.ref_masks_pool)
            pur.append(float(p_)), cov.append(float(c_)), emdv.append(float(e_))
        pur, cov, emdv = map(np.asarray, (pur, cov, emdv))
        # the raw generator artifacts, regenerated deterministically
        samples_list, label_list = m.rps.sample_points(all_points)
        with torch.no_grad():
            dicts = generator.generate(m.tar_img_np,
                                       select_point_coords=samples_list,
                                       select_point_labels=label_list)
        gmasks = np.stack([d["segmentation"] for d in dicts])
        assert np.array_equal(gmasks, unfiltered), "regen drifted"
        iou_preds = np.asarray([d["predicted_iou"] for d in dicts], np.float32)
        stab = np.asarray([d["stability_score"] for d in dicts], np.float32)
        # top-k-path variant (reference :788-832) on the same episode.
        # The reference's telemetry line :826-827 indexes the (1,H,W) merged
        # mask with pixel coords and ALWAYS IndexErrors on this path; the
        # merge itself completes first (masks_to_merge, :819-821), so
        # recover the union from stored state and recompute the 3 lines the
        # crash precedes (topk-normalized mean, :797-799,840).
        m.score_filter_cfg["score_filter"] = False
        m.score_filter_cfg["topk_scores_threshold"] = 0.2
        try:
            with torch.no_grad():
                merged_tk, final_tk = m.mask_generation(
                    m.tar_img_np, all_points, box, all_points,
                    m.ref_masks_pool, C_mat, neg_points)
            merged_tk = merged_tk.numpy()
        except IndexError:
            merged_tk = (m.masks_to_merge.numpy().sum(0) > 0).astype(np.float32)
            keep_idx = m.metric_filters["purity"].numpy()
            sc = np.sort(emdv[keep_idx])[::-1][:10]
            norm_sc = sc / sc.max()
            final_tk = float(norm_sc[norm_sc > 0.2].mean())
        return dict(sup=sup, supm=supm, qry=qry, points=all_points,
                    s_mat=S_mat.numpy(), cost=C_mat.numpy(),
                    pool=m.ref_masks_pool.numpy(), masks=unfiltered,
                    iou=iou_preds, stab=stab, purity=pur, coverage=cov,
                    emd=emdv, merged=merged.numpy(),
                    final_score=float(final_score),
                    merged_topk=merged_tk,
                    final_topk=float(final_tk))

    def margins(r):
        """Decision margins: every threshold comparison in the flow must sit
        clear of the boundary so kernel-level tolerances (Sinkhorn ~1e-3,
        converters ~1e-5) cannot flip it on the JAX side."""
        n_pts = len(r["points"])
        areas = r["masks"].reshape(len(r["masks"]), -1).sum(1)
        n_live = int((areas > 0).sum())
        if not (4 <= n_pts <= 8) or n_live < 5:
            print(f"  shape: n_pts={n_pts} n_masks={len(r['masks'])} "
                  f"n_live={n_live}")
            return None
        # purity metric filter (thres = min(0.02, max))
        thres_p = min(0.02, r["purity"].max())
        m_pur = np.abs(r["purity"] - thres_p).min()
        keep = r["purity"] >= thres_p
        sc = r["emd"][keep]  # alpha=1, beta=0
        dist = np.sort(1 - sc)
        m_score = np.abs(dist - 0.6).min()
        dnorm = (dist - dist.min()) / (dist.max() + 1e-6)
        m_norm = np.abs(dnorm - 0.4)[1:].min() if len(dnorm) > 1 else 1.0
        n_merged = int(((dist < 0.6) & (dnorm < 0.4)).sum())
        # topk path margin: normalized scores vs 0.2
        m_topk = np.abs(sc / sc.max() - 0.2).min()
        # NMS stability: among post-NMS survivors all pairwise box IoUs sit
        # below the 0.5 threshold with margin (suppression topology frozen);
        # empty masks' [0,0,0,0] boxes always have IoU 0 — skip them
        bx = np.asarray([_mask_box(mm) for mm in r["masks"] if mm.any()],
                        np.float32)
        m_nms = _min_iou_margin(bx, 0.5)
        return dict(n_pts=n_pts, n_masks=len(r["masks"]), n_merged=n_merged,
                    m_pur=m_pur, m_score=m_score, m_norm=m_norm,
                    m_topk=m_topk, m_nms=m_nms)

    def _mask_box(mask):
        ys, xs = np.nonzero(mask)
        return [xs.min(), ys.min(), xs.max(), ys.max()]

    def _min_iou_margin(boxes, thr):
        n = len(boxes)
        best = 1.0
        for i in range(n):
            for j in range(i + 1, n):
                xa = max(boxes[i][0], boxes[j][0]); ya = max(boxes[i][1], boxes[j][1])
                xb = min(boxes[i][2], boxes[j][2]); yb = min(boxes[i][3], boxes[j][3])
                inter = max(0, xb - xa) * max(0, yb - ya)
                a = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
                b = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
                union = a + b - inter
                iou = inter / union if union > 0 else 0.0
                best = min(best, abs(iou - thr))
        return best

    for seed in range(201, 341):
        r = run(seed)
        mg = margins(r)
        print(f"golden matcher seed {seed}: " + (
            "rejected (shape)" if mg is None else
            " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                     for k, v in mg.items())))
        if mg and mg["n_merged"] >= 2 and mg["m_pur"] > 0.004 \
                and mg["m_score"] > 0.02 and mg["m_norm"] > 0.02 \
                and mg["m_topk"] > 0.02 and mg["m_nms"] > 0.015:
            break
    else:
        raise AssertionError("no seed met the margin bar")

    sd = {}
    sd.update({f"dino.{k}": v for k, v in sd_to_np(dino).items()})
    sd.update({f"sam.image_encoder.{k}": v for k, v in sd_to_np(enc).items()})
    sd.update({f"sam.prompt_encoder.{k}": v for k, v in sd_to_np(pe).items()})
    sd.update({f"sam.mask_decoder.{k}": v for k, v in sd_to_np(dec).items()})
    save(
        "golden_matcher_tiny",
        support_images=r["sup"], support_masks=r["supm"],
        query_image=r["qry"],
        s_matrix=r["s_mat"], cost_matrix=r["cost"],
        ref_masks_pool=r["pool"], points=r["points"].astype(np.int64),
        proposals=r["masks"].astype(np.uint8), iou_preds=r["iou"],
        stability=r["stab"], purity=r["purity"], coverage=r["coverage"],
        emd=r["emd"],
        merged=r["merged"], final_score=np.float64(r["final_score"]),
        merged_topk=r["merged_topk"], final_topk=np.float64(r["final_topk"]),
        **flat("sd.", sd),
    )


if __name__ == "__main__":
    # each generator pollutes sys.modules with stubs differently; run the
    # requested subset (default: everything, in isolated subprocesses)
    ALL = ["dinov2", "clip", "alpha_clip", "sam", "amg_multicrop", "pir",
           "vip_llava", "swin", "golden_episode", "golden_matcher"]
    names = sys.argv[1:] or ALL
    if len(names) == 1:
        globals()[f"make_{names[0]}"]()
    else:
        import subprocess
        for n in names:
            subprocess.run([sys.executable, __file__, n], check=True)
