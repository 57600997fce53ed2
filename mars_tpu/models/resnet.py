"""ResNet (torchvision v1.5 dialect) — the alternative Matcher encoder.

The reference's BackboneLoader offers resnet18/34/50/101/152 trunks whose
stride-32 feature maps feed the Matcher's 'convnets' path (reference:
utils/backbone_loader.py:100-151, matcher/Matcher.py:286-288).  This is the
functional JAX equivalent: inference-mode ResNet with BatchNorm folded into
per-channel scale/bias at conversion time (frozen backbone → BN is affine),
v1.5 semantics (the 3x3 conv carries the stride).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BOTTLENECK_LAYERS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


@dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 23, 3)  # resnet101
    width: int = 64
    patch_size: int = 32  # downsampling factor ("patch size" per the loader)
    embed_dim: int = 2048


def _conv(p, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x):
    """Folded inference BatchNorm: y = x * scale + bias."""
    return x * p["scale"] + p["bias"]


def _bottleneck(p, x, stride):
    identity = x
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    h = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], h, stride=stride)))
    h = _bn(p["bn3"], _conv(p["conv3"], h))
    if "downsample" in p:
        identity = _bn(p["downsample"]["bn"], _conv(p["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(h + identity)


def forward_features(params, images, cfg: ResNetConfig):
    """(B, H, W, 3) normalized → (B, H/32, W/32, embed_dim)."""
    x = jax.lax.conv_general_dilated(
        images, params["stem"]["kernel"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.nn.relu(_bn(params["stem_bn"], x))
    # torch maxpool 3x3/2 pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for s, n in enumerate(cfg.layers):
        for b in range(n):
            stride = 2 if (b == 0 and s > 0) else 1
            x = _bottleneck(params[f"layer{s + 1}"][f"block{b}"], x, stride)
    return x


def patch_features(feat_map: jnp.ndarray, l2_normalize: bool = True) -> jnp.ndarray:
    """(B, h, w, C) → (B·h·w, C), the Matcher's convnets feature layout
    (reference Matcher.py:286-292)."""
    f = feat_map.reshape(-1, feat_map.shape[-1])
    if l2_normalize:
        f = f / jnp.clip(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    return f


def convert_torchvision(sd: dict, cfg: ResNetConfig) -> dict:
    """torchvision state_dict (numpy) → folded-BN param pytree."""

    def conv(k):
        return {"kernel": np.ascontiguousarray(np.transpose(sd[k], (2, 3, 1, 0)))}

    def bn(prefix, eps=1e-5):
        w, b = sd[prefix + ".weight"], sd[prefix + ".bias"]
        mean, var = sd[prefix + ".running_mean"], sd[prefix + ".running_var"]
        scale = w / np.sqrt(var + eps)
        return {"scale": scale.astype(np.float32),
                "bias": (b - mean * scale).astype(np.float32)}

    params = {"stem": conv("conv1.weight"), "stem_bn": bn("bn1")}
    for s, n in enumerate(cfg.layers):
        stage = {}
        for i in range(n):
            pre = f"layer{s + 1}.{i}"
            blk = {
                "conv1": conv(pre + ".conv1.weight"), "bn1": bn(pre + ".bn1"),
                "conv2": conv(pre + ".conv2.weight"), "bn2": bn(pre + ".bn2"),
                "conv3": conv(pre + ".conv3.weight"), "bn3": bn(pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": conv(pre + ".downsample.0.weight"),
                    "bn": bn(pre + ".downsample.1"),
                }
            params[f"layer{s + 1}"] = stage
            stage[f"block{i}"] = blk
    return params


def init_params(key, cfg: ResNetConfig):
    """Random params (shape-correct) for tests."""
    gen = np.random.default_rng(0)

    def conv(kh, kw, ci, co):
        return {"kernel": jnp.asarray(
            gen.standard_normal((kh, kw, ci, co), dtype=np.float32) * 0.05)}

    def bn(c):
        return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    params = {"stem": conv(7, 7, 3, cfg.width), "stem_bn": bn(cfg.width)}
    cin = cfg.width
    for s, n in enumerate(cfg.layers):
        planes = cfg.width * (2 ** s)
        cout = planes * 4
        stage = {}
        for b in range(n):
            blk = {
                "conv1": conv(1, 1, cin, planes), "bn1": bn(planes),
                "conv2": conv(3, 3, planes, planes), "bn2": bn(planes),
                "conv3": conv(1, 1, planes, cout), "bn3": bn(cout),
            }
            if b == 0:
                blk["downsample"] = {"conv": conv(1, 1, cin, cout), "bn": bn(cout)}
            stage[f"block{b}"] = blk
            cin = cout
        params[f"layer{s + 1}"] = stage
    return params
