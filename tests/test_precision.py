"""bf16 tower path: numerics stay close to f32 (LN/softmax/PIR are f32)."""
import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.models import dinov2
from mars_tpu.models.precision import cast_floating
from mars_tpu.pipeline import vva


def test_dinov2_bf16_close_to_f32():
    cfg = dinov2.DinoV2Config(
        patch_size=14, embed_dim=64, depth=3, num_heads=2,
        num_register_tokens=4, pos_embed_grid=4,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 56, 56, 3))
    ref = dinov2.forward_features(params, x, cfg, attn_tap_last_n=2)
    out = dinov2.forward_features(cast_floating(params), x, cfg, attn_tap_last_n=2)
    rel = np.abs(np.asarray(out["x_prenorm"], np.float32) - np.asarray(ref["x_prenorm"])).max()
    scale = np.abs(np.asarray(ref["x_prenorm"])).max()
    assert rel / scale < 0.05, (rel, scale)
    # attn stats stay f32
    assert out["attn_mean"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out["attn_mean"]), np.asarray(ref["attn_mean"]), atol=0.02
    )


def test_vva_bf16_pipeline():
    cfg = dinov2.DinoV2Config(
        patch_size=14, embed_dim=64, depth=2, num_heads=2,
        num_register_tokens=4, pos_embed_grid=4,
    )
    params = cast_floating(dinov2.init_params(jax.random.PRNGKey(0), cfg))
    vcfg = vva.VVAConfig(grid=4, attn_tap_last_n=2)
    sup = jax.random.uniform(jax.random.PRNGKey(1), (1, 56, 56, 3))
    qry = jax.random.uniform(jax.random.PRNGKey(2), (56, 56, 3))
    masks = jnp.zeros((1, 56, 56)).at[:, 10:40, 10:40].set(1.0)
    prior, cost, fg = vva.compute(params, sup, masks, jnp.ones(1, bool), qry, cfg, vcfg)
    assert prior.dtype == jnp.float32
    assert cost.dtype == jnp.float32
    assert np.isfinite(np.asarray(prior)).all()
    assert 0.0 <= float(prior.min()) and float(prior.max()) <= 1.0


def test_dinov2_int8_weights_close_to_f32():
    from mars_tpu.models.quantization import quantize_params

    cfg = dinov2.DinoV2Config(
        patch_size=14, embed_dim=64, depth=3, num_heads=2,
        num_register_tokens=4, pos_embed_grid=4,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 56, 56, 3))
    ref = dinov2.forward_features(params, x, cfg, attn_tap_last_n=2)
    # min_size=0: tiny test kernels must still quantize
    qp = quantize_params(params, bits=8, min_size=0)
    out = dinov2.forward_features(qp, x, cfg, attn_tap_last_n=2)
    rel = np.abs(np.asarray(out["x_prenorm"], np.float32)
                 - np.asarray(ref["x_prenorm"])).max()
    scale = np.abs(np.asarray(ref["x_prenorm"])).max()
    assert rel / scale < 0.08, (rel, scale)
    np.testing.assert_allclose(
        np.asarray(out["attn_mean"]), np.asarray(ref["attn_mean"]), atol=0.03
    )


def test_w8a8_dense_accuracy():
    """Dynamic-activation int8 x int8 kernels (quantize_params(act_bits=8)):
    s8xs8->s32 MXU matmuls with per-row x per-column rescale."""
    import jax

    from mars_tpu.models import layers as L
    from mars_tpu.models.quantization import quantize_params

    rng = np.random.RandomState(0)
    w = rng.randn(256, 128).astype(np.float32)
    b = rng.randn(128).astype(np.float32)
    x = rng.randn(4, 37, 256).astype(np.float32)
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    qp = quantize_params({"d": p}, bits=8, min_size=0, act_bits=8)["d"]
    assert "act8" in qp["kernel"]
    got = np.asarray(L.dense(qp, jnp.asarray(x)))
    want = x @ w + b
    # w8a8 error budget: ~1% relative on random gaussians
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 0.02, err.mean()
    # weight-only path untouched
    q8 = quantize_params({"d": p}, bits=8, min_size=0)["d"]
    assert "act8" not in q8["kernel"]
