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


def test_nf4_quantize_matches_numpy_oracle():
    """NF4 rounding (searchsorted on midpoints) == independent argmin over
    the published codebook, and block scales reproduce bnb's per-64 absmax
    (reference --vlm4bit numerics, TextRetrieverModule.py:468-471)."""
    from mars_tpu.models.quantization import (
        NF4_CODE, dequantize_nf4, quantize_kernel_nf4)

    rng = np.random.RandomState(7)
    w = (rng.randn(256, 48) * rng.gamma(1.0, 1.0, (1, 48))).astype(np.float32)
    leaf = quantize_kernel_nf4(jnp.asarray(w), 64)
    got = np.asarray(dequantize_nf4(leaf))

    # independent numpy re-derivation: per-block absmax, nearest code value
    wf = w.reshape(4, 64, 48)
    bscale = np.abs(wf).max(axis=1)                     # (4, 48)
    xn = wf / np.maximum(bscale, 1e-12)[:, None, :]
    idx = np.abs(xn[..., None] - NF4_CODE).argmin(-1)   # nearest VALUE
    want = (NF4_CODE[idx] * bscale[:, None, :]).reshape(256, 48)
    np.testing.assert_allclose(got, want, atol=1e-7)
    np.testing.assert_allclose(np.asarray(leaf["bscale"]), bscale, rtol=1e-6)
    # exact zero survives (code 7 is 0.0) and ±absmax round-trips exactly
    w2 = w.copy()
    w2[0, :] = 0.0
    leaf2 = quantize_kernel_nf4(jnp.asarray(w2), 64)
    got2 = np.asarray(dequantize_nf4(leaf2))
    assert (got2[0] == 0.0).all()


def test_nf4_dense_path():
    """quantize_params(int4_format="nf4") leaves flow through layers.dense;
    error on gaussian weights beats uniform-affine int4 (the NF4 pitch)."""
    from mars_tpu.models import layers as L
    from mars_tpu.models.quantization import quantize_params

    rng = np.random.RandomState(3)
    w = rng.randn(384, 128).astype(np.float32)
    b = rng.randn(128).astype(np.float32)
    x = rng.randn(5, 384).astype(np.float32)
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    nf = quantize_params({"d": p}, bits=4, min_size=0, int4_format="nf4")["d"]
    assert "nf4" in nf["kernel"] and "bscale" in nf["kernel"]
    aff = quantize_params({"d": p}, bits=4, min_size=0)["d"]
    assert "q4" in aff["kernel"]
    want = x @ w + b
    err_nf = np.abs(np.asarray(L.dense(nf, jnp.asarray(x))) - want).mean()
    err_af = np.abs(np.asarray(L.dense(aff, jnp.asarray(x))) - want).mean()
    assert err_nf < err_af, (err_nf, err_af)
    # 4-bit noise floor at 384-dim dots is ~sqrt(384)*sigma_q/|y| ~ 0.09
    rel = err_nf / (np.abs(want).mean() + 1e-6)
    assert rel < 0.12, rel
