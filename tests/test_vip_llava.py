"""ViP-LLaVA JAX port parity vs transformers (tiny random-weight fixture)."""
import os

import jax.numpy as jnp
import numpy as np

from mars_tpu.models import vip_llava as vl

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load():
    data = np.load(os.path.join(FIXTURES, "vip_llava_tiny.npz"))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    rest = {k: data[k] for k in data.files if not k.startswith("sd.")}
    return sd, rest


class TestVipLlava:
    def setup_method(self):
        self.sd, self.d = load()
        self.cfg = vl.TINY
        self.params = vl.convert_hf(self.sd, self.cfg)
        self.pixels = jnp.asarray(np.transpose(self.d["pixels"], (0, 2, 3, 1)))
        self.ids = jnp.asarray(self.d["input_ids"])

    def test_forward_logits_parity(self):
        logits = vl.forward_logits(self.params, self.ids, self.pixels, self.cfg)
        np.testing.assert_allclose(
            np.asarray(logits), self.d["logits"], atol=2e-4, rtol=1e-3
        )

    def test_greedy_generation_parity(self):
        toks = vl.generate_greedy(self.params, self.ids, self.pixels, self.cfg,
                                  max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(toks)[0], self.d["generated"][0])

    def test_image_features_shape(self):
        feats = vl.image_features(self.params, self.pixels, self.cfg)
        assert feats.shape == (1, 16, self.cfg.hidden)


class TestQuantization:
    def test_int8_kernel_roundtrip(self):
        from mars_tpu.models import quantization as Q

        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
        qp = Q.quantize_kernel(w, bits=8)
        back = Q.dequantize_kernel(qp)
        rel = float(jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w)))
        assert rel < 1.0 / 100  # ~1% with 8-bit per-channel

    def test_quantized_vlm_generation(self):
        """int8 weight-only VLM produces near-identical logits and (here)
        identical greedy tokens on the tiny fixture."""
        from mars_tpu.models import quantization as Q

        sd, d = load()
        cfg = vl.TINY
        params = vl.convert_hf(sd, cfg)
        qparams = Q.quantize_params(params, bits=8, min_size=64)
        pixels = jnp.asarray(np.transpose(d["pixels"], (0, 2, 3, 1)))
        ids = jnp.asarray(d["input_ids"])
        ref_logits = vl.forward_logits(params, ids, pixels, cfg)
        q_logits = vl.forward_logits(qparams, ids, pixels, cfg)
        scale = float(jnp.std(ref_logits))
        err = float(jnp.max(jnp.abs(q_logits - ref_logits)))
        assert err < 0.1 * scale, (err, scale)
        toks = vl.generate_greedy(qparams, ids, pixels, cfg, max_new_tokens=6)
        ref = vl.generate_greedy(params, ids, pixels, cfg, max_new_tokens=6)
        # greedy paths should agree on a large majority of steps
        agree = (np.asarray(toks) == np.asarray(ref)).mean()
        assert agree >= 0.5, agree

    def test_int4_runs(self):
        from mars_tpu.models import quantization as Q

        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(128, 64).astype(np.float32))
        qp = Q.quantize_kernel(w, bits=4)
        x = jnp.asarray(rng.randn(2, 128).astype(np.float32))
        y = Q.quantized_dense({"kernel": qp}, x)
        ref = x @ w
        rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.2  # int4 is coarse but bounded

    def test_nf4_vlm_generation(self):
        """NF4-quantized VLM (the reference's --vlm4bit codebook) decodes
        through the full greedy loop; logits stay within the 4-bit budget."""
        from mars_tpu.models import quantization as Q

        sd, d = load()
        cfg = vl.TINY
        params = vl.convert_hf(sd, cfg)
        nfp = Q.quantize_params(params, bits=4, min_size=64,
                                int4_format="nf4")
        def _has_nf4(tree):
            if isinstance(tree, dict):
                return "nf4" in tree or any(_has_nf4(v) for v in tree.values())
            return False

        # dims divisible by the 64-block get NF4; others (TINY's 32-dim
        # inputs) legitimately fall back to affine int4
        assert _has_nf4(nfp)
        pixels = jnp.asarray(np.transpose(d["pixels"], (0, 2, 3, 1)))
        ids = jnp.asarray(d["input_ids"])
        ref_logits = vl.forward_logits(params, ids, pixels, cfg)
        q_logits = vl.forward_logits(nfp, ids, pixels, cfg)
        scale = float(jnp.std(ref_logits))
        err = float(jnp.max(jnp.abs(q_logits - ref_logits)))
        assert err < 0.8 * scale, (err, scale)  # 4-bit: coarse but bounded
        toks = vl.generate_greedy(nfp, ids, pixels, cfg, max_new_tokens=4)
        assert np.asarray(toks).shape[-1] >= 4


def test_bucketed_prompt_matches_exact():
    """Right-padded prompt + true_length must produce the same greedy tokens
    as the exact-length call (the pad slots are causally masked)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mars_tpu.models import vip_llava as vl

    cfg = vl.TINY
    p = vl.init_random_params(3, cfg, dtype=jnp.float32)
    g = (cfg.image_size // cfg.patch_size) ** 2
    l0 = 9 + g
    ids = np.full((1, l0), 5, np.int64)
    ids[0, 3:3 + g] = cfg.image_token_index
    pixels = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    exact = vl.generate_greedy(p, jnp.asarray(ids), pixels, cfg, max_new_tokens=6)
    padded = np.pad(ids, ((0, 0), (0, 24 - (l0 % 24))))
    bucketed = vl.generate_greedy(p, jnp.asarray(padded), pixels, cfg,
                                  max_new_tokens=6, true_length=jnp.int32(l0))
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(bucketed))


def test_batched_variable_length_matches_per_row():
    """A (B,) true_length batch of different-length prompts must reproduce
    each row's individual greedy decode (per-row start positions + per-row
    KV writes; the retriever's batched ensemble path)."""
    import jax.numpy as jnp
    import numpy as np

    from mars_tpu.models import vip_llava as vl

    cfg = vl.TINY
    p = vl.init_random_params(7, cfg, dtype=jnp.float32)
    g = (cfg.image_size // cfg.patch_size) ** 2
    rng = np.random.RandomState(1)
    lens = [g + 5, g + 11, g + 17]
    bucket = max(lens) + 7  # deliberately unaligned pad target
    ids = np.zeros((3, bucket), np.int64)
    pixels = jnp.asarray(rng.rand(3, 56, 56, 3), jnp.float32)
    for r, l in enumerate(lens):
        row = rng.randint(1, cfg.vocab, size=l)
        row[2 : 2 + g] = cfg.image_token_index
        ids[r, :l] = row
    batched = vl.generate_greedy(
        p, jnp.asarray(ids), pixels, cfg, max_new_tokens=5,
        true_length=jnp.asarray(lens, jnp.int32),
    )
    for r, l in enumerate(lens):
        single = vl.generate_greedy(
            p, jnp.asarray(ids[r : r + 1]), pixels[r : r + 1], cfg,
            max_new_tokens=5, true_length=jnp.int32(l),
        )
        np.testing.assert_array_equal(np.asarray(batched)[r],
                                      np.asarray(single)[0], err_msg=f"row {r}")
