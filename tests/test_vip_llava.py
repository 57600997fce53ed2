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
