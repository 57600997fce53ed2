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


class TestEosDecoding:
    """HF-generate semantics: EOS freeze + early exit (lax.while_loop) and
    min_new_tokens EOS suppression (the reference's definition query uses
    min_new_tokens=20, TextRetrieverModule.py:118)."""

    def setup_method(self):
        self.sd, self.d = load()
        self.cfg = vl.TINY
        self.params = vl.convert_hf(self.sd, self.cfg)
        self.pixels = jnp.asarray(np.transpose(self.d["pixels"], (0, 2, 3, 1)))
        self.ids = jnp.asarray(self.d["input_ids"])
        self.ref = [int(t) for t in self.d["generated"][0]]  # 6 greedy toks

    def test_eos_freezes_and_fills(self):
        """Declare the token greedily emitted at step 2 as EOS: output must
        equal the unconstrained greedy prefix through its first occurrence,
        then EOS-fill — the while_loop exits without touching later slots."""
        eos = self.ref[2]
        j = self.ref.index(eos)
        toks = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos))[0]
        want = self.ref[: j + 1] + [eos] * (6 - j - 1)
        np.testing.assert_array_equal(toks, want)

    def test_no_eos_hit_matches_scan_path(self):
        """With an EOS id the model never emits, the while_loop path must
        reproduce the fixed-trip scan path token for token."""
        eos = next(t for t in range(self.cfg.vocab) if t not in self.ref)
        toks = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos))[0]
        np.testing.assert_array_equal(toks, self.ref)

    def test_min_new_tokens_suppresses_eos(self):
        """EOS masked for the first min_new_tokens slots; oracle = greedy
        loop over full-sequence forward_logits with the same masking."""
        eos = self.ref[0]  # would otherwise terminate immediately
        got = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos, min_new_tokens=3))[0]
        assert not (got[:3] == eos).any()

        cur = np.asarray(self.ids)
        want = []
        for i in range(6):
            logits = np.asarray(vl.forward_logits(
                self.params, jnp.asarray(cur), self.pixels, self.cfg))[0, -1]
            if i < 3:
                logits = logits.copy()
                logits[eos] = -np.inf
            nxt = int(np.argmax(logits))
            want.append(nxt)
            if nxt == eos:
                want.extend([eos] * (6 - len(want)))
                break
            cur = np.concatenate([cur, [[nxt]]], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_batched_rows_freeze_independently(self):
        """(B,) true_length + eos: each row freezes on its own; identical
        rows reproduce the B=1 result."""
        eos = self.ref[2]
        l0 = self.ids.shape[1]
        ids2 = jnp.concatenate([self.ids, self.ids], axis=0)
        px2 = jnp.concatenate([self.pixels, self.pixels], axis=0)
        toks = np.asarray(vl.generate_greedy(
            self.params, ids2, px2, self.cfg, max_new_tokens=6, eos_id=eos,
            true_length=jnp.asarray([l0, l0], jnp.int32)))
        single = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos))[0]
        np.testing.assert_array_equal(toks[0], single)
        np.testing.assert_array_equal(toks[1], single)

    def test_per_row_min_new_tokens(self):
        """A (B,) min_new_tokens tuple applies a different EOS floor per
        row — the pipelined text stage batches a min-20 definition row with
        min-0 name rows; each row must match its solo-decode result."""
        eos = self.ref[0]  # row with min 0 freezes immediately
        l0 = self.ids.shape[1]
        ids2 = jnp.concatenate([self.ids, self.ids], axis=0)
        px2 = jnp.concatenate([self.pixels, self.pixels], axis=0)
        toks = np.asarray(vl.generate_greedy(
            self.params, ids2, px2, self.cfg, max_new_tokens=6, eos_id=eos,
            min_new_tokens=(0, 3),
            true_length=jnp.asarray([l0, l0], jnp.int32)))
        for row, mnt in ((0, 0), (1, 3)):
            solo = np.asarray(vl.generate_greedy(
                self.params, self.ids, self.pixels, self.cfg,
                max_new_tokens=6, eos_id=eos, min_new_tokens=mnt))[0]
            np.testing.assert_array_equal(toks[row], solo)


class TestSpeculativeDecoding:
    """Prompt-lookup speculative decode (draft_tokens>0) is EXACT greedy:
    bit-identical to the plain scan / EOS while_loop paths for any weights
    and prompt — acceptance only changes how many forwards it takes."""

    def setup_method(self):
        self.sd, self.d = load()
        self.cfg = vl.TINY
        self.params = vl.convert_hf(self.sd, self.cfg)
        self.pixels = jnp.asarray(np.transpose(self.d["pixels"], (0, 2, 3, 1)))
        self.ids = jnp.asarray(self.d["input_ids"])

    def test_draft_lookup_unit(self):
        """The drafter copies the continuation of the most recent earlier
        occurrence of the trailing n-gram."""
        seq = jnp.asarray([9, 1, 2, 3, 7, 7, 1, 2, 3, 5, 6, 1, 2, 3, -1, -1])
        # end=13 → trailing 3-gram (1,2,3); most recent earlier match ends
        # at 8, so drafts = seq[9:9+4] = 5, 6, 1, 2
        d = np.asarray(vl._prompt_lookup_draft(seq, jnp.int32(13), 3, 4))
        np.testing.assert_array_equal(d, [5, 6, 1, 2])
        # no match anywhere → garbage draft (clamped slice), never crashes
        seq2 = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8])
        d2 = np.asarray(vl._prompt_lookup_draft(seq2, jnp.int32(7), 3, 4))
        assert d2.shape == (4,)

    def test_matches_scan_path(self):
        ref = vl.generate_greedy(self.params, self.ids, self.pixels, self.cfg,
                                 max_new_tokens=6)
        for K in (2, 8):
            got = vl.generate_greedy(self.params, self.ids, self.pixels,
                                     self.cfg, max_new_tokens=6,
                                     draft_tokens=K)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                          err_msg=f"K={K}")

    def test_matches_eos_path_with_eos_hit(self):
        ref6 = [int(t) for t in self.d["generated"][0]]
        eos = ref6[2]
        want = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos))
        got = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos, draft_tokens=4))
        np.testing.assert_array_equal(got, want)

    def test_matches_eos_path_min_new_tokens(self):
        ref6 = [int(t) for t in self.d["generated"][0]]
        eos = ref6[0]
        want = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos, min_new_tokens=3))
        got = np.asarray(vl.generate_greedy(
            self.params, self.ids, self.pixels, self.cfg, max_new_tokens=6,
            eos_id=eos, min_new_tokens=3, draft_tokens=4))
        np.testing.assert_array_equal(got, want)

    def test_long_generation_many_seeds_exact(self):
        """Long budgets on tiny random models fall into repetition loops —
        the drafter then accepts multi-token runs, stressing the KV-cache
        overwrite and seq bookkeeping.  Output must stay bit-exact."""
        import jax

        cfg = self.cfg
        g = (cfg.image_size // cfg.patch_size) ** 2
        for seed in range(3):
            p = vl.init_random_params(seed, cfg, dtype=jnp.float32)
            rng = np.random.RandomState(seed)
            l0 = g + 7
            ids = np.zeros((1, l0), np.int64)
            ids[0] = rng.randint(1, cfg.vocab, size=l0)
            ids[0, 2:2 + g] = cfg.image_token_index
            pixels = jnp.asarray(rng.rand(1, 56, 56, 3), jnp.float32)
            ref = vl.generate_greedy(p, jnp.asarray(ids), pixels, cfg,
                                     max_new_tokens=24)
            got = vl.generate_greedy(p, jnp.asarray(ids), pixels, cfg,
                                     max_new_tokens=24, draft_tokens=6)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                          err_msg=f"seed {seed}")

    def test_bucketed_true_length_exact(self):
        """Speculative + right-padded bucket + scalar true_length (the
        retriever's production single-query path)."""
        cfg = self.cfg
        p = vl.init_random_params(11, cfg, dtype=jnp.float32)
        g = (cfg.image_size // cfg.patch_size) ** 2
        l0 = g + 9
        ids = np.full((1, l0), 5, np.int64)
        ids[0, 3:3 + g] = cfg.image_token_index
        pixels = jnp.asarray(np.random.RandomState(2).rand(1, 56, 56, 3),
                             jnp.float32)
        padded = np.pad(ids, ((0, 0), (0, 16)))
        want = vl.generate_greedy(p, jnp.asarray(padded), pixels, cfg,
                                  max_new_tokens=10, true_length=jnp.int32(l0),
                                  eos_id=3)
        got = vl.generate_greedy(p, jnp.asarray(padded), pixels, cfg,
                                 max_new_tokens=10, true_length=jnp.int32(l0),
                                 eos_id=3, draft_tokens=5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_batched_matches_plain_batched(self):
        """B=2 speculative == B=2 plain (same rows, identical output),
        on both the fixed-trip and the EOS paths."""
        ids2 = jnp.concatenate([self.ids, self.ids], axis=0)
        px2 = jnp.concatenate([self.pixels, self.pixels], axis=0)
        for eos in (None, int(self.d["generated"][0][2])):
            want = vl.generate_greedy(self.params, ids2, px2, self.cfg,
                                      max_new_tokens=6, eos_id=eos)
            got = vl.generate_greedy(self.params, ids2, px2, self.cfg,
                                     max_new_tokens=6, eos_id=eos,
                                     draft_tokens=4)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"eos={eos}")

    def test_batched_variable_rows_match_per_row(self):
        """Rows with DIFFERENT prompts/lengths (per-row true_length,
        bucketed) + per-row acceptance rates: the batched speculative
        decode must equal each row decoded alone (plain), incl. EOS
        freezing at different steps and min_new_tokens."""
        cfg = self.cfg
        g = (cfg.image_size // cfg.patch_size) ** 2
        p = vl.init_random_params(3, cfg, dtype=jnp.float32)
        rng = np.random.RandomState(0)
        b, bucket = 3, g + 32
        lens = [g + 7, g + 19, g + 11]
        ids = np.zeros((b, bucket), np.int64)
        for r, ln in enumerate(lens):
            ids[r, :ln] = rng.randint(1, cfg.vocab, size=ln)
            ids[r, 2:2 + g] = cfg.image_token_index
        pixels = jnp.asarray(rng.rand(b, cfg.image_size, cfg.image_size, 3),
                             jnp.float32)
        tl = jnp.asarray(lens, jnp.int32)
        # per-row tuple min (the pipelined text stage's mixed floors) rides
        # the same paths as the scalar
        for eos, mnt in ((None, 0), (3, 0), (3, 4), (3, (0, 4, 2))):
            want = vl.generate_greedy(
                p, jnp.asarray(ids), pixels, cfg, max_new_tokens=12,
                true_length=tl, eos_id=eos, min_new_tokens=mnt)
            got = vl.generate_greedy(
                p, jnp.asarray(ids), pixels, cfg, max_new_tokens=12,
                true_length=tl, eos_id=eos, min_new_tokens=mnt,
                draft_tokens=5)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want),
                err_msg=f"eos={eos} min_new_tokens={mnt}")
            # and each row alone through the B=1 speculative path
            for r in range(b):
                solo = vl.generate_greedy(
                    p, jnp.asarray(ids[r:r + 1]), pixels[r:r + 1], cfg,
                    max_new_tokens=12, true_length=tl[r:r + 1], eos_id=eos,
                    min_new_tokens=(mnt[r] if isinstance(mnt, tuple) else mnt),
                    draft_tokens=5)
                np.testing.assert_array_equal(
                    np.asarray(solo[0]), np.asarray(want[r]),
                    err_msg=f"row {r} eos={eos} mnt={mnt}")

    def test_batched_full_acceptance_chains(self, monkeypatch):
        """Stub Markov LM at B=2 with different cycle phases: both rows
        reach full acceptance every round → ceil(N/(K+1)) forwards total
        (the batched generalization of test_full_acceptance_chains)."""
        import jax

        V = 8

        def stub_forward(lang, emb, positions, cfg, caches=None, pos0=None):
            ids = jnp.argmax(emb, axis=-1)
            logits = jax.nn.one_hot((ids + 1) % V, V) * 10.0
            return logits, caches

        monkeypatch.setattr(vl, "llama_forward", stub_forward)
        p = {"language": {"embed_tokens": jnp.eye(V, dtype=jnp.float32)}}
        prompt = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7, 0, 1],
                              [3, 4, 5, 6, 7, 0, 1, 2, 3, 4]], jnp.int32)
        N, K = 24, 5
        buf, rounds, _ = vl._speculative_greedy_batched(
            p, self.cfg, prompt, [], jnp.asarray([2, 5], jnp.int32),
            jnp.full((2,), prompt.shape[1], jnp.int32), N, None, 0, K, 3)
        np.testing.assert_array_equal(
            np.asarray(buf[0]), (2 + np.arange(N)) % V)
        np.testing.assert_array_equal(
            np.asarray(buf[1]), (5 + np.arange(N)) % V)
        assert int(rounds) == -(-N // (K + 1)), int(rounds)

    def test_full_acceptance_chains(self, monkeypatch):
        """On perfectly periodic output the drafter must reach full
        acceptance EVERY round — ceil(N/(K+1)) forwards total.  Regression:
        the carry token used to land in the lookup buffer only after the
        verify, so the gram slot was stale on round 0 and after each full-K
        round, making every other round a wasted 1-token forward (~2x the
        rounds).  Uses a stub Markov LM (next = (tok+1) mod V) so greedy
        output is an exact known cycle."""
        import jax

        V = 8

        def stub_forward(lang, emb, positions, cfg, caches=None, pos0=None):
            ids = jnp.argmax(emb, axis=-1)  # eye embed ⇒ row == onehot(id)
            logits = jax.nn.one_hot((ids + 1) % V, V) * 10.0
            return logits, caches

        monkeypatch.setattr(vl, "llama_forward", stub_forward)
        p = {"language": {"embed_tokens": jnp.eye(V, dtype=jnp.float32)}}
        prompt = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7, 0, 1]], jnp.int32)
        N, K = 24, 5
        buf, rounds, _ = vl._speculative_greedy(
            p, self.cfg, prompt, [], jnp.asarray([2], jnp.int32),
            jnp.int32(prompt.shape[1]), N, None, 0, K, 3)
        np.testing.assert_array_equal(
            np.asarray(buf[0]), (2 + np.arange(N)) % V)
        assert int(rounds) == -(-N // (K + 1)), (
            f"{int(rounds)} verify forwards for {N} tokens at K={K} — "
            "full-acceptance rounds are not chaining")


class TestSpeculationGating:
    """Acceptance gating (draft_gate > 0, the round-5 default): the loop
    probes with plain 1-position steps — scoring the lookup's first draft
    token against the emitted token for free — and only pays K+1-position
    verify forwards after ``gate`` consecutive hits.  Round-4 bench
    measured the UNGATED loop at 0.88x plain on definition-like filler;
    gated, non-drafting output must decode at plain cost (zero verifies)
    while self-repeating output must still chain multi-token accepts."""

    def setup_method(self):
        self.sd, self.d = load()
        self.cfg = vl.TINY
        self.params = vl.convert_hf(self.sd, self.cfg)
        self.pixels = jnp.asarray(np.transpose(self.d["pixels"], (0, 2, 3, 1)))
        self.ids = jnp.asarray(self.d["input_ids"])

    def test_gated_equals_ungated_equals_plain(self):
        """Real tiny model: gate 0/1/2 all emit identical exact-greedy
        tokens on the single-row and batched EOS paths."""
        ids2 = jnp.concatenate([self.ids, self.ids], axis=0)
        px2 = jnp.concatenate([self.pixels, self.pixels], axis=0)
        eos = int(self.d["generated"][0][2])
        for ids, px in ((self.ids, self.pixels), (ids2, px2)):
            want = vl.generate_greedy(self.params, ids, px, self.cfg,
                                      max_new_tokens=6, eos_id=eos)
            for gate in (0, 1, 2):
                got = vl.generate_greedy(self.params, ids, px, self.cfg,
                                         max_new_tokens=6, eos_id=eos,
                                         draft_tokens=4, draft_gate=gate)
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"B={ids.shape[0]} gate={gate}")

    @staticmethod
    def _poisoned_stub(V, step, mult=1):
        """Markov stub next = (mult*tok + step) % V whose MULTI-position
        (verify) results are poisoned: if the gated loop ever runs a
        verify forward, the emitted carry comes out wrong and the output
        assertion fails — proving zero verifies, i.e. plain-cost decode."""
        import jax

        def stub_forward(lang, emb, positions, cfg, caches=None, pos0=None):
            ids = jnp.argmax(emb, axis=-1)
            logits = jax.nn.one_hot((mult * ids + step) % V, V) * 10.0
            if emb.shape[1] > 1:
                logits = -logits
            return logits, caches

        return stub_forward

    def test_nonpredictive_output_never_verifies(self, monkeypatch):
        """Long-orbit LM (next = 5*tok+7 mod 101): the lookup never finds
        a matching n-gram twice in a row, so a gated loop must stay in
        probe mode — the poisoned verify branch proves it by corrupting
        output if it is ever taken."""
        V, N, K = 101, 16, 5
        monkeypatch.setattr(
            vl, "llama_forward", self._poisoned_stub(V, 7, mult=5))
        p = {"language": {"embed_tokens": jnp.eye(V, dtype=jnp.float32)}}
        prompt = jnp.asarray([[11, 23, 37, 41, 53, 67, 71, 83]], jnp.int32)
        t0 = 2
        want = []
        t = t0
        for _ in range(N):
            want.append(t)
            t = (5 * t + 7) % V
        buf, rounds, _ = vl._speculative_greedy(
            p, self.cfg, prompt, [], jnp.asarray([t0], jnp.int32),
            jnp.int32(prompt.shape[1]), N, None, 0, K, 3, gate=2)
        np.testing.assert_array_equal(np.asarray(buf[0]), want)
        assert int(rounds) == N  # pure probe: one token per iteration

    def test_reentry_after_output_turns_repetitive(self, monkeypatch):
        """Piecewise LM: a non-repeating ramp (0→1→…→30) followed by a
        6-cycle (30..35).  The gated loop must probe through the ramp,
        detect the cycle, and re-enter verify mode — finishing in fewer
        rounds than tokens while staying exact."""
        import jax

        V, N, K = 64, 40, 5

        def stub_forward(lang, emb, positions, cfg, caches=None, pos0=None):
            ids = jnp.argmax(emb, axis=-1)
            nxt = jnp.where(ids < 30, ids + 1, 30 + (ids - 30 + 1) % 6)
            return jax.nn.one_hot(nxt, V) * 10.0, caches

        monkeypatch.setattr(vl, "llama_forward", stub_forward)
        p = {"language": {"embed_tokens": jnp.eye(V, dtype=jnp.float32)}}
        prompt = jnp.asarray([[50, 51, 52, 53, 54, 55, 56, 57]], jnp.int32)
        t0 = 20
        want, t = [], t0
        for _ in range(N):
            want.append(t)
            t = t + 1 if t < 30 else 30 + (t - 30 + 1) % 6
        buf, rounds, _ = vl._speculative_greedy(
            p, self.cfg, prompt, [], jnp.asarray([t0], jnp.int32),
            jnp.int32(prompt.shape[1]), N, None, 0, K, 3, gate=2)
        np.testing.assert_array_equal(np.asarray(buf[0]), want)
        # ramp ≈ 11 probe rounds + cycle detection, then K+1-token chains
        # over the remaining ~29 tokens — well under one round per token
        assert int(rounds) <= N - 8, int(rounds)

    def test_batched_laggard_gate_never_verifies(self, monkeypatch):
        """B=2, drafting leader + never-drafting laggard at EQUAL
        progress: the laggard gate must keep the batch in probe mode (a
        verify round would cost every row K extra positions and save zero
        rounds, since rounds are paced by the non-accepting laggard) —
        the poisoned verify branch proves zero verifies."""
        import jax

        V, N, K = 101, 16, 5

        def stub_forward(lang, emb, positions, cfg, caches=None, pos0=None):
            ids = jnp.argmax(emb, axis=-1)
            nxt = jnp.where(ids < 8, (ids + 1) % 8,
                            jnp.maximum((5 * ids + 7) % V, 9))
            logits = jax.nn.one_hot(nxt, V) * 10.0
            if emb.shape[1] > 1:  # poison any verify forward
                logits = -logits
            return logits, caches

        monkeypatch.setattr(vl, "llama_forward", stub_forward)
        p = {"language": {"embed_tokens": jnp.eye(V, dtype=jnp.float32)}}
        prompt = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7, 0, 1],
                              [11, 23, 37, 41, 53, 67, 71, 83, 97, 13]],
                             jnp.int32)
        t0 = [2, 15]
        want = []
        for t in t0:
            seq = []
            for _ in range(N):
                seq.append(t)
                t = (t + 1) % 8 if t < 8 else max((5 * t + 7) % V, 9)
            want.append(seq)
        buf, rounds, _ = vl._speculative_greedy_batched(
            p, self.cfg, prompt, [], jnp.asarray(t0, jnp.int32),
            jnp.full((2,), prompt.shape[1], jnp.int32), N, None, 0, K, 3,
            gate=2)
        np.testing.assert_array_equal(np.asarray(buf[0]), want[0])
        np.testing.assert_array_equal(np.asarray(buf[1]), want[1])
        assert int(rounds) == N  # pure probe: plain batched cost

    def test_batched_mixed_rows_engage_and_stay_exact(self, monkeypatch):
        """B=2, one self-repeating row (drafts well) + one long-orbit row
        (never drafts): under the laggard gate the non-drafting row keeps
        the batch in probe mode (one emit/round, plain cost) while both
        rows stay exact greedy; a fully-drafting batch still engages
        verify and chains."""
        import jax

        V, N, K = 101, 24, 5

        def stub_forward(lang, emb, positions, cfg, caches=None, pos0=None):
            ids = jnp.argmax(emb, axis=-1)
            # row semantics are per-token, so one rule: small ids cycle
            # (mod 8), large ids orbit (5t+7 mod 101, clamped above 8)
            cyc = ids % 8
            orb = (5 * ids + 7) % V
            orb = jnp.where(orb < 9, orb + 9, orb)
            nxt = jnp.where(ids < 8, (cyc + 1) % 8, orb)
            return jax.nn.one_hot(nxt, V) * 10.0, caches

        monkeypatch.setattr(vl, "llama_forward", stub_forward)
        p = {"language": {"embed_tokens": jnp.eye(V, dtype=jnp.float32)}}
        prompt = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7, 0, 1],
                              [11, 23, 37, 41, 53, 67, 71, 83, 97, 13]],
                             jnp.int32)
        t0 = [2, 15]
        want = []
        for r, t in enumerate(t0):
            seq = []
            for _ in range(N):
                seq.append(t)
                if t < 8:
                    t = (t + 1) % 8
                else:
                    t = (5 * t + 7) % V
                    t = t + 9 if t < 9 else t
            want.append(seq)
        buf, rounds, _ = vl._speculative_greedy_batched(
            p, self.cfg, prompt, [], jnp.asarray(t0, jnp.int32),
            jnp.full((2,), prompt.shape[1], jnp.int32), N, None, 0, K, 3,
            gate=2)
        np.testing.assert_array_equal(np.asarray(buf[0]), want[0])
        np.testing.assert_array_equal(np.asarray(buf[1]), want[1])
        # the never-accepting orbit row paces the loop at one emit/round
        # and (as a laggard) holds the batch in probe mode
        assert int(rounds) == N, int(rounds)

        # both rows cyclic: gated batch engages verify and chains —
        # far fewer rounds than tokens
        prompt2 = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7, 0, 1],
                               [3, 4, 5, 6, 7, 0, 1, 2, 3, 4]], jnp.int32)
        buf2, rounds2, _ = vl._speculative_greedy_batched(
            p, self.cfg, prompt2, [], jnp.asarray([2, 5], jnp.int32),
            jnp.full((2,), prompt2.shape[1], jnp.int32), N, None, 0, K, 3,
            gate=2)
        np.testing.assert_array_equal(np.asarray(buf2[0]),
                                      (2 + np.arange(N)) % 8)
        np.testing.assert_array_equal(np.asarray(buf2[1]),
                                      (5 + np.arange(N)) % 8)
        assert int(rounds2) <= 2 + -(-(N - 2) // (K + 1)) + 1, int(rounds2)


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


class TestPrefixResume:
    """prefill_prefix + generate_greedy(prefix_kv=...) must be bit-identical
    to the full-prompt call on every decode path: the prefix KV entries are
    the same values a full prefill writes (same tokens, same RoPE
    positions), and the suffix recompute sees the identical cache."""

    def setup_method(self):
        import numpy as np

        from mars_tpu.models import vip_llava as vl

        self.cfg = vl.TINY
        self.p = vl.init_random_params(11, self.cfg, dtype=jnp.float32)
        g = (self.cfg.image_size // self.cfg.patch_size) ** 2
        # prefix = [bos-ish, image block, newline-ish] ; suffix = question
        self.lp = 2 + g
        ls = 7
        ids = np.full((1, self.lp + ls), 5, np.int64)
        ids[0, 1:1 + g] = self.cfg.image_token_index
        ids[0, self.lp:] = np.arange(40, 40 + ls)
        self.ids = jnp.asarray(ids)
        self.suffix = jnp.asarray(ids[:, self.lp:])
        self.pixels = jnp.asarray(
            np.random.RandomState(5).rand(1, 56, 56, 3), jnp.float32)
        self.kv = vl.prefill_prefix(self.p, self.ids[:, :self.lp],
                                    self.pixels, self.cfg)

    def _both(self, **kw):
        from mars_tpu.models import vip_llava as vl

        full = vl.generate_greedy(self.p, self.ids, self.pixels, self.cfg,
                                  **kw)
        split = vl.generate_greedy(self.p, self.suffix, None, self.cfg,
                                   prefix_kv=self.kv, prefix_len=self.lp,
                                   **kw)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(split),
                                      err_msg=str(kw))

    def test_scan_path(self):
        self._both(max_new_tokens=6)

    def test_eos_path(self):
        from mars_tpu.models import vip_llava as vl

        ref = vl.generate_greedy(self.p, self.ids, self.pixels, self.cfg,
                                 max_new_tokens=6)
        eos = int(np.asarray(ref)[0, 2])
        self._both(max_new_tokens=6, eos_id=eos)
        self._both(max_new_tokens=6, eos_id=eos, min_new_tokens=4)

    def test_draft_path(self):
        self._both(max_new_tokens=8, draft_tokens=3)
        eos_none_ref = None  # draft + eos combination
        from mars_tpu.models import vip_llava as vl

        ref = vl.generate_greedy(self.p, self.ids, self.pixels, self.cfg,
                                 max_new_tokens=8)
        eos = int(np.asarray(ref)[0, 3])
        self._both(max_new_tokens=8, draft_tokens=3, eos_id=eos)

    def test_bucketed_suffix(self):
        """Right-padded suffix + suffix-relative true_length."""
        from mars_tpu.models import vip_llava as vl

        ls = self.suffix.shape[1]
        pad = jnp.pad(self.suffix, ((0, 0), (0, 16 - ls)), constant_values=5)
        full = vl.generate_greedy(self.p, self.ids, self.pixels, self.cfg,
                                  max_new_tokens=6)
        split = vl.generate_greedy(self.p, pad, None, self.cfg,
                                   prefix_kv=self.kv, prefix_len=self.lp,
                                   true_length=jnp.int32(ls),
                                   max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(split))
        # and through the speculative path
        split_d = vl.generate_greedy(self.p, pad, None, self.cfg,
                                     prefix_kv=self.kv, prefix_len=self.lp,
                                     true_length=jnp.int32(ls),
                                     max_new_tokens=6, draft_tokens=3)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(split_d))


class TestInplaceChained:
    """prefill_prefix(max_len=…) + generate_greedy_donate(
    inplace_prefix=True) chaining the name query into the definition
    query through ONE full-length KV buffer must be bit-identical to the
    standard copy-per-query prefix flow on every decode path: the second
    query's suffix forward rewrites the suffix slots with identical KV,
    and every slot past its own progress is rewritten before it is
    attended (same argument as right-pad bucketing)."""

    N_NAME, N_DEF = 4, 8

    def setup_method(self):
        from mars_tpu.models import vip_llava as vl

        self.cfg = vl.TINY
        self.p = vl.init_random_params(11, self.cfg, dtype=jnp.float32)
        g = (self.cfg.image_size // self.cfg.patch_size) ** 2
        self.lp = 2 + g
        ls = 7
        ids = np.full((2, self.lp + ls), 5, np.int64)
        ids[:, 1:1 + g] = self.cfg.image_token_index
        ids[0, self.lp:] = np.arange(40, 40 + ls)
        ids[1, self.lp:] = np.arange(60, 60 + ls)
        self.prefix = jnp.asarray(ids[:, :self.lp])
        self.suffix = jnp.asarray(ids[:, self.lp:])
        self.pixels = jnp.asarray(
            np.random.RandomState(5).rand(2, 56, 56, 3), jnp.float32)

    def _chained_vs_standard(self, rows=2, kv_bits=None, **kw):
        from mars_tpu.models import vip_llava as vl

        prefix, suffix = self.prefix[:rows], self.suffix[:rows]
        pixels = self.pixels[:rows]
        K = kw.get("draft_tokens", 0)
        # standard flow: prefix KV copied into a fresh cache per query
        kv_ref = vl.prefill_prefix(self.p, prefix, pixels, self.cfg,
                                   kv_bits=kv_bits)
        name_ref = vl.generate_greedy(
            self.p, suffix, None, self.cfg, max_new_tokens=self.N_NAME,
            prefix_kv=kv_ref, prefix_len=self.lp, **kw)
        def_ref = vl.generate_greedy(
            self.p, suffix, None, self.cfg, max_new_tokens=self.N_DEF,
            prefix_kv=kv_ref, prefix_len=self.lp, **kw)

        # chained in-place flow: one buffer sized for the larger decode
        max_len = (self.lp + suffix.shape[1] + self.N_DEF
                   + (K + 1 if K else 0))
        kv = vl.prefill_prefix(self.p, prefix, pixels, self.cfg,
                               max_len=max_len, kv_bits=kv_bits)
        name, kv = vl.generate_greedy_donate(
            self.p, suffix, None, self.cfg, max_new_tokens=self.N_NAME,
            prefix_kv=kv, prefix_len=self.lp, inplace_prefix=True,
            return_caches=True, **kw)
        dfn = vl.generate_greedy_donate(
            self.p, suffix, None, self.cfg, max_new_tokens=self.N_DEF,
            prefix_kv=kv, prefix_len=self.lp, inplace_prefix=True, **kw)
        np.testing.assert_array_equal(np.asarray(name_ref),
                                      np.asarray(name), err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(def_ref),
                                      np.asarray(dfn), err_msg=str(kw))

    def test_scan_path(self):
        self._chained_vs_standard()

    def test_eos_and_min_tokens(self):
        from mars_tpu.models import vip_llava as vl

        ref = vl.generate_greedy(self.p, self.suffix, None, self.cfg,
                                 prefix_kv=vl.prefill_prefix(
                                     self.p, self.prefix, self.pixels,
                                     self.cfg),
                                 prefix_len=self.lp, max_new_tokens=6)
        eos = int(np.asarray(ref)[0, 2])
        self._chained_vs_standard(eos_id=eos)
        self._chained_vs_standard(eos_id=eos, min_new_tokens=3)

    def test_speculative_b1(self):
        self._chained_vs_standard(rows=1, draft_tokens=3)

    def test_speculative_batched_true_length(self):
        ls = self.suffix.shape[1]
        pad = jnp.pad(self.suffix, ((0, 0), (0, 5)), constant_values=5)
        from mars_tpu.models import vip_llava as vl

        kv_ref = vl.prefill_prefix(self.p, self.prefix, self.pixels,
                                   self.cfg)
        kw = dict(max_new_tokens=self.N_DEF, draft_tokens=3,
                  true_length=jnp.full((2,), ls, jnp.int32),
                  prefix_len=self.lp)
        def_ref = vl.generate_greedy(self.p, pad, None, self.cfg,
                                     prefix_kv=kv_ref, **kw)
        max_len = self.lp + pad.shape[1] + self.N_DEF + 4
        kv = vl.prefill_prefix(self.p, self.prefix, self.pixels, self.cfg,
                               max_len=max_len)
        name, kv = vl.generate_greedy_donate(
            self.p, pad, None, self.cfg, prefix_kv=kv,
            inplace_prefix=True, return_caches=True,
            **{**kw, "max_new_tokens": self.N_NAME})
        dfn = vl.generate_greedy_donate(
            self.p, pad, None, self.cfg, prefix_kv=kv,
            inplace_prefix=True, **kw)
        np.testing.assert_array_equal(np.asarray(def_ref), np.asarray(dfn))


class TestInt8KVCache(TestInplaceChained):
    """kv_bits=8: per-token per-head int8 KV (models.vip_llava._kv_quant).
    NOT bit-identical to the bf16 cache (lossy by design — the round-4
    D=6 text block's ~3.9 GB resident KV is the target); what IS exact:
    every decode path agrees with every other WITHIN the quantized world
    (same inputs → same quantized writes), so the inherited chained-flow
    machinery re-runs with kv_bits=8."""

    def test_quant_roundtrip_error_bound(self):
        from mars_tpu.models import vip_llava as vl

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 9, 3, 16).astype(np.float32)) * 4.0
        q, s = vl._kv_quant(x)
        assert q.dtype == jnp.int8 and s.shape == (2, 9, 3, 1)
        back = np.asarray(q, np.float32) * np.asarray(s)
        # symmetric round-to-nearest: error <= half a quantization step
        err = np.abs(back - np.asarray(x))
        np.testing.assert_array_less(
            err, np.broadcast_to(np.asarray(s) * 0.5 + 1e-7, err.shape))

    def test_cache_structure_and_memory(self):
        from mars_tpu.models import vip_llava as vl

        kv = vl.prefill_prefix(self.p, self.prefix, self.pixels, self.cfg,
                               max_len=32, kv_bits=8)
        ck, cv, ks, vs = kv[0]
        hd = self.cfg.hidden // self.cfg.heads
        assert ck.dtype == jnp.int8 and cv.dtype == jnp.int8
        assert ck.shape == (2, 32, self.cfg.kv_heads, hd)
        assert ks.shape == (2, 32, self.cfg.kv_heads, 1)
        # int8 values + f32 scales = (1 + 4/hd)/2 of the bf16 bytes — ~51%
        # at the production hd=128; the TINY fixture's hd=8 pays a larger
        # relative scale overhead, so pin the exact formula instead
        bf16 = 2 * ck.size * 2
        quant = 2 * (ck.size + 4 * ks.size)
        assert quant == bf16 * (1 + 4 / hd) / 2

    def test_greedy_tokens_match_bf16_cache(self):
        """On the tiny fixture the int8 cache reproduces the bf16 cache's
        greedy tokens exactly (quantization noise ≪ logit margins here —
        a pinned regression, not a general guarantee)."""
        from mars_tpu.models import vip_llava as vl

        sd, d = load()
        cfg = vl.TINY
        p = vl.convert_hf(sd, cfg)
        ids = jnp.asarray(d["input_ids"])
        px = jnp.asarray(np.transpose(d["pixels"], (0, 2, 3, 1)))
        want = vl.generate_greedy(p, ids, px, cfg, max_new_tokens=6)
        got = vl.generate_greedy(p, ids, px, cfg, max_new_tokens=6,
                                 kv_bits=8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # exactness-within-the-quantized-world re-runs of the inherited paths
    def test_scan_path(self):
        self._chained_vs_standard(kv_bits=8)

    def test_eos_and_min_tokens(self):
        from mars_tpu.models import vip_llava as vl

        ref = vl.generate_greedy(self.p, self.suffix, None, self.cfg,
                                 prefix_kv=vl.prefill_prefix(
                                     self.p, self.prefix, self.pixels,
                                     self.cfg, kv_bits=8),
                                 prefix_len=self.lp, max_new_tokens=6)
        eos = int(np.asarray(ref)[0, 2])
        self._chained_vs_standard(eos_id=eos, kv_bits=8)
        self._chained_vs_standard(eos_id=eos, min_new_tokens=3, kv_bits=8)

    def test_speculative_b1(self):
        self._chained_vs_standard(rows=1, draft_tokens=3, kv_bits=8)

    def test_speculative_batched_true_length(self):
        ls = self.suffix.shape[1]
        pad = jnp.pad(self.suffix, ((0, 0), (0, 5)), constant_values=5)
        from mars_tpu.models import vip_llava as vl

        kv_ref = vl.prefill_prefix(self.p, self.prefix, self.pixels,
                                   self.cfg, kv_bits=8)
        kw = dict(max_new_tokens=self.N_DEF, draft_tokens=3,
                  true_length=jnp.full((2,), ls, jnp.int32),
                  prefix_len=self.lp)
        def_ref = vl.generate_greedy(self.p, pad, None, self.cfg,
                                     prefix_kv=kv_ref, **kw)
        max_len = self.lp + pad.shape[1] + self.N_DEF + 4
        kv = vl.prefill_prefix(self.p, self.prefix, self.pixels, self.cfg,
                               max_len=max_len, kv_bits=8)
        name, kv = vl.generate_greedy_donate(
            self.p, pad, None, self.cfg, prefix_kv=kv,
            inplace_prefix=True, return_caches=True,
            **{**kw, "max_new_tokens": self.N_NAME})
        dfn = vl.generate_greedy_donate(
            self.p, pad, None, self.cfg, prefix_kv=kv,
            inplace_prefix=True, **kw)
        np.testing.assert_array_equal(np.asarray(def_ref), np.asarray(dfn))


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
