"""Text subsystem tests: BPE tokenizer parity, retriever/wordnet, drawing."""
import numpy as np
import pytest

from mars_tpu.text import prompts, tokenizer
from mars_tpu.text.retriever import OracleVLM, PromptGenConfig, TextRetriever, get_synset


class TestTokenizer:
    def test_parity_with_reference_fixture(self):
        """Token ids for canonical strings (generated once from the
        reference clip tokenizer; hard-coded so the test is standalone)."""
        tok = tokenizer.get_tokenizer()
        # reference SimpleTokenizer().encode("a photo of a dog.")
        assert tok.encode("a photo of a dog.") == [320, 1125, 539, 320, 1929, 269]
        assert tok.encode("a photo without aeroplane.")[:3] == [320, 1125, 2193]

    def test_tokenize_shape_and_eot(self):
        out = tokenizer.tokenize(["a cat.", "a photo of a very big dog."])
        assert out.shape == (2, 77)
        tok = tokenizer.get_tokenizer()
        sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
        assert out[0, 0] == sot
        assert eot in out[0]
        # eot is argmax (property the text encoder pooling relies on)
        assert out[0].argmax() == list(out[0]).index(eot)

    def test_truncation(self):
        long = "dog " * 200
        out = tokenizer.tokenize([long])
        tok = tokenizer.get_tokenizer()
        assert out[0, -1] == tok.encoder["<|endoftext|>"]


class TestPrompts:
    def test_vta_pair(self):
        fg, bg = prompts.vta_text_pair("dog")
        assert fg == ["a photo of dog."]
        assert bg == ["a photo without dog."]

    def test_alpha_clip_text(self):
        assert prompts.alpha_clip_text("dog", "") == "a dog."
        assert prompts.alpha_clip_text("dog", "a canine") == "a dog, a canine."


def _nltk_ready():
    try:
        from nltk.corpus import wordnet as wn

        wn.synsets("dog")
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _nltk_ready(), reason="wordnet corpus not available")
class TestRetriever:
    def test_oracle_flow(self):
        img = np.zeros((64, 64, 3), np.uint8)
        mask = np.zeros((64, 64), np.float32)
        mask[20:40, 20:40] = 1
        tr = TextRetriever(OracleVLM("dog", "a domesticated canine"))
        name, desc = tr.get_conceptual_information([img], [mask])
        assert name == "dog"
        assert "canis" in desc.lower() or "domestic" in desc.lower()

    def test_get_synset_multiword(self):
        s = get_synset("potted plant", "a plant in a pot")
        assert s is not None

    def test_get_synset_none(self):
        assert get_synset("zzzqqqxx", "nothing") is None


class _FakeSynset:
    def __init__(self, name, definition):
        self._name, self._def = name, definition

    def name(self):
        return self._name

    def definition(self):
        return self._def


class _FakeWordnet:
    """Stub of the nltk wordnet surface get_synset uses.  CI pin for the
    synset-disambiguation path (the real corpus is absent in this image;
    TestRetriever above runs it for real when available)."""

    NOUN = "n"
    _LEX = {
        "dog": [
            _FakeSynset("dog.n.01", "a domesticated canid mammal kept as a pet"),
            _FakeSynset("frank.n.02", "a smooth-textured sausage served on a bun"),
        ],
        "plant": [
            _FakeSynset("plant.n.01", "greenery grown in a pot indoors"),
            _FakeSynset("plant.n.02", "an industrial building for manufacturing"),
        ],
        "sheep": [_FakeSynset("sheep.n.01", "woolly ruminant mammal")],
    }

    def synsets(self, word, pos=None):
        return list(self._LEX.get(word, []))

    def synset(self, name):
        for ss in self._LEX.values():
            for s in ss:
                if s.name() == name:
                    return s
        raise KeyError(name)


class _FakeStopwords:
    def words(self, lang):
        return ["a", "the", "in", "of", "on", "as", "an", "for"]


class TestRetrieverStubbed:
    """Same paths as TestRetriever, runnable without the WordNet corpus."""

    @pytest.fixture(autouse=True)
    def stub_nltk(self, monkeypatch):
        import nltk.corpus
        import nltk.tokenize

        monkeypatch.setattr(nltk.corpus, "wordnet", _FakeWordnet())
        monkeypatch.setattr(nltk.corpus, "stopwords", _FakeStopwords())
        monkeypatch.setattr(
            nltk.tokenize, "word_tokenize",
            lambda s: [w for w in
                       "".join(c if c.isalnum() else " " for c in s).split()])

    def test_oracle_flow_uses_wordnet_definition(self):
        img = np.zeros((64, 64, 3), np.uint8)
        mask = np.zeros((64, 64), np.float32)
        mask[20:40, 20:40] = 1
        tr = TextRetriever(OracleVLM("dog", "a domesticated canine pet"))
        name, desc = tr.get_conceptual_information([img], [mask])
        assert name == "dog"
        # disambiguation: the VLM description overlaps dog.n.01, not frank.n.02
        assert desc == "a domesticated canid mammal kept as a pet"

    def test_disambiguation_by_description_overlap(self):
        # "potted plant": no 'potted_plant'/'pottedplant' entry → per-word
        # fallback hits 'plant' (reference _get_synset's third fallback)
        s = get_synset("potted plant", "greenery that sits in a pot")
        assert s == "plant.n.01"
        s = get_synset("potted plant", "a manufacturing building complex")
        assert s == "plant.n.02"

    def test_single_synset_short_circuits(self):
        assert get_synset("sheep", "anything at all") == "sheep.n.01"

    def test_get_synset_none(self):
        assert get_synset("zzzqqqxx", "nothing") is None


class TestDrawing:
    @pytest.mark.parametrize("kind", ["mask", "bb", "contour", "ellipse"])
    def test_draw_shapes(self, kind):
        from mars_tpu.text.visual_prompts import GENERATORS

        img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
        mask = np.zeros((64, 64), np.float32)
        mask[10:30, 10:30] = 1
        out = GENERATORS[kind](img, mask, color=(255, 0, 0), zoom_percent=50)
        assert out.shape == img.shape
        assert out.dtype == np.uint8
        assert not np.array_equal(out, img)  # something was drawn/zoomed


class _BatchCountingVLM:
    """Batch-capable VLM stub: answers deterministically per (prompt, image
    checksum) and records call granularity."""

    def __init__(self, answers):
        self._answers = list(answers)
        self.batch_calls = []
        self.single_calls = 0

    def _answer(self):
        return self._answers.pop(0)

    def generate(self, image, prompt, max_new_tokens=20, min_new_tokens=0):
        self.single_calls += 1
        return self._answer()

    def generate_batch(self, images, prompts, max_new_tokens=20,
                       min_new_tokens=0):
        self.batch_calls.append(len(images))
        return [self._answer() for _ in images]


class TestBatchedEnsemble:
    def _episode(self, shots):
        imgs, masks = [], []
        for s in range(shots):
            img = np.full((64, 64, 3), 30 * (s + 1), np.uint8)
            mask = np.zeros((64, 64), np.float32)
            mask[10:40, 10:40] = 1
            imgs.append(img)
            masks.append(mask)
        return imgs, masks

    def test_ensemble_uses_one_batch_and_votes(self, monkeypatch):
        from mars_tpu.text import retriever as R

        monkeypatch.setattr(R, "get_synset", lambda n, d: None)
        imgs, masks = self._episode(2)
        ens = R.EnsembleConfig(colors=("red", "green"))
        # 2 shots x 2 variants = 4 name queries + 1 definition query
        vlm = _BatchCountingVLM(["dog", "cat", "dog", "dog", "a canine pet"])
        tr = R.TextRetriever(vlm, ensemble=ens)
        name, desc = tr.get_conceptual_information(imgs, masks)
        # inner votes: shot0 {dog,cat} -> first-seen "dog", shot1 -> "dog"
        assert name == "dog"
        assert vlm.batch_calls == [4]
        assert vlm.single_calls == 1  # the definition query

    def test_multi_shot_batches_without_ensemble(self, monkeypatch):
        from mars_tpu.text import retriever as R

        monkeypatch.setattr(R, "get_synset", lambda n, d: None)
        imgs, masks = self._episode(3)
        vlm = _BatchCountingVLM(["dog", "dog", "cat", "a canine pet"])
        tr = R.TextRetriever(vlm)
        name, _ = tr.get_conceptual_information(imgs, masks)
        assert name == "dog"
        assert vlm.batch_calls == [3]

    def test_sequential_fallback_unchanged(self, monkeypatch):
        from mars_tpu.text import retriever as R

        monkeypatch.setattr(R, "get_synset", lambda n, d: None)
        imgs, masks = self._episode(1)
        tr = R.TextRetriever(OracleVLM("dog", "a pet"))
        name, _ = tr.get_conceptual_information(imgs, masks)
        assert name == "dog"


class _KeyedVLM:
    """Batch-capable stub that answers DETERMINISTICALLY per (image,
    prompt), so the same query gives the same answer regardless of which
    batch it rides in — the property PipelinedTextStage relies on (and
    which the bucketed-decode tests pin for the real model)."""

    NAMES = ["dog", "plant", "sheep"]

    def __init__(self):
        self.batch_rows = []  # (n_rows, maxs, mins) per generate_batch call
        self.single_calls = 0

    def _answer(self, image, prompt):
        if "definition" in prompt:
            # echo the name the prompt embeds, so the description is a
            # deterministic function of the voted name
            name = next((n for n in self.NAMES if n in prompt), "thing")
            return f"a {name} is a domesticated thing"
        return self.NAMES[int(image.sum()) % len(self.NAMES)]

    def generate(self, image, prompt, max_new_tokens=20, min_new_tokens=0):
        self.single_calls += 1
        return self._answer(image, prompt)

    def generate_batch(self, images, prompts, max_new_tokens=20,
                       min_new_tokens=0):
        self.batch_rows.append((len(images), tuple(max_new_tokens)
                                if isinstance(max_new_tokens, (list, tuple))
                                else max_new_tokens,
                                tuple(min_new_tokens)
                                if isinstance(min_new_tokens, (list, tuple))
                                else min_new_tokens))
        return [self._answer(im, pr) for im, pr in zip(images, prompts)]


def _make_episodes(n, shots=1):
    eps = []
    for e in range(n):
        imgs, masks = [], []
        for s in range(shots):
            img = np.full((64, 64, 3), (7 * e + 3 * s + 5) % 97, np.uint8)
            mask = np.zeros((64, 64), np.float32)
            mask[10:40, 10:40] = 1
            imgs.append(img)
            masks.append(mask)
        eps.append((imgs, masks))
    return eps


class TestPipelinedTextStage:
    """Cross-episode text batching: step(N+1) serves def(N)+names(N+1) in
    one batched call, and the (name, description) sequence is identical to
    the serial retriever's."""

    def _episodes(self, n, shots=1):
        return _make_episodes(n, shots)

    def test_sequence_matches_serial(self):
        from mars_tpu.text import retriever as R

        eps = self._episodes(4, shots=2)
        serial = [R.TextRetriever(_KeyedVLM()).get_conceptual_information(i, m)
                  for i, m in eps]

        vlm = _KeyedVLM()
        stage = R.PipelinedTextStage(R.TextRetriever(vlm))
        got = []
        for i, m in eps:
            done = stage.step(i, m)
            if done is not None:
                got.append(done)
        got.append(stage.flush())
        assert got == serial
        # first step: 2 name rows only; later steps: 1 def + 2 name rows
        assert [r[0] for r in vlm.batch_rows] == [2, 3, 3, 3]
        # mixed per-row budgets: def row (50 max / 20 min) leads
        assert vlm.batch_rows[1][1] == (50, 20, 20)
        assert vlm.batch_rows[1][2] == (20, 0, 0)
        # flush ran the final definition alone (single generate)
        assert vlm.single_calls == 1

    def test_single_shot_uses_batch_of_two(self):
        from mars_tpu.text import retriever as R

        eps = self._episodes(3, shots=1)
        vlm = _KeyedVLM()
        stage = R.PipelinedTextStage(R.TextRetriever(vlm))
        got = [stage.step(i, m) for i, m in eps] + [stage.flush()]
        got = [g for g in got if g is not None]
        serial = [R.TextRetriever(_KeyedVLM()).get_conceptual_information(i, m)
                  for i, m in eps]
        assert got == serial
        # episode 0's lone name query has no pending def: single generate;
        # steps 2..3 each batch [def(prev), name(cur)]
        assert [r[0] for r in vlm.batch_rows] == [2, 2]
        assert vlm.single_calls == 2  # first name + flushed final def

    def test_flush_only_episode(self):
        from mars_tpu.text import retriever as R

        (i0, m0), = self._episodes(1)
        vlm = _KeyedVLM()
        stage = R.PipelinedTextStage(R.TextRetriever(vlm))
        assert stage.step(i0, m0) is None
        out = stage.flush()
        assert out == R.TextRetriever(
            _KeyedVLM()).get_conceptual_information(i0, m0)
        assert stage.flush() is None  # idempotent once drained


class TestBlockTextStage:
    """D-episode block text batching: ONE batched decode for all D
    episodes' name queries, another for their D definitions — the result
    sequence must be identical to the serial retriever's for every depth
    and block alignment."""

    def test_sequence_matches_serial_any_depth(self):
        from mars_tpu.text import retriever as R

        eps = _make_episodes(5, shots=2)
        serial = [R.TextRetriever(_KeyedVLM()).get_conceptual_information(i, m)
                  for i, m in eps]
        for depth in (1, 2, 3, 5, 8):
            vlm = _KeyedVLM()
            stage = R.BlockTextStage(R.TextRetriever(vlm), depth=depth)
            got = []
            for i, m in eps:
                got.extend(stage.step(i, m))
            got.extend(stage.flush())
            assert got == serial, f"depth={depth}"

    def test_batch_shapes_and_budgets(self):
        from mars_tpu.text import retriever as R

        eps = _make_episodes(5, shots=1)
        vlm = _KeyedVLM()
        stage = R.BlockTextStage(R.TextRetriever(vlm), depth=3)
        out = []
        for i, m in eps:
            out.extend(stage.step(i, m))
        assert len(out) == 3  # first block drained at episode 3
        out.extend(stage.flush())
        assert len(out) == 5
        # block 1: names (3 rows, max 20 / min 0) then definitions (3 rows,
        # max 50 / min 20); flush block: names (2), definitions (2)
        assert vlm.batch_rows == [
            (3, (20,) * 3, (0,) * 3), (3, (50,) * 3, (20,) * 3),
            (2, (20,) * 2, (0,) * 2), (2, (50,) * 2, (20,) * 2)]
        assert vlm.single_calls == 0

    def test_flush_idempotent(self):
        from mars_tpu.text import retriever as R

        stage = R.BlockTextStage(R.TextRetriever(_KeyedVLM()), depth=4)
        assert stage.flush() == []
        (i0, m0), = _make_episodes(1)
        assert stage.step(i0, m0) == []
        assert len(stage.flush()) == 1
        assert stage.flush() == []


def test_generate_batch_shared_prefix_exact():
    """JaxVipLlava.generate_batch(shared_prefix=...) must (a) return the
    same strings as the plain full-prompt batched path, (b) prefill the
    batch's prefixes ONCE and reuse the cached KV stack for a second call
    over the same images (BlockTextStage's name→definition pair), and
    (c) fall back cleanly when a row breaks the prefix match."""
    import jax.numpy as jnp

    from mars_tpu.models import vip_llava as vl
    from mars_tpu.text.retriever import JaxVipLlava

    cfg = vl.TINY
    g = (cfg.image_size // cfg.patch_size) ** 2

    class StubTok:
        eos_token_id = None

        def decode(self, toks, skip_special_tokens=True):
            return " ".join(str(int(t)) for t in toks)

    class StubProcessor:
        tokenizer = StubTok()

        def __call__(self, text, images, return_tensors="np"):
            left, _, right = text.partition("<image>")
            ids = ([1] + [ord(c) % 50 + 10 for c in left]
                   + [cfg.image_token_index] * g
                   + [ord(c) % 50 + 10 for c in right])
            arr = np.asarray(images, np.float32)[None] / 255.0
            pix = np.transpose(arr, (0, 3, 1, 2))
            return {"input_ids": np.asarray([ids], np.int64),
                    "pixel_values": pix}

    vlm = object.__new__(JaxVipLlava)
    vlm.processor = StubProcessor()
    vlm.cfg = cfg
    vlm.params = vl.init_random_params(21, cfg, dtype=jnp.float32)
    vlm._vl = vl
    vlm.draft_tokens = 0
    vlm.ngram = 3
    vlm._prefix_ids_cache = {}
    vlm._prefix_kv_cache = None

    rs = np.random.RandomState(11)
    imgs = [(rs.rand(cfg.image_size, cfg.image_size, 3) * 255).astype(np.uint8)
            for _ in range(3)]
    pfx = "Human: <image>\n"
    names = [pfx + "name it\nAssistant:",
             pfx + "what is in the red box here?\nAssistant:",
             pfx + "define\nAssistant:"]
    defs = [pfx + "give the definition of the thing\nAssistant:"] * 3

    plain_names = vlm.generate_batch(imgs, names, max_new_tokens=8)
    plain_defs = vlm.generate_batch(imgs, defs, max_new_tokens=8,
                                    min_new_tokens=3)
    assert getattr(vlm, "_batch_prefix_cache", None) is None  # no prefix arg

    calls = []
    real_prefill = vl.prefill_prefix
    vlm._vl = type("VlProxy", (), {
        "generate_greedy": staticmethod(vl.generate_greedy),
        "generate_greedy_donate": staticmethod(vl.generate_greedy_donate),
        "prefill_prefix": staticmethod(
            lambda *a, **k: (calls.append(1), real_prefill(*a, **k))[1]),
    })
    got_names = vlm.generate_batch(imgs, names, max_new_tokens=8,
                                   shared_prefix=pfx)
    assert got_names == plain_names
    assert calls == [1]
    # the definition pass over the SAME drawn images reuses the KV stack
    got_defs = vlm.generate_batch(imgs, defs, max_new_tokens=8,
                                  min_new_tokens=3, shared_prefix=pfx)
    assert got_defs == plain_defs
    assert calls == [1]

    # one row breaking the prefix match → whole chunk falls back, exact
    odd = ["Different: <image>\nwhatever\nAssistant:"] + names[1:]
    plain_odd = vlm.generate_batch(imgs, odd, max_new_tokens=8)
    got_odd = vlm.generate_batch(imgs, odd, max_new_tokens=8,
                                 shared_prefix=pfx)
    assert got_odd == plain_odd
    assert calls == [1]  # no prefill attempted on mismatch


def test_jax_vlm_shared_prefix_reuse_exact():
    """JaxVipLlava.generate(shared_prefix=...) must (a) produce the same
    tokens as the plain full-prompt path and (b) prefill the shared prefix
    once per image, reusing the cached KV for the second query (the
    retriever's name→definition pair on the same drawn image)."""
    import jax.numpy as jnp

    from mars_tpu.models import vip_llava as vl
    from mars_tpu.text.retriever import JaxVipLlava

    cfg = vl.TINY
    g = (cfg.image_size // cfg.patch_size) ** 2

    class StubTok:
        eos_token_id = None

        def decode(self, toks, skip_special_tokens=True):
            return " ".join(str(int(t)) for t in toks)

    class StubProcessor:
        """Char-level 'tokenizer' whose <image> expands to g slots —
        prefix-tokenization is exactly a prefix of the full tokenization."""

        tokenizer = StubTok()

        def __call__(self, text, images, return_tensors="np"):
            left, _, right = text.partition("<image>")
            ids = ([1] + [ord(c) % 50 + 10 for c in left]
                   + [cfg.image_token_index] * g
                   + [ord(c) % 50 + 10 for c in right])
            arr = np.asarray(images, np.float32)[None] / 255.0
            pix = np.transpose(arr, (0, 3, 1, 2))
            return {"input_ids": np.asarray([ids], np.int64),
                    "pixel_values": pix}

    vlm = object.__new__(JaxVipLlava)
    vlm.processor = StubProcessor()
    vlm.cfg = cfg
    vlm.params = vl.init_random_params(13, cfg, dtype=jnp.float32)
    vlm._vl = vl
    vlm.draft_tokens = 0
    vlm.ngram = 3
    vlm._prefix_ids_cache = {}
    vlm._prefix_kv_cache = None

    img = (np.random.RandomState(3).rand(cfg.image_size, cfg.image_size, 3)
           * 255).astype(np.uint8)
    pfx = "Human: <image>\n"
    q1 = pfx + "what is boxed?\nAssistant:"
    q2 = pfx + "define the dog in the box please\nAssistant:"

    plain1 = vlm.generate(img, q1, max_new_tokens=5)
    plain2 = vlm.generate(img, q2, max_new_tokens=5)
    assert vlm._prefix_kv_cache is None  # no shared_prefix → no caching

    calls = []
    real_prefill = vl.prefill_prefix
    vlm._vl = type("VlProxy", (), {
        "generate_greedy": staticmethod(vl.generate_greedy),
        "generate_greedy_donate": staticmethod(vl.generate_greedy_donate),
        "prefill_prefix": staticmethod(
            lambda *a, **k: (calls.append(1), real_prefill(*a, **k))[1]),
    })
    got1 = vlm.generate(img, q1, max_new_tokens=5, shared_prefix=pfx)
    got2 = vlm.generate(img, q2, max_new_tokens=5, shared_prefix=pfx)
    assert got1 == plain1 and got2 == plain2
    assert calls == [1]  # ONE prefix prefill served both queries

    # different image → cache miss, fresh prefill, still exact
    img2 = (np.random.RandomState(9).rand(cfg.image_size, cfg.image_size, 3)
            * 255).astype(np.uint8)
    plain3 = vlm.generate(img2, q1, max_new_tokens=5)
    got3 = vlm.generate(img2, q1, max_new_tokens=5, shared_prefix=pfx)
    assert got3 == plain3
    assert calls == [1, 1]

    # a prompt that does NOT start with the prefix falls back cleanly
    odd = "Different: <image>\nwhatever\nAssistant:"
    plain4 = vlm.generate(img2, odd, max_new_tokens=5)
    got4 = vlm.generate(img2, odd, max_new_tokens=5, shared_prefix=pfx)
    assert got4 == plain4
    assert calls == [1, 1]  # no prefill attempted on mismatch


def test_generate_batch_speculative_exact():
    """JaxVipLlava.generate_batch with draft_tokens>0 (the batch ×
    speculation compose, _speculative_greedy_batched) must return the
    same strings as the plain batched decode on variable-length prompts."""
    import jax.numpy as jnp

    from mars_tpu.models import vip_llava as vl
    from mars_tpu.text.retriever import JaxVipLlava

    cfg = vl.TINY
    g = (cfg.image_size // cfg.patch_size) ** 2

    class StubTok:
        eos_token_id = None

        def decode(self, toks, skip_special_tokens=True):
            return " ".join(str(int(t)) for t in toks)

    class StubProcessor:
        tokenizer = StubTok()

        def __call__(self, text, images, return_tensors="np"):
            left, _, right = text.partition("<image>")
            ids = ([1] + [ord(c) % 50 + 10 for c in left]
                   + [cfg.image_token_index] * g
                   + [ord(c) % 50 + 10 for c in right])
            arr = np.asarray(images, np.float32)[None] / 255.0
            pix = np.transpose(arr, (0, 3, 1, 2))
            return {"input_ids": np.asarray([ids], np.int64),
                    "pixel_values": pix}

    vlm = object.__new__(JaxVipLlava)
    vlm.processor = StubProcessor()
    vlm.cfg = cfg
    vlm.params = vl.init_random_params(7, cfg, dtype=jnp.float32)
    vlm._vl = vl
    vlm.draft_tokens = 0
    vlm.ngram = 3
    vlm._prefix_ids_cache = {}
    vlm._prefix_kv_cache = None

    rs = np.random.RandomState(5)
    imgs = [(rs.rand(cfg.image_size, cfg.image_size, 3) * 255).astype(np.uint8)
            for _ in range(3)]
    prompts = ["Human: <image>\nname it\nAssistant:",
               "Human: <image>\nwhat is in the red box here?\nAssistant:",
               "Human: <image>\ndefine\nAssistant:"]
    plain = vlm.generate_batch(imgs, prompts, max_new_tokens=8)
    vlm.draft_tokens = 4
    spec = vlm.generate_batch(imgs, prompts, max_new_tokens=8)
    assert spec == plain


def test_generate_batch_chunks_to_bound_kv_memory():
    """JaxVipLlava.generate_batch must split request lists longer than
    MAX_DECODE_BATCH (KV-cache footprint cap) and preserve order."""
    from mars_tpu.text.retriever import JaxVipLlava

    vlm = object.__new__(JaxVipLlava)  # no model/processor needed
    seen = []

    def fake_chunk(images, prompts, max_new_tokens, min_new_tokens,
                   shared_prefix=None):
        seen.append((len(images), shared_prefix))
        return list(prompts)

    vlm._generate_batch_chunk = fake_chunk
    out = vlm.generate_batch([None] * 19, [f"p{i}" for i in range(19)])
    assert seen == [(8, None), (8, None), (3, None)]
    assert out == [f"p{i}" for i in range(19)]
    # the shared-prefix path holds prefix KV + decode caches per row, so
    # it chunks tighter (MAX_PREFIX_BATCH)
    seen.clear()
    out = vlm.generate_batch([None] * 9, [f"p{i}" for i in range(9)],
                             shared_prefix="Human: <image>\n")
    assert seen == [(4, "Human: <image>\n")] * 2 + [(1, "Human: <image>\n")]
    assert out == [f"p{i}" for i in range(9)]
    # int8 KV halves the per-row residency → the prefix cap relaxes to
    # MAX_DECODE_BATCH: a D=6 text block runs as ONE B=6 decode
    vlm.kv_bits = 8
    seen.clear()
    out = vlm.generate_batch([None] * 6, [f"p{i}" for i in range(6)],
                             shared_prefix="Human: <image>\n")
    assert seen == [(6, "Human: <image>\n")]
    assert out == [f"p{i}" for i in range(6)]
