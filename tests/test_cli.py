"""CLI flag surface: every tuning flag of the reference's main_MARS.py
(106-163) must have an analogue and plumb into the right frozen config."""
import argparse

import pytest

from mars_tpu import cli


# reference snake_case flag → our kebab-case flag (None = consciously n/a)
REFERENCE_FLAGS = {
    "dataset_path": "datapath",
    "nltk_path": "nltk_path",
    "mask_proposals_path": "mask_proposals_path",
    "benchmark": "benchmark",
    "nshot": "nshot",
    "fold": "fold",
    "input_size": "input_size",
    "models_path": "models_path",
    "prompt_type": "prompt_type",
    "zoom_percentage": "zoom_percentage",
    "color": "color",
    "ensamble_prompts": "ensemble_prompts",
    "ensamble_prompts_list": "ensemble_prompts_list",
    "ensamble_zoom": "ensemble_zoom",
    "ensamble_zoom_list": "ensemble_zoom_list",
    "ensamble_colors": "ensemble_colors",
    "ensamble_colors_list": "ensemble_colors_list",
    "alpha_blending": "alpha_blending",
    "thickness": "thickness",
    "vlm4bit": "vlm4bit",
    "vlm8bit": "vlm8bit",
    "vta_backbone": "vta_backbone",
    "vta_refinement_box_threshold": "vta_refinement_box_threshold",
    "last_n_attn_for_vta_refinement": "last_n_attn_for_vta_refinement",
    "vva_backbone": "vva_backbone",
    "dino_backbone": "dino_backbone",
    "num_regs": "num_regs",
    "vva_refinement_box_threshold": "vva_refinement_box_threshold",
    "last_n_attn_for_vva_refinement": "last_n_attn_for_vva_refinement",
    "static_threshold": "static_threshold",
    "dynamic_threshold": "dynamic_threshold",
    "alpha_coverage": "alpha_coverage",
    "log_root_path": "log_path",
    "exp_name": "exp_name",
}


def _parse(argv):
    p = argparse.ArgumentParser()
    cli.add_eval_args(p)
    return p.parse_args(argv)


def test_all_reference_flags_have_analogues():
    args = _parse([])
    for ref, ours in REFERENCE_FLAGS.items():
        assert hasattr(args, ours), f"missing analogue for --{ref}"


def test_tuning_flags_reach_configs():
    args = _parse([
        "--vva-refinement-box-threshold", "0.7",
        "--last-n-attn-for-vva-refinement", "12",
        "--vta-refinement-box-threshold", "0.3",
        "--last-n-attn-for-vta-refinement", "4",
        "--static-threshold", "0.6",
        "--dynamic-threshold", "0.9",
        "--alpha-coverage", "0.8",
    ])
    cfg = cli.build_mars_config(args)
    assert cfg.vva.refinement_box_threshold == 0.7
    assert cfg.vva.attn_tap_last_n == 12
    assert cfg.vta.refinement_box_threshold == 0.3
    assert cfg.vta.attn_tap_last_n == 4
    assert cfg.filter_merge.static_threshold == 0.6
    assert cfg.filter_merge.dynamic_threshold == 0.9
    assert cfg.filter_merge.alpha == 0.8


@pytest.mark.parametrize("backbone,in_size,grid", [
    ("ViT-B/16", 528, 33),   # ceil(518/16)*16 (VisualTextAlignmentModule:86-87)
    ("ViT-L/14", 518, 37),
])
def test_vta_backbone_geometry(backbone, in_size, grid):
    cfg = cli.build_mars_config(_parse(["--vta-backbone", backbone]))
    assert cfg.vta.input_size == in_size
    assert cfg.vta.grid == grid


def test_ensemble_config_from_flags():
    args = _parse(["--ensemble-colors", "--ensemble-zoom",
                   "--ensemble-zoom-list", "0", "30"])
    from mars_tpu.text.retriever import EnsembleConfig, PromptGenConfig

    ens = EnsembleConfig(
        colors=tuple(args.ensemble_colors_list) if args.ensemble_colors else (),
        zooms=tuple(args.ensemble_zoom_list) if args.ensemble_zoom else (),
        prompt_types=(tuple(args.ensemble_prompts_list)
                      if args.ensemble_prompts else ()),
    )
    variants = list(ens.variants(PromptGenConfig()))
    # 3 colors x 2 zooms x 1 (base) prompt type
    assert len(variants) == 6
    assert {v.color for v in variants} == {"red", "green", "blue"}
    assert {v.zoom_percent for v in variants} == {0, 30}


def test_gt_class_names_smoke(tmp_path):
    """Tiny end-to-end run: synthetic benchmark, random tiny towers not
    needed — uses the default full-size towers is too slow on CPU, so this
    only checks arg handling up to dataset construction."""
    args = _parse(["--benchmark", "synthetic", "--gt-class-names",
                   "--episodes", "1", "--log-path", str(tmp_path)])
    assert args.gt_class_names and args.episodes == 1


class TestResume:
    def test_snapshot_roundtrip_restores_meter_and_rngs(self, tmp_path):
        import numpy as np

        from mars_tpu.utils import evaluation

        path = str(tmp_path / "resume.pkl")
        meter = evaluation.AverageMeter("synthetic", [0, 1, 2])
        meter.update(np.array([1.0, 2.0]), np.array([3.0, 4.0]), 1)
        rng = np.random.RandomState(0)
        _ = rng.rand(5)  # advance

        class _DS:
            rng = np.random.RandomState(7)

        ds = _DS()
        _ = ds.rng.rand(3)
        snap = cli.capture_rng_states(rng, ds)
        want_next = rng.rand(4)  # the draws an uninterrupted run would make
        want_ds_next = ds.rng.rand(4)
        cli.save_resume_state(path, 41, meter, [[0, 1.0, 0.9, 7]], snap)

        meter2 = evaluation.AverageMeter("synthetic", [0, 1, 2])
        rng2 = np.random.RandomState(99)  # different stream
        ds2 = _DS()
        ds2.rng = np.random.RandomState(99)
        st = cli.load_resume_state(path, meter2, rng2, ds2)
        assert st["next_idx"] == 41
        assert st["timing_rows"] == [[0, 1.0, 0.9, 7]]
        np.testing.assert_array_equal(meter2.inter, meter.inter)
        np.testing.assert_array_equal(meter2.union, meter.union)
        # restored rngs continue the original streams exactly
        np.testing.assert_array_equal(rng2.rand(4), want_next)
        np.testing.assert_array_equal(ds2.rng.rand(4), want_ds_next)

    def test_resume_flag_surface(self):
        args = _parse(["--resume", "--resume-every", "5"])
        assert args.resume and args.resume_every == 5


class _LoopVLM:
    """Deterministic keyed VLM (same answer for the same query whatever
    batch it rides in) — lets the pipelined loop reproduce the serial one."""

    NAMES = ["dog", "plant", "sheep"]

    def _answer(self, image, prompt):
        if "definition" in prompt:
            name = next((n for n in self.NAMES if n in prompt), "thing")
            return f"a {name} is a kind of thing"
        return self.NAMES[int(image.sum()) % len(self.NAMES)]

    def generate(self, image, prompt, max_new_tokens=20, min_new_tokens=0):
        return self._answer(image, prompt)

    def generate_batch(self, images, prompts, max_new_tokens=20,
                       min_new_tokens=0):
        return [self._answer(im, pr) for im, pr in zip(images, prompts)]


class _LoopModel:
    """Stand-in for Mars in the cli loop: text via a real TextRetriever
    (stub VLM), prediction = a mask deterministic in (episode, name), so
    the meter trace distinguishes episode/text mixups."""

    def __init__(self, size, fail_at=None):
        from mars_tpu.text.retriever import TextRetriever

        self.retriever = TextRetriever(_LoopVLM())
        self.size = size
        self.timings = {}
        self.calls = []  # (class_name, class_description) per predict
        self.fail_at = fail_at  # raise on the Nth predict (1-based)

    def support_host_arrays(self, ep):
        import jax.numpy as jnp
        import numpy as np

        imgs = np.asarray(
            jnp.clip(ep.support_images * 255, 0, 255).astype(jnp.uint8))
        masks = np.asarray(ep.support_masks)
        n = int(np.asarray(ep.support_valid).sum())
        return [imgs[i] for i in range(n)], [masks[i] for i in range(n)]

    def predict(self, ep, props, class_name=None, class_description=""):
        import numpy as np

        if class_name is None:
            class_name, class_description = \
                self.retriever.get_conceptual_information(
                    *self.support_host_arrays(ep))
        self.calls.append((class_name, class_description))
        if self.fail_at is not None and len(self.calls) >= self.fail_at:
            raise RuntimeError("interrupted")
        self.timings = {"total": 0.01, "after_text_extraction": 0.005}
        h = (hash((class_name, class_description)) % 7) + 1
        pred = np.zeros((self.size, self.size), np.float32)
        pred[: 8 * h, : 8 * h] = 1.0  # depends on the text result
        # vary with the episode too, via the support content
        s = int(np.asarray(ep.support_masks).sum()) % self.size
        pred[s: s + 4] = 1.0
        return pred

    def predict_launch(self, ep, props, class_name, class_description=""):
        # same contract as Mars.predict_launch: the returned array is
        # synced later by the loop's completion window
        return self.predict(ep, props, class_name, class_description)

    def predict_debug(self, ep, props, class_name, class_description=""):
        import numpy as np

        merged = self.predict(ep, props, class_name, class_description)
        self.calls.pop()  # the debug run is an extra dispatch, not an episode
        p = np.asarray(props.masks).shape[0]
        g = self.size // 8
        rng = np.random.RandomState(0)
        return {"merged": merged, "scores": rng.rand(p).astype(np.float32),
                "vva_prior": rng.rand(g, g), "vta_prior": rng.rand(g, g),
                "ac_scores": rng.rand(p).astype(np.float32)}


class TestPipelinedTextLoop:
    """--pipelined-text must reproduce the serial loop's metrics exactly
    (same per-episode text results, same meter trace, resumable)."""

    SIZE = 96  # synthetic_proposals draws boxes in [0, size-64)

    def _run(self, tmp_path, extra, fail_at=None, name="run"):
        from mars_tpu import cli as cli_mod

        model = _LoopModel(self.SIZE, fail_at=fail_at)
        orig = cli_mod.build_model
        cli_mod.build_model = lambda args: model
        try:
            out = cli_mod.main(
                ["--benchmark", "synthetic", "--episodes", "5",
                 "--input-size", str(self.SIZE), "--seed", "3",
                 "--log-path", str(tmp_path / name), "--resume-every", "2",
                 "--resume"] + extra)
        finally:
            cli_mod.build_model = orig
        return out, model

    def test_matches_serial_loop(self, tmp_path):
        import csv as _csv

        # --text-block 1 restores the serial per-episode text stage (the
        # default is block-4)
        (miou_s, fb_s), m_serial = self._run(tmp_path, ["--text-block", "1"],
                                             name="serial")
        (miou_p, fb_p), m_pipe = self._run(tmp_path, ["--pipelined-text"],
                                           name="pipe")
        assert m_pipe.calls == m_serial.calls  # same (name, desc) per episode
        assert (miou_p, fb_p) == (miou_s, fb_s)
        # timing rows stay in episode order
        with open(tmp_path / "pipe" / "ranking_time.csv") as f:
            rows = list(_csv.reader(f))[1:]
        assert [int(r[0]) for r in rows] == list(range(5))

    def test_overlap_ranking_matches_synchronous(self, tmp_path):
        """--overlap-ranking N (launch rankings, pull merged masks a
        window late) must reproduce the synchronous loop's metrics and
        row order exactly — same programs, same inputs, FIFO completion."""
        import csv as _csv

        (miou_0, fb_0), m_sync = self._run(
            tmp_path, ["--overlap-ranking", "0"], name="sync")
        (miou_3, fb_3), m_ovl = self._run(
            tmp_path, ["--overlap-ranking", "3"], name="ovl")
        assert m_ovl.calls == m_sync.calls
        assert (miou_3, fb_3) == (miou_0, fb_0)
        with open(tmp_path / "ovl" / "ranking_time.csv") as f:
            rows = list(_csv.reader(f))[1:]
        assert [int(r[0]) for r in rows] == list(range(5))

    def test_interrupt_and_resume_matches_uninterrupted(self, tmp_path):
        import pytest as _pytest

        (miou_s, fb_s), _ = self._run(tmp_path, ["--text-block", "1"],
                                      name="ref")
        # crash on the 3rd completed episode: the resume snapshot saved at
        # the episode-2 boundary (resume-every 2) must replay bit-exact
        with _pytest.raises(RuntimeError):
            self._run(tmp_path, ["--pipelined-text"], fail_at=3, name="int")
        (miou_r, fb_r), _ = self._run(tmp_path, ["--pipelined-text"],
                                      name="int")
        assert (miou_r, fb_r) == (miou_s, fb_s)

    def test_text_block_matches_serial_loop(self, tmp_path):
        import csv as _csv

        (miou_s, fb_s), m_serial = self._run(tmp_path, ["--text-block", "1"],
                                             name="serial_b")
        # depth 3 over 5 episodes: one full block + a 2-episode flush
        (miou_b, fb_b), m_blk = self._run(tmp_path, ["--text-block", "3"],
                                          name="blk")
        assert m_blk.calls == m_serial.calls  # same (name, desc) per episode
        assert (miou_b, fb_b) == (miou_s, fb_s)
        with open(tmp_path / "blk" / "ranking_time.csv") as f:
            rows = list(_csv.reader(f))[1:]
        assert [int(r[0]) for r in rows] == list(range(5))
        # the default (no flags) resolves to block-4 and matches too
        (miou_d, fb_d), m_def = self._run(tmp_path, [], name="dflt")
        assert m_def.calls == m_serial.calls
        assert (miou_d, fb_d) == (miou_s, fb_s)

    def test_visualize_dumps_figures(self, tmp_path):
        """--visualize N writes internal-state figures for the first N
        episodes into <log-path>/viz without disturbing the meter trace."""
        import os

        (miou_s, fb_s), m_serial = self._run(
            tmp_path, ["--text-block", "1"], name="noviz")
        (miou_v, fb_v), m_viz = self._run(
            tmp_path, ["--text-block", "1", "--visualize", "2"], name="viz")
        assert (miou_v, fb_v) == (miou_s, fb_s)
        assert m_viz.calls == m_serial.calls
        viz_dir = tmp_path / "viz" / "viz"
        files = sorted(os.listdir(viz_dir))
        assert files == ["ep00000.png", "ep00001.png"]
        for f in files:
            assert os.path.getsize(viz_dir / f) > 1000

    def test_text_block_interrupt_and_resume(self, tmp_path):
        import pytest as _pytest

        (miou_s, fb_s), _ = self._run(tmp_path, ["--text-block", "1"],
                                      name="ref_b")
        with _pytest.raises(RuntimeError):
            self._run(tmp_path, ["--text-block", "2"], fail_at=3,
                      name="int_b")
        (miou_r, fb_r), _ = self._run(tmp_path, ["--text-block", "2"],
                                      name="int_b")
        assert (miou_r, fb_r) == (miou_s, fb_s)


def test_bucket_generated_proposals_compacts_valid_rows():
    """generate_proposals returns a FIXED decode layout whose leading rows
    can all be invalid (size-1..3 combo prompt sets); bucketing must keep
    the valid rows (best score first), not the first ``bucket`` slots."""
    import jax.numpy as jnp
    import numpy as np

    n, s = 10, 8
    masks = jnp.asarray(np.arange(n, dtype=np.float32)[:, None, None]
                        * np.ones((n, s, s), np.float32))
    valid = jnp.asarray([False] * 6 + [True] * 4)  # dead rows lead
    score = jnp.asarray([9.0] * 6 + [0.1, 0.9, 0.5, 0.7])
    out = {"proposal_masks": masks, "proposal_valid": valid,
           "mask_score": score}
    props = cli.bucket_generated_proposals(out, bucket=4)
    assert props.masks.shape == (4, s, s)
    assert bool(props.valid.all())
    # rows 7 (0.9), 9 (0.7), 8 (0.5), 6 (0.1) in score order
    np.testing.assert_array_equal(np.asarray(props.masks[:, 0, 0]),
                                  [7.0, 9.0, 8.0, 6.0])
    # a dead row must never survive, even when the bucket exceeds the
    # valid count
    props2 = cli.bucket_generated_proposals(out, bucket=8)
    assert int(props2.valid.sum()) == 4
    assert not bool(props2.valid[4:].any())
    np.testing.assert_array_equal(np.asarray(props2.masks[4:]), 0.0)
