"""Data substrate + evaluation tests, and the full-MARS integration test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.core.episode import pad_proposals
from mars_tpu.data import build_dataset, to_device_episode
from mars_tpu.data.base import resized_gt
from mars_tpu.utils import evaluation


class TestSynthetic:
    def test_episode_shapes(self):
        ds = build_dataset("synthetic", shot=2, size=128, num_episodes=4)
        rec = ds[0]
        assert rec.query_img.shape == (128, 128, 3)
        assert len(rec.support_imgs) == 2
        assert rec.query_mask.sum() > 0
        # deterministic
        rec2 = ds[0]
        np.testing.assert_array_equal(rec.query_img, rec2.query_img)

    def test_to_device_episode_padding(self):
        ds = build_dataset("synthetic", shot=1, size=100, num_episodes=2)
        ep = to_device_episode(ds[0], size=56, max_shots=3)
        assert ep.support_images.shape == (3, 56, 56, 3)
        assert np.asarray(ep.support_valid).tolist() == [True, False, False]
        assert ep.query_image.shape == (56, 56, 3)
        assert float(ep.query_image.max()) <= 1.0


class TestEvaluator:
    def test_classify_prediction(self):
        pred = np.zeros((10, 10))
        gt = np.zeros((10, 10))
        pred[:5] = 1
        gt[:, :5] = 1
        inter, union = evaluation.classify_prediction(pred, gt)
        # fg: inter 25, pred 50, gt 50 → union 75
        assert inter[1] == 25 and union[1] == 75
        # bg: inter 25, union 75
        assert inter[0] == 25 and union[0] == 75

    def test_ignore_mask(self):
        pred = np.ones((4, 4))
        gt = np.ones((4, 4))
        ig = np.zeros((4, 4))
        ig[0] = 1  # ignore first row
        inter, union = evaluation.classify_prediction(pred, gt, ig)
        assert inter[1] == 12 and union[1] == 12

    def test_meter_miou(self):
        m = evaluation.AverageMeter("synthetic", [0, 1])
        m.update(np.array([10.0, 50.0]), np.array([20.0, 100.0]), 0)  # cls0 fg IoU .5
        m.update(np.array([10.0, 25.0]), np.array([20.0, 100.0]), 1)  # cls1 fg IoU .25
        miou, fb, per = m.compute_iou()
        np.testing.assert_allclose(miou, 37.5)
        assert per.shape == (2,)


class TestMarsIntegration:
    def test_full_predict_tiny(self):
        """End-to-end MARS.predict on a tiny synthetic episode with
        random-weight tiny backbones + OracleVLM."""
        from mars_tpu.models import clip as clip_m, dinov2
        from mars_tpu.pipeline import filtering, mars, vta, vva
        from mars_tpu.text.retriever import OracleVLM, TextRetriever

        size, g = 56, 4
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        cvcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=3, num_heads=1, output_dim=16, pos_embed_grid=2
        )
        ctcfg = clip_m.ClipTextConfig(width=16, depth=2, num_heads=2, output_dim=16)
        avcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
            pos_embed_grid=2, alpha_channel=True,
        )
        atcfg = ctcfg

        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        model = mars.Mars(
            dino=(dinov2.init_params(ks[0], dcfg), dcfg),
            clip=(clip_m.init_visual_params(ks[1], cvcfg),
                  clip_m.init_text_params(ks[2], ctcfg),
                  jnp.float32(np.log(1 / 0.07)), cvcfg, ctcfg),
            alpha_clip=(clip_m.init_visual_params(ks[3], avcfg),
                        clip_m.init_text_params(ks[4], atcfg),
                        jnp.float32(np.log(1 / 0.07)), avcfg, atcfg),
            retriever=TextRetriever(OracleVLM("square")),
            cfg=mars.MarsConfig(
                vva=vva.VVAConfig(grid=g, attn_tap_last_n=2),
                vta=vta.VTAConfig(input_size=64, grid=4, attn_tap_last_n=2),
                filter_merge=filtering.FilterMergeConfig(
                    grid=g, alpha_clip_size=32,
                    emd_row_bucket=16, emd_col_bucket=16,
                ),
            ),
        )
        ds = build_dataset("synthetic", shot=1, size=size, num_episodes=1)
        rec = ds[0]
        ep = to_device_episode(rec, size=size, max_shots=1)
        # proposals: gt-ish + junk
        gt, _ = resized_gt(rec, size)
        junk = np.zeros_like(gt)
        junk[:10, :10] = 1
        props = pad_proposals(jnp.asarray(np.stack([gt, junk])), 4)

        pred = model.predict(ep, props, class_name="square")
        pred = np.asarray(pred)
        assert pred.shape == (size, size)
        assert set(np.unique(pred)).issubset({0.0, 1.0})
        assert model.timings["total"] > 0
        inter, union = evaluation.classify_prediction(pred, gt)
        assert np.isfinite(inter).all()


class TestMultiShot:
    def test_vva_two_shots_with_padding(self):
        """2 real shots + 1 padded shot: padded shot contributes nothing."""
        from mars_tpu.models import dinov2
        from mars_tpu.pipeline import vva

        cfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
        vcfg = vva.VVAConfig(grid=4, attn_tap_last_n=2)
        sup3 = jax.random.uniform(jax.random.PRNGKey(1), (3, 56, 56, 3))
        qry = jax.random.uniform(jax.random.PRNGKey(2), (56, 56, 3))
        masks = jnp.zeros((3, 56, 56)).at[:, 10:40, 10:40].set(1.0)
        valid2 = jnp.asarray([True, True, False])
        p2, c2, fg2 = vva.compute(params, sup3, masks, valid2, qry, cfg, vcfg)
        # changing the PADDED shot's content must not change the prior
        sup3b = sup3.at[2].set(0.12345)
        p2b, _, fg2b = vva.compute(params, sup3b, masks, valid2, qry, cfg, vcfg)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p2b), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(fg2), np.asarray(fg2b))
        # padded shot's rows are all background-excluded
        assert not np.asarray(fg2).reshape(3, -1)[2].any()


class TestOrbaxCache:
    def test_save_load_roundtrip(self, tmp_path):
        from mars_tpu.models import zoo

        params = {"block0": {"attn": {"qkv": {"kernel": jnp.arange(12.0).reshape(3, 4)}}},
                  "scale": jnp.float32(2.5)}
        zoo.save_params(params, str(tmp_path / "ck"))
        back = zoo.load_params(str(tmp_path / "ck"))
        np.testing.assert_allclose(
            np.asarray(back["block0"]["attn"]["qkv"]["kernel"]),
            np.arange(12.0).reshape(3, 4),
        )


class TestVisualize:
    def test_plot_episode(self, tmp_path):
        from mars_tpu.utils import visualize

        rng = np.random.RandomState(0)
        path = visualize.plot_episode(
            str(tmp_path / "ep.png"),
            query_img=rng.randint(0, 255, (64, 64, 3), dtype=np.uint8),
            support_img=rng.randint(0, 255, (64, 64, 3), dtype=np.uint8),
            support_mask=(rng.rand(64, 64) > 0.8).astype(np.float32),
            points=rng.rand(10, 2) * 64,
            point_valid=np.ones(10, bool),
            vva=rng.rand(4, 4),
            vta=rng.rand(4, 4),
            proposals=(rng.rand(3, 64, 64) > 0.7).astype(np.float32),
            proposal_valid=np.ones(3, bool),
            scores=rng.rand(3),
            merged=(rng.rand(64, 64) > 0.5).astype(np.float32),
            gt=(rng.rand(64, 64) > 0.5).astype(np.float32),
            title="test",
        )
        import os

        assert os.path.getsize(path) > 1000


class TestUtils:
    def test_stage_timers(self):
        from mars_tpu.utils.profiling import StageTimers

        t = StageTimers()
        with t.span("a"):
            pass
        with t.span("a"):
            pass
        assert t.counts["a"] == 2
        assert "a=" in t.report()

    def test_logging(self, tmp_path):
        from mars_tpu.utils import logging as mlog

        logger = mlog.initialize(str(tmp_path), "exp")
        logger.info("hello")
        import os

        logpath = logger.logpath
        with open(os.path.join(logpath, "log.txt")) as f:
            assert "hello" in f.read()
        w = mlog.ScalarWriter(logpath)
        w.write(1, miou=50.0)
        w.close()
        with open(w.path) as f:
            assert "miou" in f.read()


class TestDatasetSplitLogic:
    """Fold/split math without data on disk."""

    def test_coco_fold_classes(self):
        from mars_tpu.data.coco import DatasetCOCO20i

        ids = DatasetCOCO20i.__new__(DatasetCOCO20i)
        ids.split, ids.fold = "val", 2
        assert ids.build_class_ids() == [2 + 4 * v for v in range(20)]
        ids.split = "trn"
        trn = ids.build_class_ids()
        assert len(trn) == 60 and 2 not in trn

    def test_pascal_plain_fold_classes(self, tmp_path):
        import os

        from mars_tpu.data.pascal import DatasetPascal

        # minimal split files
        base = tmp_path / "VOC2012" / "splits" / "val"
        os.makedirs(base)
        (base / "fold1.txt").write_text("img_a__6\nimg_b__7\n")
        ds = DatasetPascal(str(tmp_path), fold=1, split="val", shot=1)
        assert ds.class_ids == [5, 6, 7, 8, 9]
        assert ds.img_metadata == [("img_a", 5), ("img_b", 6)]

    def test_parts_episode_with_synthetic_pkls(self, tmp_path):
        import os
        import pickle

        import numpy as np
        from PIL import Image

        from mars_tpu.data.parts import DatasetPacoPart

        base = tmp_path / "PACO-Part"
        os.makedirs(base / "paco")
        os.makedirs(base / "coco" / "val")
        # two images of class 5, each with one object of two part polygons
        img2anno, cid2img = {}, {5: []}
        for i in range(3):
            name = f"val/im{i}.jpg"
            Image.fromarray(
                np.random.RandomState(i).randint(0, 255, (40, 40, 3), np.uint8)
            ).save(base / "coco" / f"val/im{i}.jpg")
            cid2img[5].append({100 + i: name})
            img2anno[100 + i] = [
                {"category_id": 5, "obj_ann_id": 1, "obj_bbox": [5, 5, 25, 25],
                 "segmentation": [[6, 6, 20, 6, 20, 20]]},
                {"category_id": 5, "obj_ann_id": 1, "obj_bbox": [5, 5, 25, 25],
                 "segmentation": [[6, 22, 20, 22, 20, 28]]},
            ]
        anno = {"cid2img": cid2img, "img2anno": img2anno}
        for name in ("paco_part_train.pkl", "paco_part_val.pkl"):
            with open(base / "paco" / name, "wb") as f:
                pickle.dump(anno, f)

        # nclass check bypass: patch class count to the synthetic set
        DatasetPacoPart.nclass = 4
        DatasetPacoPart.nfolds = 4
        ds = DatasetPacoPart(str(tmp_path), fold=0, split="val", shot=1, box_crop=True)
        rec = ds[0]
        assert rec.query_mask.sum() > 0
        assert rec.query_img.shape[:2] == rec.query_mask.shape
        assert len(rec.support_imgs) == 1


class TestServing:
    def test_server_roundtrip_and_queue(self):
        from mars_tpu.models import clip as clip_m, dinov2
        from mars_tpu.pipeline import filtering, mars, vta, vva
        from mars_tpu.serving import MarsServer, PredictRequest
        from mars_tpu.text.retriever import OracleVLM, TextRetriever

        size, g = 56, 4
        dcfg = dinov2.DinoV2Config(patch_size=14, embed_dim=32, depth=2,
                                   num_heads=2, num_register_tokens=4,
                                   pos_embed_grid=4)
        cvcfg = clip_m.ClipVisualConfig(patch_size=16, width=64, depth=3,
                                        num_heads=1, output_dim=16, pos_embed_grid=2)
        ctcfg = clip_m.ClipTextConfig(width=16, depth=2, num_heads=2, output_dim=16)
        avcfg = clip_m.ClipVisualConfig(patch_size=16, width=64, depth=2,
                                        num_heads=1, output_dim=16,
                                        pos_embed_grid=2, alpha_channel=True)
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        model = mars.Mars(
            dino=(dinov2.init_params(ks[0], dcfg), dcfg),
            clip=(clip_m.init_visual_params(ks[1], cvcfg),
                  clip_m.init_text_params(ks[2], ctcfg),
                  jnp.float32(1.0), cvcfg, ctcfg),
            alpha_clip=(clip_m.init_visual_params(ks[3], avcfg),
                        clip_m.init_text_params(ks[4], ctcfg),
                        jnp.float32(1.0), avcfg, ctcfg),
            retriever=TextRetriever(OracleVLM("square")),
            cfg=mars.MarsConfig(
                vva=vva.VVAConfig(grid=g, attn_tap_last_n=2),
                vta=vta.VTAConfig(input_size=64, grid=4, attn_tap_last_n=2),
                filter_merge=filtering.FilterMergeConfig(
                    grid=g, alpha_clip_size=32, alpha_clip_batch=4,
                    emd_row_bucket=16, emd_col_bucket=16),
            ),
        )
        ds = build_dataset("synthetic", shot=1, size=size, num_episodes=2)
        rec = ds[0]
        gt, _ = resized_gt(rec, size)
        props = np.stack([gt, np.zeros_like(gt)])
        server = MarsServer(model, input_size=size, max_shots=1, proposal_bucket=4)

        # synchronous
        res = server.predict(PredictRequest(rec, props, class_name="square"))
        assert res.mask.shape == (size, size)
        assert res.timings["total"] > 0

        # queued
        results = []
        server.start(results.append)
        for i in range(2):
            server.submit(PredictRequest(ds[i], props, class_name="square",
                                         request_id=i))
        server.stop()
        assert sorted(r.request_id for r in results) == [0, 1]


class TestServingRobustness:
    def test_host_bucket_resizes_and_reports_drops(self):
        from mars_tpu.serving import _host_bucket_proposals

        props = np.zeros((5, 30, 40), np.float32)
        props[:, 10:20, 10:30] = 1
        stack, valid, dropped = _host_bucket_proposals(props, 16, 3)
        assert stack.shape == (3, 16, 16) and stack.dtype == np.uint8
        assert valid.tolist() == [True] * 3
        assert dropped == 2
        assert stack[0].sum() > 0  # content survived the resize
        with pytest.raises(ValueError):
            _host_bucket_proposals(np.zeros((16, 16)), 16, 3)

    def test_worker_delivers_errors_and_keeps_draining(self):
        from mars_tpu import serving

        class _Boom:
            timings = {}

            def predict(self, *a, **k):
                raise RuntimeError("boom")

        srv = serving.MarsServer(_Boom(), input_size=16, proposal_bucket=2)
        # route predict() through the real code path but with a model that
        # raises: the worker must deliver the error and stay alive
        results = []
        srv.start(results.append)
        rec = None

        def fake_predict(req):
            if req.request_id == 1:
                raise RuntimeError("boom")
            return serving.PredictResult(request_id=req.request_id,
                                         mask=np.zeros((2, 2)))

        srv.predict = fake_predict
        srv.submit(serving.PredictRequest(rec, np.zeros((1, 4, 4)),
                                          request_id=1))
        srv.submit(serving.PredictRequest(rec, np.zeros((1, 4, 4)),
                                          request_id=2))
        srv.stop()
        assert [r.request_id for r in results] == [1, 2]
        assert isinstance(results[0].error, RuntimeError)
        assert results[1].error is None

    def test_double_start_raises(self):
        from mars_tpu import serving

        srv = serving.MarsServer(object(), input_size=16)
        srv.start(lambda r: None)
        with pytest.raises(RuntimeError):
            srv.start(lambda r: None)
        srv.stop()
