"""Mesh/sharding/training tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mars_tpu.models import sam
from mars_tpu.parallel import mesh as mesh_lib
from mars_tpu.parallel import train as train_lib


def _tiny_cfg():
    return sam.SamConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        global_attn_indexes=(1,), window_size=2, out_chans=16,
        decoder_mlp_dim=32, decoder_heads=2,
    )


class TestMesh:
    def test_make_mesh(self):
        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        assert dict(m.shape) == {"data": 4, "model": 2}

    def test_param_sharding_rules(self):
        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        params = {
            "attn": {"qkv": {"kernel": jnp.zeros((32, 96)), "bias": jnp.zeros(96)},
                     "proj": {"kernel": jnp.zeros((32, 32)), "bias": jnp.zeros(32)}},
            "mlp": {"fc1": {"kernel": jnp.zeros((32, 128))},
                    "fc2": {"kernel": jnp.zeros((128, 32))}},
            "ln": {"scale": jnp.zeros(32)},
        }
        sh = mesh_lib.param_shardings(params, m)
        assert sh["attn"]["qkv"]["kernel"].spec == P(None, "model")
        assert sh["attn"]["proj"]["kernel"].spec == P("model", None)
        assert sh["mlp"]["fc1"]["kernel"].spec == P(None, "model")
        assert sh["mlp"]["fc2"]["kernel"].spec == P("model", None)
        assert sh["ln"]["scale"].spec == P()

    def test_sharded_forward_matches_single(self):
        """Tensor-parallel decode == replicated decode."""
        cfg = _tiny_cfg()
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        dec = sam.init_decoder_params(ks[0], cfg)
        pe = sam.init_prompt_encoder_params(ks[1], cfg)
        emb = jax.random.normal(ks[2], (4, 4, 16))
        image_pe = sam.dense_pe(pe, (4, 4))
        sparse = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 16))
        dense = jnp.zeros((2, 4, 4, 16))

        ref_masks, ref_iou = sam.decode_masks(dec, emb, image_pe, sparse, dense, cfg)

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        dec_sh = mesh_lib.shard_params(dec, m)
        masks, iou = jax.jit(
            lambda d: sam.decode_masks(d, emb, image_pe, sparse, dense, cfg)
        )(dec_sh)
        np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                                   atol=1e-4, rtol=1e-4)


class TestTrain:
    def test_train_step_reduces_loss(self):
        cfg = _tiny_cfg()
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        trainable = {
            "prompt_encoder": sam.init_prompt_encoder_params(ks[0], cfg),
            "decoder": sam.init_decoder_params(ks[1], cfg),
        }
        enc = sam.init_encoder_params(ks[2], cfg)
        b = 4
        images = jax.random.uniform(ks[3], (b, 64, 64, 3))
        embedding = sam.encode_image(enc, images, cfg)
        coords = jax.random.uniform(jax.random.PRNGKey(7), (b, 3, 2)) * 64
        labels = jnp.ones((b, 3), jnp.int32)
        gt = (jax.random.uniform(jax.random.PRNGKey(8), (b, 16, 16)) > 0.7).astype(jnp.float32)

        opt, step = train_lib.make_train_step(cfg, train_lib.TrainConfig(learning_rate=1e-3))
        opt_state = opt.init(trainable)
        step = jax.jit(step)
        losses = []
        for _ in range(5):
            trainable, opt_state, metrics = step(
                trainable, opt_state, embedding, coords, labels, gt
            )
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_accum_and_remat_match_full_batch(self):
        """accum_steps microbatching and jax.checkpoint rematerialization
        both reproduce the full-batch update (all loss terms are equal-size
        batch means, so averaged microbatch grads == full-batch grads)."""
        cfg = _tiny_cfg()
        ks = jax.random.split(jax.random.PRNGKey(2), 4)
        trainable = {
            "prompt_encoder": sam.init_prompt_encoder_params(ks[0], cfg),
            "decoder": sam.init_decoder_params(ks[1], cfg),
        }
        enc = sam.init_encoder_params(ks[2], cfg)
        b = 4
        images = jax.random.uniform(ks[3], (b, 64, 64, 3))
        embedding = sam.encode_image(enc, images, cfg)
        coords = jax.random.uniform(jax.random.PRNGKey(7), (b, 3, 2)) * 64
        labels = jnp.ones((b, 3), jnp.int32)
        gt = (jax.random.uniform(jax.random.PRNGKey(8), (b, 16, 16)) > 0.7
              ).astype(jnp.float32)

        outs = {}
        for name, kw in [("full", {}), ("accum", {"accum_steps": 2}),
                         ("remat", {"remat": True}),
                         ("both", {"accum_steps": 2, "remat": True})]:
            opt, step = train_lib.make_train_step(
                cfg, train_lib.TrainConfig(learning_rate=1e-3), **kw)
            st = opt.init(trainable)
            tr, _, metrics = jax.jit(step)(trainable, st, embedding, coords,
                                           labels, gt)
            outs[name] = (tr, float(metrics["loss"]))
        ref_tr, ref_loss = outs["full"]
        for name in ("accum", "remat", "both"):
            tr, loss = outs[name]
            assert abs(loss - ref_loss) < 1e-5, (name, loss, ref_loss)
            jax.tree.map(
                lambda a, b2: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b2), atol=1e-6),
                tr, ref_tr)

        import pytest

        opt, step = train_lib.make_train_step(cfg, accum_steps=3)
        with pytest.raises(ValueError, match="not divisible"):
            jax.jit(step)(trainable, opt.init(trainable), embedding, coords,
                          labels, gt)

    def test_train_step_sharded(self):
        """dp x tp training step runs and matches replicated loss."""
        cfg = _tiny_cfg()
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        trainable = {
            "prompt_encoder": sam.init_prompt_encoder_params(ks[0], cfg),
            "decoder": sam.init_decoder_params(ks[1], cfg),
        }
        enc = sam.init_encoder_params(ks[2], cfg)
        b = 8
        images = jax.random.uniform(ks[3], (b, 64, 64, 3))
        embedding = sam.encode_image(enc, images, cfg)
        coords = jax.random.uniform(jax.random.PRNGKey(7), (b, 3, 2)) * 64
        labels = jnp.ones((b, 3), jnp.int32)
        gt = (jax.random.uniform(jax.random.PRNGKey(8), (b, 16, 16)) > 0.7).astype(jnp.float32)

        loss_ref, _ = train_lib.segmentation_loss(
            trainable, embedding, coords, labels, gt, cfg, train_lib.TrainConfig()
        )

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        dsh = NamedSharding(m, P("data"))
        tr_sh = mesh_lib.shard_params(trainable, m)
        args = [jax.device_put(x, dsh) for x in (embedding, coords, labels, gt)]
        loss_sh, _ = jax.jit(
            lambda t, e, c, l, g: train_lib.segmentation_loss(
                t, e, c, l, g, cfg, train_lib.TrainConfig())
        )(tr_sh, *args)
        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-3)


class TestBatchedRanker:
    def test_episode_parallel_matches_loop(self):
        """vmapped+sharded ranking == per-episode loop."""
        from mars_tpu.models import clip as clip_m, dinov2
        from mars_tpu.parallel import runner
        from mars_tpu.pipeline import filtering, vta, vva

        g = 4
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        cvcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=3, num_heads=1, output_dim=16,
            pos_embed_grid=2,
        )
        avcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
            pos_embed_grid=2, alpha_channel=True,
        )
        vcfg = vva.VVAConfig(grid=g, attn_tap_last_n=2)
        tcfg = vta.VTAConfig(input_size=64, grid=4, attn_tap_last_n=2)
        fcfg = filtering.FilterMergeConfig(
            grid=g, alpha_clip_size=32, alpha_clip_batch=4,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        params = {
            "dino": dinov2.init_params(ks[0], dcfg),
            "clip_v": clip_m.init_visual_params(ks[1], cvcfg),
            "ac_v": clip_m.init_visual_params(ks[2], avcfg),
            "logit_scale": jnp.float32(1.0),
        }
        b, s_img, p = 4, 56, 4
        sup_i = jax.random.uniform(ks[3], (b, 1, s_img, s_img, 3))
        sup_m = jnp.zeros((b, 1, s_img, s_img)).at[:, :, 10:40, 10:40].set(1.0)
        sup_v = jnp.ones((b, 1), bool)
        qry = jax.random.uniform(ks[4], (b, s_img, s_img, 3))
        prop_m = (jax.random.uniform(ks[5], (b, p, s_img, s_img)) > 0.7).astype(jnp.float32)
        prop_v = jnp.ones((b, p), bool)
        vta_text = jax.random.normal(ks[6], (b, 2, 16))
        ac_text = jax.random.normal(ks[7], (b, 1, 16))
        ac_text = ac_text / jnp.linalg.norm(ac_text, axis=-1, keepdims=True)

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        ranker = runner.make_batched_ranker(dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg, mesh=m)
        args = runner.shard_batch(
            (sup_i, sup_m, sup_v, qry, prop_m, prop_v, vta_text, ac_text), m
        )
        merged, scores = ranker(params, *args)
        assert merged.shape == (b, s_img, s_img)

        # reference: unsharded per-episode loop
        ranker1 = runner.make_batched_ranker(dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg)
        merged_ref, scores_ref = ranker1(
            params, sup_i, sup_m, sup_v, qry, prop_m, prop_v, vta_text, ac_text
        )
        np.testing.assert_allclose(np.asarray(merged), np.asarray(merged_ref), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(scores_ref), atol=1e-3
        )

        # collective-freedom guard: with replicated params (n_model=1) and
        # the batch sharded over 'data', episode work must never cross chips
        # — GSPMD should insert ZERO collectives into the compiled ranker
        m_dp = mesh_lib.make_mesh(n_data=8, n_model=1)
        ranker_dp = runner.make_batched_ranker(
            dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg, mesh=m_dp)
        b8 = lambda x: jnp.concatenate([x, x], axis=0)  # batch 4 -> 8
        args8 = runner.shard_batch(
            tuple(b8(x) for x in
                  (sup_i, sup_m, sup_v, qry, prop_m, prop_v, vta_text,
                   ac_text)), m_dp)
        hlo = ranker_dp.lower(params, *args8).compile().as_text()
        for op in ("all-reduce", "all-gather", "collective-permute",
                   "all-to-all", "reduce-scatter", "collective-broadcast"):
            assert op not in hlo, f"episode-parallel ranker emits {op}"

    def test_pallas_attention_mesh_compatibility(self, monkeypatch):
        """GSPMD cannot partition a Mosaic kernel, so runner shard_maps
        must (a) go FULLY manual when every non-primary axis is size 1 —
        the pallas attention tap then runs per-chip as written (the
        round-4 cli_parallel --mesh-data 1 hardware failure: the auto
        'model' axis of size 1 still routed the body through the GSPMD
        partitioner) — and (b) trace the XLA attention path whenever a
        real tensor-parallel axis stays auto."""
        from mars_tpu.models import clip as clip_m, dinov2, layers
        from mars_tpu.ops import flash_attention
        from mars_tpu.parallel import runner
        from mars_tpu.pipeline import filtering, vta, vva

        g = 4
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4)
        cvcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
            pos_embed_grid=2)
        avcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
            pos_embed_grid=2, alpha_channel=True)
        vcfg = vva.VVAConfig(grid=g, attn_tap_last_n=2)
        tcfg = vta.VTAConfig(input_size=64, grid=4, attn_tap_last_n=2)
        fcfg = filtering.FilterMergeConfig(
            grid=g, alpha_clip_size=32, alpha_clip_batch=4,
            emd_row_bucket=16, emd_col_bucket=16)
        ks = jax.random.split(jax.random.PRNGKey(1), 8)
        params = {
            "dino": dinov2.init_params(ks[0], dcfg),
            "clip_v": clip_m.init_visual_params(ks[1], cvcfg),
            "ac_v": clip_m.init_visual_params(ks[2], avcfg),
            "logit_scale": jnp.float32(1.0),
        }
        b, s_img, p = 8, 56, 4
        sup_i = jax.random.uniform(ks[3], (b, 1, s_img, s_img, 3))
        sup_m = jnp.zeros((b, 1, s_img, s_img)).at[:, :, 10:40, 10:40].set(1.0)
        sup_v = jnp.ones((b, 1), bool)
        qry = jax.random.uniform(ks[4], (b, s_img, s_img, 3))
        prop_m = (jax.random.uniform(ks[5], (b, p, s_img, s_img)) > 0.7
                  ).astype(jnp.float32)
        prop_v = jnp.ones((b, p), bool)
        vta_text = jax.random.normal(ks[6], (b, 2, 16))
        ac_text = jax.random.normal(ks[7], (b, 1, 16))
        ac_text = ac_text / jnp.linalg.norm(ac_text, axis=-1, keepdims=True)
        batch = (sup_i, sup_m, sup_v, qry, prop_m, prop_v, vta_text, ac_text)

        calls = []
        orig = flash_attention.mha_pallas
        monkeypatch.setattr(
            flash_attention, "mha_pallas",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        # CPU stands in for TPU via the interpret-mode kernel
        monkeypatch.setattr(layers, "_ATTENTION_IMPL", "pallas_interpret")

        # XLA reference (unsharded)
        with layers.attention_impl("xla"):
            ref_m, ref_s = runner.make_batched_ranker(
                dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg)(params, *batch)
        assert not calls

        # (a) model axis size 1 → fully manual → the pallas tap RUNS
        m_dp = mesh_lib.make_mesh(n_data=8, n_model=1)
        out_m, out_s = runner.make_batched_ranker(
            dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg, mesh=m_dp)(
            params, *runner.shard_batch(batch, m_dp))
        assert calls, "fully-manual mesh must trace the pallas tap"
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                                   atol=1e-3)

        # (b) real tensor-parallel axis stays auto → XLA path traced
        calls.clear()
        m_tp = mesh_lib.make_mesh(n_data=4, n_model=2)
        out_m2, _ = runner.make_batched_ranker(
            dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg, mesh=m_tp)(
            params, *runner.shard_batch(batch, m_tp))
        assert not calls, "auto-axis mesh must trace the XLA attention path"
        np.testing.assert_allclose(np.asarray(out_m2), np.asarray(ref_m),
                                   atol=1e-5)
        # the trace-time override restored the global impl
        assert layers._ATTENTION_IMPL == "pallas_interpret"

    def test_proposal_parallel_matches_single(self):
        """Proposal-sharded single-episode ranking == the unsharded fused
        ranking path (same per-proposal numerics; cross-proposal
        reductions become collectives)."""
        from mars_tpu.core import imaging
        from mars_tpu.models import clip as clip_m, dinov2
        from mars_tpu.parallel import runner
        from mars_tpu.pipeline import filtering, vta, vva

        g = 4
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        cvcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=3, num_heads=1, output_dim=16,
            pos_embed_grid=2,
        )
        avcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
            pos_embed_grid=2, alpha_channel=True,
        )
        vcfg = vva.VVAConfig(grid=g, attn_tap_last_n=2)
        tcfg = vta.VTAConfig(input_size=64, grid=4, attn_tap_last_n=2)
        fcfg = filtering.FilterMergeConfig(
            grid=g, alpha_clip_size=32, alpha_clip_batch=2,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        ks = jax.random.split(jax.random.PRNGKey(1), 8)
        params = {
            "dino": dinov2.init_params(ks[0], dcfg),
            "clip_v": clip_m.init_visual_params(ks[1], cvcfg),
            "ac_v": clip_m.init_visual_params(ks[2], avcfg),
            "logit_scale": jnp.float32(1.0),
        }
        s_img, p = 56, 16  # 16 proposals over 8 chips = 2 rows/chip
        sup_i = jax.random.uniform(ks[3], (1, s_img, s_img, 3))
        sup_m = jnp.zeros((1, s_img, s_img)).at[:, 10:40, 10:40].set(1.0)
        sup_v = jnp.ones((1,), bool)
        qry = jax.random.uniform(ks[4], (s_img, s_img, 3))
        prop_m = (jax.random.uniform(ks[5], (p, s_img, s_img)) > 0.7).astype(jnp.float32)
        # dead rows in the middle: the per-chip dead-chunk skip and the
        # valid-masked reductions must both handle a partially-dead shard
        prop_v = jnp.asarray([True] * 6 + [False] * 4 + [True] * 6)
        vta_text = jax.random.normal(ks[6], (2, 16))
        ac_text = jax.random.normal(ks[7], (1, 16))
        ac_text = ac_text / jnp.linalg.norm(ac_text, axis=-1, keepdims=True)

        m = mesh_lib.make_mesh(n_data=8, n_model=1)
        ranker = runner.make_proposal_parallel_ranker(
            dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg, mesh=m)
        psh = NamedSharding(m, P("data"))
        merged, final = ranker(
            params, sup_i, sup_m, sup_v, qry,
            jax.device_put(prop_m, psh), jax.device_put(prop_v, psh),
            vta_text, ac_text)

        # reference: the single-device fused ranking graph
        vva_prior, cost, support_fg = vva.compute(
            params["dino"], sup_i, sup_m, sup_v, qry, dcfg, vcfg)
        vta_prior = vta.compute(
            params["clip_v"], qry, vta_text, params["logit_scale"], cvcfg, tcfg)
        vta_prior = imaging.interpolate_2d(vta_prior, (g, g), "nearest")
        vta_prior = (vta_prior - vta_prior.min()) / (
            1e-7 + vta_prior.max() - vta_prior.min())
        ac = filtering.alphaclip_scores(
            params["ac_v"], qry, prop_m, ac_text, avcfg, fcfg,
            proposal_valid=prop_v)
        merged_ref, final_ref = filtering.score_and_merge(
            prop_m, prop_v, support_fg, cost, vva_prior, vta_prior, ac, fcfg)

        np.testing.assert_allclose(np.asarray(merged), np.asarray(merged_ref),
                                   atol=1e-5)
        fin = np.asarray(final)
        fin_ref = np.asarray(final_ref)
        vmask = np.asarray(prop_v)
        np.testing.assert_allclose(fin[vmask], fin_ref[vmask], atol=1e-4)

        # bucket not divisible by the axis → explicit error
        import pytest

        with pytest.raises(ValueError, match="not divisible"):
            ranker(params, sup_i, sup_m, sup_v, qry, prop_m[:12],
                   prop_v[:12], vta_text, ac_text)

        # 2D production topology: proposals over 'data' AND tensor-parallel
        # towers over 'model' (shard_map leaves the model axis auto, so
        # GSPMD partitions the qkv/fc kernels inside each proposal shard)
        m2 = mesh_lib.make_mesh(n_data=4, n_model=2)
        params_tp = {
            "dino": mesh_lib.shard_params(params["dino"], m2),
            "clip_v": mesh_lib.shard_params(params["clip_v"], m2),
            "ac_v": mesh_lib.shard_params(params["ac_v"], m2),
            "logit_scale": params["logit_scale"],
        }
        ranker2 = runner.make_proposal_parallel_ranker(
            dcfg, cvcfg, avcfg, vcfg, tcfg, fcfg, mesh=m2)
        psh2 = NamedSharding(m2, P("data"))
        merged2, final2 = ranker2(
            params_tp, sup_i, sup_m, sup_v, qry,
            jax.device_put(prop_m, psh2), jax.device_put(prop_v, psh2),
            vta_text, ac_text)
        np.testing.assert_allclose(np.asarray(merged2),
                                   np.asarray(merged_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(final2)[vmask],
                                   fin_ref[vmask], atol=1e-4)


class TestVlmTensorParallel:
    """Tensor-parallel ViP-LLaVA decode over the model axis: q/k/v + gate/up
    shard output features, o/down shard input features (one psum per block,
    inserted by GSPMD from the parameter shardings)."""

    def test_vlm_sharding_rules(self):
        from mars_tpu.models import vip_llava as vl

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        p = vl.init_random_params(0, vl.TINY, dtype=jnp.float32)
        sh = mesh_lib.param_shardings(p, m)
        l0 = sh["language"]["layer0"]
        assert l0["attn"]["q"]["kernel"].spec == P(None, "model")
        assert l0["attn"]["k"]["kernel"].spec == P(None, "model")
        assert l0["attn"]["o"]["kernel"].spec == P("model", None)
        assert l0["mlp"]["gate"]["kernel"].spec == P(None, "model")
        assert l0["mlp"]["up"]["kernel"].spec == P(None, "model")
        assert l0["mlp"]["down"]["kernel"].spec == P("model", None)
        # norms / embeddings replicate
        assert sh["language"]["norm"].spec == P()
        assert sh["language"]["embed_tokens"].spec == P()

    def test_quantized_kernel_sharding_rules(self):
        from mars_tpu.models import quantization as Q
        from mars_tpu.models import vip_llava as vl

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        p = vl.init_random_params(0, vl.TINY, dtype=jnp.float32)
        qp = Q.quantize_params(p, bits=8, min_size=64)
        sh = mesh_lib.param_shardings(qp, m)
        l0 = sh["language"]["layer0"]
        assert l0["attn"]["q"]["kernel"]["q"].spec == P(None, "model")
        assert l0["attn"]["q"]["kernel"]["scale"].spec == P("model")
        assert l0["attn"]["o"]["kernel"]["q"].spec == P("model", None)
        assert l0["attn"]["o"]["kernel"]["scale"].spec == P()

    def test_int4_kernel_stays_fully_replicated(self):
        """Packed-int4 kernels are not GSPMD-partitionable (Pallas matmul),
        so BOTH the q4 weight and its sibling scale must replicate — a
        sharded scale next to a replicated weight forces a reshard in the
        matmul epilogue."""
        from mars_tpu.models import quantization as Q
        from mars_tpu.models import vip_llava as vl

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        p = vl.init_random_params(0, vl.TINY, dtype=jnp.float32)
        qp = Q.quantize_params(p, bits=4, min_size=64)
        sh = mesh_lib.param_shardings(qp, m)
        l0 = sh["language"]["layer0"]
        assert l0["attn"]["q"]["kernel"]["q4"].spec == P()
        assert l0["attn"]["q"]["kernel"]["scale"].spec == P()
        assert l0["mlp"]["gate"]["kernel"]["scale"].spec == P()

    def test_tp_generate_matches_replicated(self):
        """Sharded params must reproduce the replicated greedy tokens
        bit-for-bit (same math, partitioned)."""
        from mars_tpu.models import vip_llava as vl

        cfg = vl.TINY  # heads=4, kv_heads=2 -> n_model=2 divides both
        p = vl.init_random_params(11, cfg, dtype=jnp.float32)
        g = (cfg.image_size // cfg.patch_size) ** 2
        l0 = 9 + g
        ids = np.full((2, l0), 5, np.int64)
        ids[:, 3:3 + g] = cfg.image_token_index
        pixels = jnp.asarray(
            np.random.RandomState(3).rand(2, 56, 56, 3), jnp.float32)
        want = vl.generate_greedy(p, jnp.asarray(ids), pixels, cfg,
                                  max_new_tokens=6)

        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        with m:
            ps = mesh_lib.shard_params(p, m)
            got = vl.generate_greedy(ps, jnp.asarray(ids), pixels, cfg,
                                     max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


class TestBatchedProposalGenerator:
    def test_episode_parallel_matches_loop(self):
        """dp proposal generation (union-family rows, shard_map over data)
        is bit-exact vs the per-episode generate_proposals host flow for
        every episode, whichever prompt family each episode activates."""
        from mars_tpu.models import dinov2
        from mars_tpu.parallel import runner
        from mars_tpu.pipeline import amg, matcher

        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        mcfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(2, 3), max_sample_iterations=4,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        acfg = amg.AmgConfig(
            sel_pred_iou_thresh=0.0, sel_stability_score_thresh=0.0,
            decode_batch=8,
        )
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "dino": dinov2.init_params(k1, dcfg),
            "sam": {
                "encoder": sam.init_encoder_params(k2, scfg),
                "prompt_encoder": sam.init_prompt_encoder_params(k3, scfg),
                "decoder": sam.init_decoder_params(k4, scfg),
            },
        }

        b, s, h, bucket = 8, 1, 56, 8
        rng = np.random.RandomState(3)
        sup = jnp.asarray(rng.rand(b, s, h, h, 3), jnp.float32)
        qry = jnp.asarray(rng.rand(b, h, h, 3), jnp.float32)
        sup_m = np.zeros((b, s, h, h), np.float32)
        for i in range(b):
            # vary footprint size to vary the matched-point count n across
            # episodes (both prompt families should occur; asserted below)
            x0, y0 = rng.randint(0, 20, 2)
            wd = 8 + 5 * i
            sup_m[i, :, y0:y0 + wd, x0:x0 + wd] = 1.0
        sup_m = jnp.asarray(sup_m)
        sup_v = jnp.ones((b, s), bool)
        keys = jnp.stack([jax.random.PRNGKey(100 + i) for i in range(b)])

        # reference: the per-episode host flow (active-family rows)
        want, fams = [], set()
        for i in range(b):
            out = matcher.generate_proposals(
                keys[i], params["dino"], dcfg, params["sam"], scfg,
                acfg, mcfg, sup[i], sup_m[i], sup_v[i], qry[i],
                bucket=bucket,
            )
            n = int(np.sum(np.asarray(out["point_valid"])))
            fams.add("draws" if n > 8 else "combos")
            want.append(out)

        m = mesh_lib.make_mesh(n_data=8, n_model=1)
        gen = runner.make_batched_proposal_generator(
            dcfg, scfg, acfg, mcfg, m, bucket=bucket)
        got = gen(params, keys, sup, sup_m, sup_v, qry)

        for i in range(b):
            np.testing.assert_array_equal(
                np.asarray(got["bucket_masks"][i]),
                np.asarray(want[i]["bucket_masks"]), err_msg=f"ep {i}")
            np.testing.assert_array_equal(
                np.asarray(got["bucket_valid"][i]),
                np.asarray(want[i]["bucket_valid"]), err_msg=f"ep {i}")
            np.testing.assert_array_equal(
                np.asarray(got["merged"][i]),
                np.asarray(want[i]["merged"]), err_msg=f"ep {i}")
        assert fams == {"combos", "draws"}, (
            f"setup exercised only {fams}; vary masks to cover both families")


class TestSamKernelMeshCompatibility:
    def test_grid_attention_pallas_under_manual_shard_map(self, monkeypatch):
        """The SAM global-attention kernel (ops/sam_attention.py) must lower
        inside a FULLY-MANUAL shard_map (the dp proposal generator's
        regime); with a real auto axis the runner traces the XLA path
        instead — same contract as the flash tap (round-4 Mosaic rule)."""
        from mars_tpu.models import layers

        rng = np.random.RandomState(0)
        b, h, w, c, nh = 8, 32, 32, 16, 2
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        hd = c // nh
        p = {
            "qkv": {"kernel": jnp.asarray(
                rng.randn(c, 3 * c).astype(np.float32) * 0.05),
                "bias": jnp.zeros((3 * c,), jnp.float32)},
            "proj": {"kernel": jnp.asarray(
                rng.randn(c, c).astype(np.float32) * 0.05),
                "bias": jnp.zeros((c,), jnp.float32)},
            "rel_pos_h": jnp.asarray(
                rng.randn(2 * h - 1, hd).astype(np.float32) * 0.1),
            "rel_pos_w": jnp.asarray(
                rng.randn(2 * w - 1, hd).astype(np.float32) * 0.1),
        }
        ref = sam._grid_attention(p, x, nh)

        m = mesh_lib.make_mesh(n_data=8, n_model=1)
        monkeypatch.setattr(layers, "_ATTENTION_IMPL", "pallas_interpret")

        def body(xb):
            return sam._grid_attention(p, xb, nh, allow_pallas=True)

        out = jax.shard_map(
            body, mesh=m,
            in_specs=P("data"), out_specs=P("data"),
            check_vma=False)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)
