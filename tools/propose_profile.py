"""Micro-profile of matcher._propose_stage substages on the real chip.

Times a ladder of separately-jitted programs at production geometry
(DINOv2-L + SAM ViT-B @518) and reports the deltas:

  match       — the full program-1 (_match_stage)
  sample      — prompt-set sampling only
  +encode     — sampling + SAM image encode
  +decode     — sampling + encode + batched decode of the active family
  +nms        — ... + box NMS
  full        — the production _propose_stage program

Each program is min-of-N synced; the ~35 ms tunnel dispatch floor biases
every row equally, so the DELTAS are the substage costs.

Usage: python tools/propose_profile.py [--iters 5] [--synthetic]
"""
import argparse
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mars_tpu.models import zoo
from mars_tpu.models.precision import cast_floating
from mars_tpu.pipeline import amg, matcher
from mars_tpu.utils.profiling import force_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--sam-size", default="vit_b")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models on CPU — validates the script itself")
    args = ap.parse_args()

    if args.tiny:
        # JAX_PLATFORMS=cpu is NOT honored with the axon plugin registered
        # (env-var init still probes the tunnel and hangs during outages);
        # the config update pre-init is the reliable switch
        jax.config.update("jax_platforms", "cpu")
        from mars_tpu.models import dinov2 as dinov2_m, sam as sam_m

        dino_cfg = dinov2_m.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4)
        dino_params = dinov2_m.init_params(jax.random.PRNGKey(0), dino_cfg)
        sam_cfg = sam_m.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2)
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        sam_params = {
            "encoder": sam_m.init_encoder_params(ks[0], sam_cfg),
            "prompt_encoder": sam_m.init_prompt_encoder_params(ks[1], sam_cfg),
            "decoder": sam_m.init_decoder_params(ks[2], sam_cfg),
        }
        mcfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            emd_row_bucket=16, emd_col_bucket=16)
        acfg = amg.AmgConfig(sel_pred_iou_thresh=0.0,
                             sel_stability_score_thresh=0.0, decode_batch=8)
    else:
        dino_params, dino_cfg = zoo.build_dinov2(None, "vit_large", 4)
        dino_params = cast_floating(dino_params)
        if args.int8:
            from mars_tpu.models.quantization import quantize_params

            dino_params = quantize_params(dino_params)
        sam_params, sam_cfg = zoo.build_sam(None, args.sam_size)
        sam_params = cast_floating(sam_params)
        mcfg = matcher.MatcherConfig()
        acfg = amg.AmgConfig()
    s = mcfg.input_size

    if args.synthetic:
        from mars_tpu.data import build_dataset, to_device_episode

        ds = build_dataset("synthetic", shot=1, size=s, num_episodes=2)
        ep = to_device_episode(ds[0], size=s, max_shots=1)
        sup, msk, val, qry = (ep.support_images, ep.support_masks,
                              ep.support_valid, ep.query_image)
    else:
        rng = np.random.RandomState(0)
        sup = jnp.asarray(rng.rand(1, s, s, 3), jnp.float32)
        qry = jnp.asarray(rng.rand(s, s, 3), jnp.float32)
        m = np.zeros((1, s, s), np.float32)
        m[0, 60:240, 80:300] = 1
        msk, val = jnp.asarray(m), jnp.ones((1,), bool)
    key = jax.random.PRNGKey(0)

    # program 1 once, on the host decision path (same as production)
    m1 = matcher._match_stage(key, dino_params, sup, msk, val, qry,
                              dino_cfg, mcfg)
    combo_rows, draw_rows = matcher.prompt_family_rows(mcfg)
    n_pts = int(jax.device_get(m1["n_prompt"]))
    rows = tuple((draw_rows if n_pts > 8 else combo_rows).tolist())
    rows_np = np.asarray(rows, np.int32)
    print(f"n_prompt={n_pts} → family rows={len(rows)}", flush=True)

    @partial(jax.jit, static_argnames=("cfg",))
    def sample(key, m, cfg):
        k_s = jax.random.fold_in(key, 1)
        return matcher.sample_prompt_sets(
            k_s, m["prompt_pts"], m["prompt_valid"], cfg)

    @partial(jax.jit, static_argnames=("cfg", "scfg"))
    def sample_encode(key, m, qry, sam_params, cfg, scfg):
        out = sample(key, m, cfg)
        emb = amg.encode_target(sam_params, qry, scfg)
        return out, emb

    @partial(jax.jit, static_argnames=("cfg", "scfg", "acfg", "rows", "do_nms"))
    def sample_encode_decode(key, m, qry, sam_params, cfg, scfg, acfg, rows,
                             do_nms):
        coords, labels, set_valid = sample(key, m, cfg)
        emb = amg.encode_target(sam_params, qry, scfg)
        rnp = np.asarray(rows, np.int32)
        dec = amg.decode_prompt_sets(
            sam_params, emb, coords[rnp], labels[rnp], set_valid[rnp],
            scfg, acfg, original_size=(cfg.input_size, cfg.input_size))
        if do_nms:
            dec = amg.nms_filter(dec, acfg.box_nms_thresh)
        return dec

    def full(key):
        return matcher._propose_stage(
            key, m1, qry, sam_params, None, sam_cfg, acfg, mcfg, rows, False)

    def gen_e2e(k, fused):
        out = matcher.generate_proposals(
            k, dino_params, dino_cfg, sam_params, sam_cfg, acfg, mcfg,
            sup, msk, val, qry, bucket=128, fuse_programs=fused)
        return out["final_score"]

    progs = {
        "match (prog 1)": lambda k: matcher._match_stage(
            k, dino_params, sup, msk, val, qry, dino_cfg, mcfg),
        # e2e A/B: the production 2-program flow (host family decision)
        # vs fuse_programs=True (ONE program, union rows) — the fused win
        # is the saved dispatch + n_prompt device_get, its cost is the
        # union's larger decode/NMS/score buffers
        "generate (2-prog)": lambda k: gen_e2e(k, False),
        "generate (fused)": lambda k: gen_e2e(k, True),
        "sample": lambda k: sample(k, m1, mcfg),
        "sample+encode": lambda k: sample_encode(k, m1, qry, sam_params,
                                                 mcfg, sam_cfg),
        "+decode": lambda k: sample_encode_decode(
            k, m1, qry, sam_params, mcfg, sam_cfg, acfg, rows, False),
        "+nms": lambda k: sample_encode_decode(
            k, m1, qry, sam_params, mcfg, sam_cfg, acfg, rows, True),
        "full _propose_stage": full,
    }
    res = {}
    for name, fn in progs.items():
        t0 = time.time()
        out = fn(key)
        force_sync(jax.tree_util.tree_leaves(out)[0])
        compile_s = time.time() - t0
        times = []
        for i in range(args.iters):
            k = jax.random.fold_in(key, 100 + i)
            t0 = time.time()
            out = fn(k)
            force_sync(jax.tree_util.tree_leaves(out)[0])
            times.append(time.time() - t0)
        res[name] = min(times)
        print(f"{name:22s} {min(times)*1e3:7.1f} ms  (compile {compile_s:.0f}s, "
              f"mean {np.mean(times)*1e3:.0f} ms)", flush=True)
    print(f"{'Δ encode':22s} {(res['sample+encode']-res['sample'])*1e3:7.1f} ms")
    print(f"{'Δ decode':22s} {(res['+decode']-res['sample+encode'])*1e3:7.1f} ms")
    print(f"{'Δ nms':22s} {(res['+nms']-res['+decode'])*1e3:7.1f} ms")
    print(f"{'Δ score+merge':22s} "
          f"{(res['full _propose_stage']-res['+nms'])*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
