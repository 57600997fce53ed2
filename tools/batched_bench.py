"""Batched episode-ranking throughput sweep on one chip (VERDICT r1 #4).

Drives parallel.runner.make_batched_ranker at batch sizes 1/2/4/8 at full
model scale (same towers/bucket as bench.py) and prints eps/s per batch
size.  Notes:
  * under vmap the AlphaCLIP/EMD dead-chunk lax.cond turns into a select
    (both branches execute), so batched throughput is the FULL-bucket
    worst case regardless of live-proposal count — this sweep uses the
    full 128 bucket on the single-episode path too, apples to apples.
  * each batch size compiles its own program (~3 min each): total ~15 min.

  MARS_BENCH_BATCHES="1 2 4" python tools/batched_bench.py
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROPOSAL_BUCKET = 128


def main():
    from mars_tpu.core.episode import pad_proposals
    from mars_tpu.data import build_dataset, to_device_episode
    from mars_tpu.models import clip as clip_m, dinov2, zoo
    from mars_tpu.models.precision import cast_floating
    from mars_tpu.models.quantization import quantize_params
    from mars_tpu.parallel import runner
    from mars_tpu.pipeline import filtering, vta as vta_m, vva as vva_m

    dcfg = dinov2.DINOV2_VARIANTS["vit_large"]
    cvcfg = clip_m.CLIP_B16_VISUAL
    avcfg = clip_m.ALPHA_CLIP_L14_336_VISUAL
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {
        "dino": zoo._on_host(dinov2.init_params, ks[0], dcfg),
        "clip_v": zoo._on_host(clip_m.init_visual_params, ks[1], cvcfg),
        "ac_v": zoo._on_host(clip_m.init_visual_params, ks[2], avcfg),
        "logit_scale": jnp.float32(np.log(1 / 0.07)),
    }
    for k in ("dino", "clip_v", "ac_v"):
        params[k] = quantize_params(cast_floating(params[k]))

    ds = build_dataset("synthetic", shot=1, size=518, num_episodes=2)
    ep = to_device_episode(ds[0], size=518, max_shots=1)
    rng = np.random.RandomState(0)
    prop_np = np.zeros((PROPOSAL_BUCKET, 518, 518), np.float32)
    for i in range(PROPOSAL_BUCKET):
        y, x = rng.randint(0, 400, 2)
        prop_np[i, y:y + rng.randint(40, 118), x:x + rng.randint(40, 118)] = 1
    props = pad_proposals(jnp.asarray(prop_np), PROPOSAL_BUCKET)
    vta_text = jnp.asarray(rng.rand(2, cvcfg.output_dim).astype(np.float32))
    ac_text = jnp.asarray(rng.rand(1, avcfg.output_dim).astype(np.float32))
    ac_text = ac_text / jnp.linalg.norm(ac_text)

    results = {}
    batches = [int(b) for b in
               os.environ.get("MARS_BENCH_BATCHES", "1 2 4").split()]
    for b in batches:
        ranker = runner.make_batched_ranker(
            dcfg, cvcfg, avcfg, vva_m.VVAConfig(), vta_m.VTAConfig(),
            filtering.FilterMergeConfig())
        tile = lambda x: jnp.broadcast_to(x, (b,) + x.shape)
        batch = (tile(ep.support_images), tile(ep.support_masks),
                 tile(ep.support_valid), tile(ep.query_image),
                 tile(props.masks), tile(props.valid),
                 tile(vta_text), tile(ac_text))
        t0 = time.time()
        merged, _ = ranker(params, *batch)
        _ = float(merged[0, 0, 0])
        compile_s = time.time() - t0
        times = []
        for _ in range(6):
            t0 = time.time()
            merged, _ = ranker(params, *batch)
            _ = float(merged[0, 0, 0])
            times.append(time.time() - t0)
        best = min(times)
        results[b] = {"batch_s": round(best, 4),
                      "eps_per_sec": round(b / best, 4),
                      "compile_s": round(compile_s, 1)}
        print(json.dumps({"batch": b, **results[b]}), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
