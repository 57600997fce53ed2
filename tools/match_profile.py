"""Micro-profile of matcher._match_stage substages on the real chip.

Times three separately-jitted programs at production geometry (DINOv2-L
@518, 1-shot) and reports the deltas:

  features   — dinov2 fwd x2 + s_mat/cost/pooled  (_features_and_matrices)
  +match     — features + bidirectional_match + top-half filter
  full       — the production _match_stage program

Each program is min-of-N synced; the ~35 ms tunnel dispatch floor biases
every row equally, so the DELTAS are the substage costs.

Usage: python tools/match_profile.py [--iters 6]
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
from mars_tpu.pipeline import matcher
from mars_tpu.utils.profiling import force_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic-dataset episode (bench.py's e2e "
                         "inputs) instead of uniform-random arrays — the "
                         "auction while_loop trip counts are data-dependent")
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    dino_params, dino_cfg = zoo.build_dinov2(None, "vit_large", 4)
    dino_params = cast_floating(dino_params)
    if args.int8:
        from mars_tpu.models.quantization import quantize_params

        dino_params = quantize_params(dino_params)
    mcfg = matcher.MatcherConfig()
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

    @partial(jax.jit, static_argnames=("dino_cfg",))
    def features(dino_params, sup, msk, val, qry, dino_cfg):
        return matcher._features_and_matrices(
            dino_params, sup, msk, val, qry, dino_cfg, mcfg.grid)

    @partial(jax.jit, static_argnames=("dino_cfg", "cfg"))
    def feats_match(dino_params, sup, msk, val, qry, dino_cfg,
                    cfg: matcher.MatcherConfig):
        s_mat, cost, support_fg = matcher._features_and_matrices(
            dino_params, sup, msk, val, qry, dino_cfg, cfg.grid)
        return matcher.matched_points(s_mat, support_fg, cfg)

    progs = {
        "features": lambda: features(dino_params, sup, msk, val, qry,
                                     dino_cfg),
        "feats+match": lambda: feats_match(dino_params, sup, msk, val, qry,
                                           dino_cfg, mcfg),
        "full _match_stage": lambda: matcher._match_stage(
            key, dino_params, sup, msk, val, qry, dino_cfg, mcfg),
    }
    res = {}
    for name, fn in progs.items():
        t0 = time.time()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        force_sync(leaf)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            out = fn()
            force_sync(jax.tree_util.tree_leaves(out)[0])
            times.append(time.time() - t0)
        res[name] = min(times)
        print(f"{name:20s} {min(times)*1e3:7.1f} ms  (compile {compile_s:.0f}s, "
              f"mean {np.mean(times)*1e3:.0f} ms)", flush=True)
    print(f"{'Δ matching':20s} {(res['feats+match']-res['features'])*1e3:7.1f} ms")
    print(f"{'Δ rest-of-stage':20s} "
          f"{(res['full _match_stage']-res['feats+match'])*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
