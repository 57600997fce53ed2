"""Decode-proxy bench: isolates the VLM weight-streaming path.

One scan step = the 7 weight GEMVs x N layers of a LLaMA-7B decode step
(no attention/KV work), so per-dispatch floors (~35 ms/program, ~0.3 ms
per single-op scan iteration on the tunneled chip — CLAUDE.md) are
negligible and kernel A/Bs are trustworthy.  This is the experiment that
settled the int4-vs-int8 question (BASELINE.md "Quantization"): at B=1
both are MXU-weight-feed/VPU bound, so int4 is a memory play, not a speed
play, on v5e.

Usage: python tools/decode_proxy_bench.py [int8|int4|all]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mars_tpu.ops.int4_matmul import matmul_int4

L = 8          # layers (full 7B = 32; 8 keeps host->device transfer sane)
D, F = 4096, 11008
STEPS = 20

rng = np.random.default_rng(0)


def make_weights(bits):
    ws = {}
    shapes = {"qkv": (D, 3 * D), "o": (D, D), "gate": (D, F),
              "up": (D, F), "down": (F, D)}
    for name, (i, o) in shapes.items():
        q = rng.integers(-7, 8, size=(L, i, o), dtype=np.int8)
        if bits == 4:
            # numpy-side hybrid pack (ops.int4_matmul format), one transfer
            lo, hi = q[:, 0::2], q[:, 1::2]
            ws[name] = jnp.asarray((((lo + 8) & 0xF) | (hi << 4)).astype(np.int8))
        else:
            ws[name] = jnp.asarray(q)
        ws[name + "_s"] = jnp.full((L, o), 1e-2, jnp.float32)
    return ws


def mm8(x, w, s):
    y = jax.lax.dot_general(x, w.astype(x.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * s).astype(x.dtype)


def mm4(x, w, s):
    return matmul_int4(x, w, s)


def step(mm, ws, x):
    def layer(x, w):
        qkv = mm(x, w["qkv"], w["qkv_s"])
        attn_out = qkv[:, :D] + qkv[:, D:2 * D] * 0.5 + qkv[:, 2 * D:] * 0.25
        x = x + mm(attn_out, w["o"], w["o_s"])
        g = mm(x, w["gate"], w["gate_s"])
        u = mm(x, w["up"], w["up_s"])
        x = x + mm(jax.nn.silu(g) * u, w["down"], w["down_s"])
        return x, ()
    x, _ = jax.lax.scan(layer, x, ws)
    return x


def bench(name, bits, mm):
    ws = make_weights(bits)
    x = jnp.asarray(rng.standard_normal((1, D)), dtype=jnp.bfloat16)

    @jax.jit
    def run(x, ws):
        def body(c, _):
            return step(mm, ws, c) * 0.5, ()
        return jax.lax.scan(body, x, None, length=STEPS)[0]

    out = run(x, ws); float(out[0, 0])
    t0 = time.perf_counter()
    out = run(x, ws); float(out[0, 0])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    gb = sum(w.nbytes for k, w in ws.items() if not k.endswith("_s")) / 1e9
    print(f"{name:24s} {dt:8.3f} ms/step  ({gb:.2f} GB weights, "
          f"{gb / dt * 1e3:.0f} GB/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which not in ("all", "int8", "int4"):
        sys.exit(f"usage: {sys.argv[0]} [all|int8|int4] (got {which!r})")
    if which in ("all", "int8"):
        bench("xla int8", 8, mm8)
    if which in ("all", "int4"):
        bench("pallas int4 (hybrid)", 4, mm4)
