#!/bin/bash
# One-shot hardware re-measurement after the chunk-gated auction +
# prefix-KV + NMS/fixup gating work.  Waits for the axon service to come
# back, then runs the profile ladder and the bench, logging everything.
#
# Usage: bash tools/hw_remeasure.sh [outdir]
set -u
OUT=${1:-/tmp/hw_remeasure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
    timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

echo "[remeasure] waiting for the axon service..." | tee "$OUT/status.log"
until probe; do
    echo "[remeasure] $(date +%H:%M:%S) still down" >> "$OUT/status.log"
    sleep 120
done
echo "[remeasure] service is back at $(date +%H:%M:%S)" | tee -a "$OUT/status.log"

run() {
    name=$1; shift
    echo "[remeasure] $(date +%H:%M:%S) running $name" | tee -a "$OUT/status.log"
    timeout 1800 "$@" > "$OUT/$name.log" 2>&1
    echo "[remeasure] $name exit=$?" | tee -a "$OUT/status.log"
}

# 1. synthetic-episode match profile: did chunk-gated bidding reclaim the
#    auction-war cost? (pre-fix the full episode measured 913 ms)
run match_synth python -u tools/match_profile.py --iters 5 --synthetic --int8
# 2. propose-stage substage ladder (encode/decode/nms/score+merge deltas)
run propose python -u tools/propose_profile.py --iters 5 --int8
# 3. e2e probe: proposal span on the synthetic episode, both bucket modes
run e2e_probe python -u tools/e2e_probe.py --iters 5 --no-text
# 3b. fused single-program proposal flow A/B (union-family rows)
run e2e_probe_fused python -u tools/e2e_probe.py --iters 5 --no-text --fused
# 3c. speculative decode after the stale-gram-slot fix (was 2.3 ms/tok
#     with every full-K round followed by a wasted verify)
run vlm_spec python -u tools/vlm_bench.py --draft 8 --prompt-len 1176 --tokens 50
# 4. the driver's bench artifact (ranking + full e2e with prefix-kv text)
run bench python -u bench.py
echo "[remeasure] done" | tee -a "$OUT/status.log"
