#!/bin/bash
# Round-4 hardware measurement ladder for the SAM global-attention Pallas
# kernel (ops/sam_attention.py).  Designed to ride through axon compile-
# service outages: each step writes an .ok marker on success and is
# skipped on later passes; the whole ladder loops until every step has
# succeeded (or MAX_PASSES exhausted).
#
#   1. encoder A/B (xla vs pallas global layers, ViT-H @1024)
#   2. proposal stage at the production SAM config (matcher_bench vit_h)
#   3. full e2e proposal span probe (fused program, vit_b synthetic)
#   4. the production CLI inline-proposal drive (verify surface)
#   5. the driver's bench artifact
#
# Usage: bash tools/hw_r4_ladder.sh [outdir]
set -u
OUT=${1:-/tmp/hw_r4}
MAX_PASSES=${MAX_PASSES:-12}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
    timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

log() { echo "[r4] $(date -u +%H:%M:%S) $*" | tee -a "$OUT/status.log"; }

run() {
    name=$1; shift
    [ -f "$OUT/$name.ok" ] && return 0
    log "running $name"
    timeout 3000 "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    log "$name exit=$rc"
    [ $rc -eq 0 ] && touch "$OUT/$name.ok"
    return $rc
}

for pass in $(seq 1 "$MAX_PASSES"); do
    log "=== pass $pass ==="
    until probe; do
        log "service down; sleeping 120"
        sleep 120
    done
    run sam_encode python -u tools/sam_encode_profile.py \
        --variants full,full_pallas,all_windowed
    run matcher_vith python -u tools/matcher_bench.py --episodes 4 --sam-size vit_h
    run e2e_probe python -u tools/e2e_probe.py --iters 5 --no-text --fused
    run cli_drive python -u -m mars_tpu.cli --benchmark synthetic --episodes 3 \
        --gt-class-names --log-path "$OUT/cli_drive"
    run bench python -u bench.py
    ok=1
    for s in sam_encode matcher_vith e2e_probe cli_drive bench; do
        [ -f "$OUT/$s.ok" ] || ok=0
    done
    [ $ok -eq 1 ] && { log "ALL DONE"; exit 0; }
    sleep 60
done
log "exhausted passes with incomplete steps"
exit 1
