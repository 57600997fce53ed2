#!/bin/bash
# Shared evaluation invocation: the TPU equivalent of the reference's
# scripts/*.sh (flag-for-flag; see reference scripts/coco_1shot.sh).
# Callers set BENCHMARK, NSHOT, FOLDS; environment overrides:
#   DATAPATH MODELS_PATH PROPOSALS_PATH NLTK_PATH LOG_ROOT EXTRA_ARGS
set -e
: "${DATAPATH:=/data}"
: "${MODELS_PATH:=/models}"
: "${NLTK_PATH:=}"
: "${LOG_ROOT:=output/mars/${BENCHMARK}}"

# precomputed proposal dumps when PROPOSALS_PATH is set (the reference's
# only mode), inline Matcher generation otherwise
if [ -n "${PROPOSALS_PATH:-}" ]; then
  PROPOSAL_ARGS=(--mask-proposals-path "${PROPOSALS_PATH}")
else
  PROPOSAL_ARGS=(--generate-proposals)
fi

for fold in ${FOLDS}; do
  python -m mars_tpu.cli \
    --datapath "${DATAPATH}" \
    ${NLTK_PATH:+--nltk-path "${NLTK_PATH}"} \
    "${PROPOSAL_ARGS[@]}" \
    --benchmark "${BENCHMARK}" \
    --nshot "${NSHOT}" \
    --fold "${fold}" \
    --input-size 518 \
    --models-path "${MODELS_PATH}" \
    --prompt-type contour \
    --zoom-percentage 50 \
    --color red \
    --alpha-blending 0.5 \
    --thickness 2 \
    --vlm4bit --jax-vlm \
    --vta-backbone 'ViT-B/16' \
    --vta-refinement-box-threshold 0.4 \
    --last-n-attn-for-vta-refinement 8 \
    --vva-backbone dino \
    --dino-backbone vit_large \
    --num-regs 4 \
    --vva-refinement-box-threshold 0.8 \
    --last-n-attn-for-vva-refinement 24 \
    --static-threshold 0.55 \
    --dynamic-threshold 0.95 \
    --alpha-coverage 0.85 \
    --bf16 \
    --log-path "${LOG_ROOT}/fold${fold}" \
    --exp-name "${NSHOT}shot" \
    ${EXTRA_ARGS}
done
