#!/bin/bash
# TPU equivalent of reference scripts/coco_1shot.sh
cd "$(dirname "$0")/.."
BENCHMARK=coco NSHOT=1 FOLDS="0 1 2 3" . scripts/_eval_common.sh
