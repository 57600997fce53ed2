#!/bin/bash
# TPU equivalent of reference scripts/pascal_5shot.sh
cd "$(dirname "$0")/.."
BENCHMARK=pascal5i NSHOT=5 FOLDS="0 1 2 3" . scripts/_eval_common.sh
