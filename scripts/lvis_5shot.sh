#!/bin/bash
# TPU equivalent of reference scripts/lvis_5shot.sh
cd "$(dirname "$0")/.."
BENCHMARK=lvis NSHOT=5 FOLDS="0 1 2 3 4 5 6 7 8 9" . scripts/_eval_common.sh
