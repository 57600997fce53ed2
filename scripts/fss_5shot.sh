#!/bin/bash
# TPU equivalent of reference scripts/fss_5shot.sh
cd "$(dirname "$0")/.."
BENCHMARK=fss NSHOT=5 FOLDS="0" . scripts/_eval_common.sh
