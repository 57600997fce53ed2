#!/bin/bash
# TPU equivalent of reference scripts/fss_1shot.sh
cd "$(dirname "$0")/.."
BENCHMARK=fss NSHOT=1 FOLDS="0" . scripts/_eval_common.sh
