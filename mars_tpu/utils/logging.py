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


def initialize(log_root: str, exp_name: str = None, args=None) -> logging.Logger:
    """exp_name: subdirectory under log_root; "" uses log_root itself;
    None appends a timestamp (reference Logger.initialize:172-209)."""
    ts = time.strftime("%Y%m%d-%H%M%S")
    logpath = log_root if exp_name == "" else os.path.join(
        log_root, exp_name or ts)
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
    """CSV scalar stream (TensorBoard-lite, no external deps).

    Fresh runs truncate; ``append=True`` (a --resume continuation)
    keeps the interrupted run's rows and continues the stream."""

    def __init__(self, logpath: str, append: bool = False):
        self.path = os.path.join(logpath, "scalars.csv")
        self._f = open(self.path, "a" if append else "w")

    def write(self, step: int, **scalars):
        for k, v in scalars.items():
            self._f.write(f"{step},{k},{float(v)}\n")
        self._f.flush()

    def close(self):
        self._f.close()


class MetricsLogger:
    """Streaming metrics sink — the reference's TensorBoard/Comet analogue
    (reference mars/utils/logger.py:197, 234-294).

    Streams per-episode scalars to a standard TensorBoard event file
    (utils.tboard, first-party writer — readable by any stock TensorBoard)
    AND to scalars.csv, from the same AverageMeter the evaluation loop
    updates.  API mirrors the reference CometLogger's surface.
    """

    def __init__(self, logpath: str, meter, split: str = "test",
                 append: bool = False):
        from mars_tpu.utils import tboard

        self.meter = meter
        self.split = split
        self.tbd = tboard.SummaryWriter(os.path.join(logpath, "tbd", "runs"))
        self.csv = ScalarWriter(logpath, append=append)

    def log_metrics(self, step: int):
        """reference CometLogger.log_metrics:259-264 (running mIoU/FB-IoU)."""
        iou, fb_iou, _ = self.meter.compute_iou()
        self.tbd.add_scalars(step, **{f"{self.split}_mIoU": iou,
                                      f"{self.split}_FB-IoU": fb_iou})
        self.csv.write(step, **{f"{self.split}_mIoU": iou,
                                f"{self.split}_FB-IoU": fb_iou})

    def log_time_batch(self, seconds: float, step: int):
        """reference :278-280."""
        self.tbd.add_scalar("time_elapsed_batch", seconds, step)
        self.csv.write(step, time_elapsed_batch=seconds)

    def log_metrics_bad_preds(self, step: int):
        """reference :266-276 (known-bad regression subset)."""
        if not self.meter.bad_class_ids:
            return
        miou, fb, per_class = self.meter.compute_iou_bad_preds()
        self.tbd.add_scalars(step, bad_preds_mIoU=miou)
        for cid, iou in zip(self.meter.bad_class_ids, per_class):
            self.tbd.add_scalar(f"class{cid}_mIoU", float(iou), step)

    def end(self, total_seconds: float, step: int):
        """reference :288-294 + final per-class table."""
        _, _, per_class = self.meter.compute_iou()
        for cid, iou in zip(self.meter.class_ids, per_class):
            self.tbd.add_scalar(f"{self.split}_cat_{cid}_IoU", float(iou),
                                step)
        self.tbd.add_scalar("total_time_elapsed", total_seconds, step)
        self.tbd.close()
        self.csv.close()
