"""Episode-serving runtime: a persistent predictor with request batching.

The reference is a batch-evaluation script only; for production serving this
module wraps the MARS orchestrator in a long-lived service loop:

  - models load once, all stages stay compiled (first request pays the
    compile, subsequent requests run at steady-state latency)
  - requests carry raw numpy episodes + proposal stacks; proposals are
    padded to the configured bucket so every request hits the same compiled
    graphs (no recompiles in the serving path)
  - an optional background thread drains a queue, so producers (e.g. a
    dataset reader or an RPC frontend) overlap host prep with device compute

The device work itself is the same jitted pipeline the CLI uses; this layer
only adds lifecycle + queueing.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from mars_tpu.core.episode import pad_proposals
from mars_tpu.data.base import EpisodeRecord, to_device_episode
from mars_tpu.pipeline import mars as mars_lib


@dataclass
class PredictRequest:
    record: EpisodeRecord
    proposals: np.ndarray  # (N, H, W) {0,1}
    class_name: Optional[str] = None
    class_description: str = ""
    request_id: int = 0


@dataclass
class PredictResult:
    request_id: int
    mask: np.ndarray  # (H, W) {0,1}
    timings: dict = field(default_factory=dict)


class MarsServer:
    """Synchronous predictor + optional queue-draining worker."""

    def __init__(self, model: mars_lib.Mars, input_size: int = 518,
                 max_shots: int = 1, proposal_bucket: int = 128):
        self.model = model
        self.input_size = input_size
        self.max_shots = max_shots
        self.proposal_bucket = proposal_bucket
        self._requests: "queue.Queue[Optional[PredictRequest]]" = queue.Queue()
        self._worker: Optional[threading.Thread] = None

    # ---------------- synchronous path ----------------

    def predict(self, req: PredictRequest) -> PredictResult:
        ep = to_device_episode(req.record, self.input_size, self.max_shots)
        props = pad_proposals(
            jnp.asarray(req.proposals.astype(np.float32)), self.proposal_bucket
        )
        mask = self.model.predict(
            ep, props, class_name=req.class_name,
            class_description=req.class_description,
        )
        return PredictResult(
            request_id=req.request_id,
            mask=np.asarray(mask),
            timings=dict(self.model.timings),
        )

    def warmup(self, record: EpisodeRecord, proposals: np.ndarray,
               class_name: str = "object") -> float:
        """Pay all stage compiles up front; returns the compile wall time."""
        t0 = time.time()
        self.predict(PredictRequest(record, proposals, class_name=class_name))
        return time.time() - t0

    # ---------------- queued path ----------------

    def start(self, on_result: Callable[[PredictResult], None]) -> None:
        assert self._worker is None, "already started"

        def loop():
            while True:
                req = self._requests.get()
                if req is None:
                    return
                on_result(self.predict(req))

        self._worker = threading.Thread(target=loop, daemon=True)
        self._worker.start()

    def submit(self, req: PredictRequest) -> None:
        self._requests.put(req)

    def stop(self) -> None:
        if self._worker is not None:
            self._requests.put(None)
            self._worker.join()
            self._worker = None
