"""Episode-serving runtime: a persistent predictor with request queueing.

The reference is a batch-evaluation script only; for production serving this
module wraps the MARS orchestrator in a long-lived service loop:

  - models load once, all stages stay compiled (first request pays the
    compile, subsequent requests run at steady-state latency)
  - requests carry raw numpy episodes + proposal stacks; proposals are
    nearest-resized to the configured input size and padded to the bucket
    ON THE HOST (uint8, one device transfer), so every request hits the
    same compiled graphs — no recompiles and no per-request eager-dispatch
    tax on the tunnel (~35 ms/op, CLAUDE.md)
  - an optional background thread drains a bounded queue, so producers
    (e.g. a dataset reader or an RPC frontend) overlap host prep with
    device compute; worker errors are delivered per-request, never kill
    the drain loop

The device work itself is the same jitted pipeline the CLI uses; this layer
only adds lifecycle + queueing.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from mars_tpu.core.episode import Proposals
from mars_tpu.data.base import EpisodeRecord, to_device_episode
from mars_tpu.pipeline import mars as mars_lib


@dataclass
class PredictRequest:
    record: EpisodeRecord
    proposals: np.ndarray  # (N, H, W) {0,1} at any resolution
    class_name: Optional[str] = None
    class_description: str = ""
    request_id: int = 0


@dataclass
class PredictResult:
    request_id: int
    mask: Optional[np.ndarray]  # (input_size, input_size) {0,1}; None on error
    timings: dict = field(default_factory=dict)
    error: Optional[Exception] = None
    dropped_proposals: int = 0  # rows beyond the bucket (kept in given order)


def _host_bucket_proposals(proposals: np.ndarray, size: int, bucket: int):
    """Nearest-resize a (N, H, W) mask stack to (N, size, size), pad/truncate
    to the bucket — all in host uint8 so the device sees ONE fixed-shape
    transfer.  Returns (stack (bucket, size, size) uint8, valid, n_dropped).

    Proposal resolution must NOT leak into the jitted graphs: (H, W) is a
    compile key for the fused ranking program, so an unresized stack would
    recompile (~200 s through the tunnel) per distinct producer resolution.
    """
    p = np.asarray(proposals)
    if p.ndim != 3:
        raise ValueError(f"proposals must be (N, H, W), got {p.shape}")
    n, h, w = p.shape
    p = (p > 0).astype(np.uint8)
    if (h, w) != (size, size):
        # torch-style floor indexing (core.imaging.interpolate_2d semantics)
        yi = (np.arange(size) * h // size).astype(np.int64)
        xi = (np.arange(size) * w // size).astype(np.int64)
        p = p[:, yi][:, :, xi]
    dropped = max(0, n - bucket)
    if dropped:
        p = p[:bucket]
    out = np.zeros((bucket, size, size), np.uint8)
    out[: p.shape[0]] = p
    valid = np.zeros((bucket,), bool)
    valid[: p.shape[0]] = True
    return out, valid, dropped


class MarsServer:
    """Synchronous predictor + optional queue-draining worker.

    The underlying Mars instance is stateful (lazy jit caches, a timings
    dict written per predict), so ALL predictions — the synchronous
    ``predict`` and the worker's — serialize on one lock.
    """

    def __init__(self, model: mars_lib.Mars, input_size: int = 518,
                 max_shots: int = 1, proposal_bucket: int = 128,
                 max_queued: int = 64):
        self.model = model
        self.input_size = input_size
        self.max_shots = max_shots
        self.proposal_bucket = proposal_bucket
        self._requests: "queue.Queue[Optional[PredictRequest]]" = queue.Queue(
            maxsize=max_queued)
        self._worker: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    # ---------------- synchronous path ----------------

    def predict(self, req: PredictRequest) -> PredictResult:
        """One episode.  The returned mask is at (input_size, input_size) —
        the pipeline's working resolution; map back to the producer's
        native resolution on the consumer side if needed."""
        ep = to_device_episode(req.record, self.input_size, self.max_shots)
        stack, valid, dropped = _host_bucket_proposals(
            req.proposals, self.input_size, self.proposal_bucket)
        props = Proposals(masks=jnp.asarray(stack).astype(jnp.float32),
                          valid=jnp.asarray(valid))
        with self._lock:
            mask = self.model.predict(
                ep, props, class_name=req.class_name,
                class_description=req.class_description,
            )
            timings = dict(self.model.timings)
        return PredictResult(
            request_id=req.request_id,
            mask=np.asarray(mask),
            timings=timings,
            dropped_proposals=dropped,
        )

    def warmup(self, record: EpisodeRecord, proposals: np.ndarray,
               class_name: Optional[str] = "object") -> float:
        """Pay stage compiles up front; returns the compile wall time.

        Pass ``class_name=None`` on a retriever-mode server so the VLM
        prefill/decode graphs compile too — a non-None name bypasses the
        text-retrieval stage entirely."""
        t0 = time.time()
        self.predict(PredictRequest(record, proposals, class_name=class_name))
        return time.time() - t0

    # ---------------- queued path ----------------

    def start(self, on_result: Callable[[PredictResult], None]) -> None:
        if self._worker is not None:
            raise RuntimeError("MarsServer already started")

        def loop():
            while True:
                req = self._requests.get()
                if req is None:
                    return
                try:
                    res = self.predict(req)
                except Exception as e:  # deliver per-request, keep draining
                    res = PredictResult(request_id=req.request_id, mask=None,
                                        error=e)
                on_result(res)

        self._worker = threading.Thread(target=loop, daemon=True)
        self._worker.start()

    def submit(self, req: PredictRequest, timeout: Optional[float] = None) -> None:
        """Enqueue; blocks (bounded queue = backpressure) when the worker
        is ``max_queued`` requests behind."""
        self._requests.put(req, timeout=timeout)

    def stop(self) -> None:
        if self._worker is not None:
            self._requests.put(None)
            self._worker.join()
            self._worker = None
