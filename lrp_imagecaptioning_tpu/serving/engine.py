"""Dynamic request batching for fixed-shape compiled programs.

TPU programs here are compiled for ONE batch shape (compilation of the
full-size caption+LRP program takes minutes through the remote helper, so a
bucket ladder is deliberately not the default).  The engine therefore turns
arbitrary request arrival patterns into full-batch dispatches:

- requests enqueue with a future; a worker thread collects up to
  ``max_batch`` of them, waiting at most ``max_delay_s`` after the first
  arrival (classic max-delay coalescing),
- the batch callback receives the payload list (length 1..max_batch) and
  returns one result per payload — padding to the compiled shape is the
  service's job (it repeats a row; the padded rows' outputs are dropped),
- per-request latency, batch occupancy and error counts are tracked under a
  lock and exposed via :meth:`BatchingEngine.stats`.

**Pipelined dispatch.**  A synchronous submit→wait→reply loop pays the full
host↔device round trip per batch; on the axon remote tunnel that latency
(~400 ms) dwarfs the 62 ms program and capped the measured serving rate at
18 req/s vs the 129 img/s raw program rate (docs/SERVING.md).  `bench.py`
hides the latency by keeping many dispatches in flight — the engine does the
same when the service provides a two-phase callback:

- ``dispatch(payloads) -> handle`` — pad + call the jitted program.  JAX
  dispatch is asynchronous: this returns device references immediately and
  the device queue keeps executing.
- ``finalize(handle, payloads) -> results`` — the blocking device→host
  transfer + host postprocessing.

The worker thread dispatches batch N+1 while a finalizer thread blocks on
batch N's transfer (the fetch releases the GIL, so the 1-core host
interleaves them); at most ``pipeline_depth`` batches are in flight — the
bound caps HBM held by undelivered outputs.  A single dispatcher is still
intentional: one TPU executes one program at a time; depth, not thread
count, is what hides the round trip.

With only the classic ``run_batch`` callback the engine degrades to the
synchronous loop (dispatch = run_batch, finalize = identity).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field


@dataclass
class EngineStats:
    """Mutable counters; snapshot() renders the JSON-friendly view."""

    requests: int = 0
    completed: int = 0
    errors: int = 0
    batches: int = 0
    batch_occupancy_sum: int = 0
    run_seconds_sum: float = 0.0
    dispatch_seconds_sum: float = 0.0
    latencies_s: list = field(default_factory=list)  # bounded (keep last 4096)
    started_at: float = field(default_factory=time.monotonic)

    _KEEP = 4096

    def record_batch(self, n: int, run_s: float, dispatch_s: float,
                     lat_s: list[float]) -> None:
        self.batches += 1
        self.batch_occupancy_sum += n
        self.completed += n
        self.run_seconds_sum += run_s
        self.dispatch_seconds_sum += dispatch_s
        self.latencies_s.extend(lat_s)
        if len(self.latencies_s) > self._KEEP:
            del self.latencies_s[: len(self.latencies_s) - self._KEEP]

    def snapshot(self) -> dict:
        lat = sorted(self.latencies_s)

        def pct(p: float) -> float:
            if not lat:
                return 0.0
            return lat[min(len(lat) - 1, int(p * (len(lat) - 1)))]

        elapsed = max(time.monotonic() - self.started_at, 1e-9)
        return {
            "requests": self.requests,
            "completed": self.completed,
            "errors": self.errors,
            "batches": self.batches,
            "mean_batch_occupancy": (
                self.batch_occupancy_sum / self.batches if self.batches else 0.0
            ),
            "mean_run_ms": (
                1e3 * self.run_seconds_sum / self.batches if self.batches else 0.0
            ),
            "mean_dispatch_ms": (
                1e3 * self.dispatch_seconds_sum / self.batches
                if self.batches else 0.0
            ),
            "latency_p50_ms": 1e3 * pct(0.50),
            "latency_p99_ms": 1e3 * pct(0.99),
            "throughput_per_s": self.completed / elapsed,
        }


class _Request:
    __slots__ = ("payload", "future", "t_enqueue")

    def __init__(self, payload):
        self.payload = payload
        self.future: Future = Future()
        self.t_enqueue = time.monotonic()


class BatchingEngine:
    """Coalesce concurrent submissions into batched callback invocations.

    Either pass the classic single-phase callback —
    ``run_batch(payloads: list) -> list`` returning exactly one result per
    payload (order-preserving) — or the two-phase pair
    ``dispatch(payloads) -> handle`` + ``finalize(handle, payloads) ->
    results`` to overlap device dispatch with result readback (see module
    docstring); at most ``pipeline_depth`` dispatched batches wait in the
    finalize queue.  Exceptions inside either phase fail every future in
    that batch (the engine itself stays alive).
    """

    def __init__(self, run_batch, max_batch: int, *,
                 max_delay_s: float = 0.005, name: str = "engine",
                 dispatch=None, finalize=None, pipeline_depth: int = 2):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if (dispatch is None) != (finalize is None):
            raise ValueError("dispatch and finalize come as a pair")
        if dispatch is None:
            if run_batch is None:
                raise ValueError("need run_batch or a dispatch/finalize pair")
            dispatch = run_batch
            finalize = lambda handle, payloads: handle  # noqa: E731
            pipeline_depth = 1  # single-phase: nothing to overlap
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        self._dispatch = dispatch
        self._finalize = finalize
        self.max_batch = max_batch
        self.max_delay_s = max_delay_s
        self.pipeline_depth = pipeline_depth
        self.name = name
        self._q: queue.Queue = queue.Queue()
        self._inflight: queue.Queue = queue.Queue(maxsize=pipeline_depth)
        self._stats = EngineStats()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._finalizer: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "BatchingEngine":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._loop, name=f"batcher-{self.name}", daemon=True)
            self._finalizer = threading.Thread(
                target=self._finalize_loop, name=f"finalizer-{self.name}",
                daemon=True)
            self._finalizer.start()
            self._thread.start()
        return self

    def stop(self, *, timeout: float = 5.0) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None
        if self._finalizer is not None:
            self._inflight.put(None)  # sentinel AFTER the worker stopped
            self._finalizer.join(timeout=timeout)
            self._finalizer = None
        # fail anything still queued so callers don't hang
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None and not req.future.done():
                req.future.set_exception(RuntimeError("engine stopped"))
        while True:
            try:
                item = self._inflight.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                for r in item[0]:
                    if not r.future.done():
                        r.future.set_exception(RuntimeError("engine stopped"))

    # -- submission ----------------------------------------------------------
    def submit(self, payload) -> Future:
        if self._stop.is_set():
            raise RuntimeError(f"engine {self.name!r} is stopped")
        req = _Request(payload)
        with self._lock:
            self._stats.requests += 1
        self._q.put(req)
        return req.future

    def stats(self) -> dict:
        with self._lock:
            snap = self._stats.snapshot()
        snap.update({"name": self.name, "max_batch": self.max_batch,
                     "max_delay_ms": 1e3 * self.max_delay_s,
                     "queue_depth": self._q.qsize(),
                     "pipeline_depth": self.pipeline_depth,
                     "inflight_batches": self._inflight.qsize()})
        return snap

    # -- worker --------------------------------------------------------------
    def _collect(self) -> list[_Request]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:  # stop sentinel
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_delay_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        """Dispatch thread: collect → dispatch → hand to the finalizer."""
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            t0 = time.monotonic()
            try:
                handle = self._dispatch([r.payload for r in batch])
            except Exception as exc:  # noqa: BLE001 — fail the batch, live on
                with self._lock:
                    self._stats.errors += len(batch)
                for r in batch:
                    r.future.set_exception(exc)
                continue
            # blocks when pipeline_depth batches are already awaiting
            # finalize — backpressure instead of unbounded in-flight HBM
            self._inflight.put((batch, handle, t0, time.monotonic()))

    def _finalize_loop(self) -> None:
        """Finalizer thread: blocking readback + host postprocess, in
        dispatch order.  Runs until the stop sentinel (enqueued after the
        dispatch thread has joined, so nothing races past it)."""
        while True:
            item = self._inflight.get()
            if item is None:
                return
            batch, handle, t0, t_disp = item
            try:
                results = self._finalize(handle, [r.payload for r in batch])
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"batch callback returned {len(results)} results "
                        f"for {len(batch)} payloads")
            except Exception as exc:  # noqa: BLE001 — fail the batch, live on
                with self._lock:
                    self._stats.errors += len(batch)
                for r in batch:
                    r.future.set_exception(exc)
                continue
            t1 = time.monotonic()
            for r, res in zip(batch, results):
                r.future.set_result(res)
            with self._lock:
                self._stats.record_batch(
                    len(batch), t1 - t0, t_disp - t0,
                    [t1 - r.t_enqueue for r in batch])
