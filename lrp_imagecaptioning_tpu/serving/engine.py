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

Single-threaded dispatch is intentional: one TPU executes one program at a
time, so a second dispatcher thread would only queue behind the first (and
the host has one core — CLAUDE.md hazards).
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
    latencies_s: list = field(default_factory=list)  # bounded (keep last 4096)
    started_at: float = field(default_factory=time.monotonic)

    _KEEP = 4096

    def record_batch(self, n: int, run_s: float, lat_s: list[float]) -> None:
        self.batches += 1
        self.batch_occupancy_sum += n
        self.completed += n
        self.run_seconds_sum += run_s
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

    ``run_batch(payloads: list) -> list`` must return exactly one result per
    payload (order-preserving).  Exceptions inside ``run_batch`` fail every
    future in that batch (the engine itself stays alive).
    """

    def __init__(self, run_batch, max_batch: int, *,
                 max_delay_s: float = 0.005, name: str = "engine"):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._run_batch = run_batch
        self.max_batch = max_batch
        self.max_delay_s = max_delay_s
        self.name = name
        self._q: queue.Queue = queue.Queue()
        self._stats = EngineStats()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "BatchingEngine":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._loop, name=f"batcher-{self.name}", daemon=True)
            self._thread.start()
        return self

    def stop(self, *, timeout: float = 5.0) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None
        # fail anything still queued so callers don't hang
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None and not req.future.done():
                req.future.set_exception(RuntimeError("engine stopped"))

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
                     "queue_depth": self._q.qsize()})
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
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            t0 = time.monotonic()
            try:
                results = self._run_batch([r.payload for r in batch])
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"run_batch returned {len(results)} results for "
                        f"{len(batch)} payloads")
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
                    len(batch), t1 - t0,
                    [t1 - r.t_enqueue for r in batch])
