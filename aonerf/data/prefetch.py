"""Threaded batch prefetcher for host-sampled pipelines (the AE path).

The auto-encoder step needs the full normalized source image per batch, so
its batches are assembled on host; this prefetcher overlaps that assembly
with device compute — the TPU-side analogue of the reference's DataLoader
workers (num_workers, model.py:421-428) without per-item process overhead.
"""

import queue
import threading
from typing import Callable, Iterator, Optional


class Prefetcher:
    """Runs ``make_batch()`` in a daemon thread, keeping up to ``depth``
    ready batches. Use as an iterator or call ``get()``."""

    def __init__(self, make_batch: Callable[[], dict], depth: int = 2):
        self._make = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        try:
            while not self._stop.is_set():
                batch = self._make()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the next get()
            self._exc = e

    def get(self, timeout: float = 60.0) -> dict:
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                timeout -= 0.5
                if timeout <= 0:
                    raise TimeoutError("prefetcher produced no batch in time")

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.get()

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)
