"""Host-side input prefetching for the e2e train loop.

The host work per step — retrieval id lookup + token postprocess
(``data/postprocess.py``, the reference's ``emdr2_model.py:250-376``) — runs
synchronously between device steps in the plain loop. ``BatchPrefetcher``
builds the next ``depth`` device batches on a background thread while the
current step runs on device.

Semantics note: the prefetched batch's top-K *selection* uses query-encoder
weights up to ``depth`` steps stale (the scores in the grad step are always
fresh — they're recomputed inside the jitted step). Given the index itself
is ``index_reload_interval`` (500) steps stale by design, this is a strictly
smaller approximation; it is still opt-in (``engine.train(prefetch_depth=N)``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class BatchPrefetcher:
    _DONE = object()

    def __init__(self, task, batches: Iterator, depth: int = 2):
        self.task = task
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(batches,), daemon=True)
        self._thread.start()

    def _worker(self, batches) -> None:
        try:
            for batch in batches:
                self._q.put(self.task.build_device_batch(batch))
            self._q.put(self._DONE)
        except BaseException as e:
            self.error = e
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self.error is not None:
                raise RuntimeError("prefetch worker failed") from self.error
            raise StopIteration
        return item
