"""Async host->device scan streaming — the device-side analog of the
reference's message-source pipeline (SURVEY.md §5 'host-side async streaming
of scans to devices'): a background thread stages upcoming measurements onto
the device while the current frame computes, hiding the host->HBM transfer
behind compute."""

from __future__ import annotations

import queue
import threading


class DevicePrefetcher:
    """Wrap an iterable of pytrees; yields device-resident items ``depth``
    ahead of consumption."""

    _DONE = object()

    def __init__(self, iterable, depth: int = 2, device=None):
        import jax

        self._device = device or jax.devices()[0]
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            import jax

            try:
                for item in iterable:
                    staged = jax.tree.map(
                        lambda x: jax.device_put(x, self._device), item
                    )
                    self._q.put(staged)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
