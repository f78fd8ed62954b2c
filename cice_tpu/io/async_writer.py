"""Asynchronous file writer — IO runtime that overlaps history/restart writes
with compute.

Role analogue of the reference's parallel-IO backend keeping writes off the
model critical path (io_pio2, cicecore/cicedyn/infrastructure/io/io_pio2/
ice_pio.F90:591): the model loop serializes a payload to bytes, hands it to a
native pthread worker pool (cice_tpu/native/asyncwriter.c), and returns to
stepping immediately while the chip stays busy. `flush()` is the durability
barrier — call it before reading anything back (restart resume, BFB compares)
and at end of run.

Writes land atomically (tmp + rename), so a reader chasing the restart
pointer file never sees a partial checkpoint.

A pure-Python thread fallback keeps the feature working without a compiler.
"""

from __future__ import annotations

import io
import os
import queue
import threading
from typing import Optional

from ..native import _lib


class SnapshotBytesIO(io.BytesIO):
    """BytesIO whose contents survive close() as `.value`.

    scipy's netcdf_file closes its file object inside close()/__del__ (after
    flushing) and re-flushes on every close while the fp stays open — a
    no-op close() therefore lets the GC rewrite the buffer with polluted
    attributes. Snapshotting at first close and *really* closing avoids both.
    """

    value = b""

    def close(self):
        if not self.closed:
            self.value = self.getvalue()
        super().close()


class AsyncWriter:
    """FIFO of (path, bytes) write jobs drained by background workers."""

    def __init__(self, nthreads: int = 2, force_python: bool = False):
        self._lib = None if force_python else _lib()
        self._handle = None
        self._q: Optional[queue.Queue] = None
        self._errors = 0
        self._threads = []
        if self._lib is not None:
            self._handle = self._lib.cice_aw_start(int(nthreads))
        if self._handle is None:
            self._lib = None
            self._q = queue.Queue()
            self._stop = threading.Event()
            for _ in range(max(1, int(nthreads))):
                t = threading.Thread(target=self._py_worker, daemon=True)
                t.start()
                self._threads.append(t)

    # -- python fallback ----------------------------------------------------
    def _py_worker(self):
        while True:
            job = self._q.get()
            if job is None:
                self._q.task_done()
                return
            path, data = job
            try:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)
            except OSError:
                self._errors += 1
            finally:
                self._q.task_done()

    # -- API ----------------------------------------------------------------
    @property
    def native(self) -> bool:
        return self._handle is not None

    def submit(self, path: str, data: bytes) -> None:
        """Queue `data` to be written to `path`; returns immediately."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if self._handle is not None:
            rc = self._lib.cice_aw_submit(self._handle, path.encode(),
                                          bytes(data), len(data))
            if rc != 0:
                raise RuntimeError(f"async submit failed for {path}")
        else:
            self._q.put((path, bytes(data)))

    def pending(self) -> int:
        if self._handle is not None:
            return int(self._lib.cice_aw_pending(self._handle))
        return self._q.unfinished_tasks

    def flush(self) -> int:
        """Block until every queued write is on disk; cumulative error count."""
        if self._handle is not None:
            return int(self._lib.cice_aw_flush(self._handle))
        self._q.join()
        return self._errors

    def stop(self) -> None:
        if self._handle is not None:
            self._lib.cice_aw_stop(self._handle)
            self._handle = None
        elif self._q is not None:
            self.flush()
            for _ in self._threads:
                self._q.put(None)
            for t in self._threads:
                t.join(timeout=5.0)
            self._q = None

    def __del__(self):  # best-effort durability on GC
        try:
            self.stop()
        except Exception:
            pass


def write_bytes(path: str, data: bytes, writer: Optional[AsyncWriter] = None
                ) -> None:
    """Write `data` to `path` — async via `writer` if given, else inline."""
    if writer is not None:
        writer.submit(path, data)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
