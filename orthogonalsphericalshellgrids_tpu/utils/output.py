"""Output writing and time-series reading.

TPU-native equivalent of the reference's ``JLD2OutputWriter`` + ``FieldTimeSeries``
pair (SURVEY.md O11; ``examples/bickley_jet.jl:79-82, :92-93``): periodic field dumps
with an optional ``with_halos`` flag, and a reader that loads the dump back as arrays
with times.

Container format: a zip of ``.npy`` members (``numpy.load``-compatible), one member
per field per snapshot (``c.000004.npy``), appended in O(snapshot) time — the
JLD2-style append without rewriting history. Writes optionally run on a background
thread (``async_write=True``) so compression/disk IO overlaps the simulation's device
compute — the double-buffered output path of a production run.
"""

from __future__ import annotations

import os
import queue
import threading
import zipfile
from typing import Callable

import numpy as np

__all__ = ["OutputWriter", "FieldTimeSeries"]


class OutputWriter:
    """Periodic field dumps: attach to a Simulation with a schedule.

    ``outputs`` maps name -> callable(sim) -> array (device arrays are pulled to host).
    Mirrors the reference writer usage (fields + derived diagnostics like ζ,
    examples/bickley_jet.jl:79-82). ``with_halos=False`` crops to the interior using
    the model's base (or extended) grid. ``async_write=True`` moves compression and
    disk IO to a writer thread; call ``close()`` (or rely on the Simulation's run end)
    to drain it.
    """

    def __init__(self, filename: str, outputs: dict[str, Callable], with_halos: bool = False,
                 overwrite_existing: bool = True, async_write: bool = False,
                 compress: bool = True):
        self.filename = filename
        self.outputs = outputs
        self.with_halos = with_halos
        self._count = 0
        self._compression = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
        if overwrite_existing and os.path.exists(filename):
            os.remove(filename)
        elif os.path.exists(filename):
            # appending to an existing archive: continue numbering after the last
            # snapshot already present (duplicate member names would make np.load
            # silently keep one entry per name and scramble the series)
            with zipfile.ZipFile(filename) as z:
                idx = [int(n.split(".")[-2]) for n in z.namelist()
                       if n.startswith("times.") and n.endswith(".npy")]
            self._count = max(idx) + 1 if idx else 0
        self._error: BaseException | None = None
        self._queue: queue.Queue | None = None
        self._worker: threading.Thread | None = None
        if async_write:
            self._queue = queue.Queue(maxsize=4)  # bounded: backpressure, not OOM
            self._worker = threading.Thread(target=self._drain, daemon=True)
            self._worker.start()

    # -- capture ------------------------------------------------------------------

    def __call__(self, sim) -> None:
        g = sim.model.grid
        arrs = {}
        for name, fn in self.outputs.items():
            arr = np.asarray(fn(sim))
            if not self.with_halos and arr.shape == g.shape2d:
                arr = arr[g.interior2d]
            elif not self.with_halos and arr.shape == sim.model.grid_ext.shape2d:
                ge = sim.model.grid_ext
                arr = arr[ge.interior2d]
            arrs[name] = arr
        self._raise_pending()
        job = (self._count, float(sim.time), arrs)
        self._count += 1
        if self._queue is not None:
            self._queue.put(job)
        else:
            self._write(job)

    # -- writing ------------------------------------------------------------------

    def _write(self, job) -> None:
        k, t, arrs = job
        with zipfile.ZipFile(self.filename, "a", compression=self._compression) as z:
            for name, arr in arrs.items():
                with z.open(f"{name}.{k:06d}.npy", "w") as f:
                    np.lib.format.write_array(f, np.ascontiguousarray(arr))
            with z.open(f"times.{k:06d}.npy", "w") as f:
                np.lib.format.write_array(f, np.asarray(t))

    def _drain(self) -> None:
        while True:
            job = self._queue.get()
            if job is None:
                self._queue.task_done()
                return
            try:
                if self._error is None:  # after a failure, drop (don't corrupt) jobs
                    self._write(job)
            except BaseException as e:  # noqa: BLE001 — surfaced via _raise_pending
                if self._error is None:
                    self._error = e
            finally:
                # task_done unconditionally: a failed _write must not deadlock
                # close()/queue.join()
                self._queue.task_done()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(
                f"async OutputWriter for {self.filename!r} failed") from err

    def close(self) -> None:
        """Drain the async writer (no-op for synchronous writers); re-raises the
        first error the writer thread hit, if any."""
        if self._queue is not None:
            self._queue.join()
        self._raise_pending()

    flush = close  # backward-compatible alias


class FieldTimeSeries:
    """Reader for OutputWriter dumps (the reference's FieldTimeSeries,
    examples/bickley_jet.jl:92-93): ``fts = FieldTimeSeries(path, "c")``;
    ``fts.times``, ``fts[i]``, ``len(fts)``."""

    def __init__(self, filename: str, name: str):
        with np.load(filename) as data:
            tkeys = sorted(k for k in data.files if k.startswith("times."))
            self.times = np.asarray([float(data[k]) for k in tkeys])
            fkeys = sorted(k for k in data.files if k.startswith(name + "."))
            if len(fkeys) != len(tkeys):
                raise KeyError(f"field {name!r} has {len(fkeys)} snapshots, "
                               f"expected {len(tkeys)}")
            self._data = np.stack([data[k] for k in fkeys]) if fkeys else np.zeros((0,))

    def __len__(self):
        return len(self.times)

    def __getitem__(self, i):
        return self._data[i]

    @property
    def data(self):
        return self._data
