"""Output writing and time-series reading.

TPU-native equivalent of the reference's ``JLD2OutputWriter`` + ``FieldTimeSeries``
pair (SURVEY.md O11; ``examples/bickley_jet.jl:79-82, :92-93``): periodic field dumps
with an optional ``with_halos`` flag, and a reader that loads the dump back as arrays
with times. The container format is compressed ``.npz`` (one file per run, appended
snapshots), chosen over JLD2/zarr because it is dependency-free and the gather is a
single device→host transfer per snapshot.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

__all__ = ["OutputWriter", "FieldTimeSeries"]


class OutputWriter:
    """Periodic field dumps: attach to a Simulation with a schedule.

    ``outputs`` maps name -> callable(sim) -> array (device arrays are pulled to host).
    Mirrors the reference writer usage (fields + derived diagnostics like ζ,
    examples/bickley_jet.jl:79-82). ``with_halos=False`` crops to the interior using
    the model's base grid.
    """

    def __init__(self, filename: str, outputs: dict[str, Callable], with_halos: bool = False,
                 overwrite_existing: bool = True):
        self.filename = filename
        self.outputs = outputs
        self.with_halos = with_halos
        self._snaps: dict[str, list] = {name: [] for name in outputs}
        self._times: list[float] = []
        if overwrite_existing and os.path.exists(filename):
            os.remove(filename)

    def __call__(self, sim) -> None:
        g = sim.model.grid
        self._times.append(sim.time)
        for name, fn in self.outputs.items():
            arr = np.asarray(fn(sim))
            if not self.with_halos and arr.shape == g.shape2d:
                arr = arr[g.interior2d]
            elif not self.with_halos and arr.shape == sim.model.grid_ext.shape2d:
                ge = sim.model.grid_ext
                arr = arr[ge.interior2d]
            self._snaps[name].append(arr)
        self.flush()

    def flush(self) -> None:
        payload = {"times": np.asarray(self._times)}
        for name, snaps in self._snaps.items():
            payload[name] = np.stack(snaps) if snaps else np.zeros((0,))
        np.savez_compressed(self.filename, **payload)


class FieldTimeSeries:
    """Reader for OutputWriter dumps (the reference's FieldTimeSeries,
    examples/bickley_jet.jl:92-93): ``fts = FieldTimeSeries(path, "c")``;
    ``fts.times``, ``fts[i]``, ``len(fts)``."""

    def __init__(self, filename: str, name: str):
        with np.load(filename) as data:
            self.times = data["times"]
            self._data = data[name]

    def __len__(self):
        return len(self.times)

    def __getitem__(self, i):
        return self._data[i]

    @property
    def data(self):
        return self._data
