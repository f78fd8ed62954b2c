"""Restart (checkpoint/resume) — exact-restart contract.

TPU-native analogue of cicecore/cicedyn/infrastructure/ice_restart_driver.F90
(`dumpfile`:56, `restartfile`:281) + the io_binary/io_netcdf `ice_restart`
backends: the full prognostic pytree (state + calendar + forcing-carry)
round-trips bit-for-bit, and a POINTER FILE names the latest restart
(reference `ice.restart_file`; test scripts manipulate it,
configuration/scripts/tests/test_restart.script:46).

Format: numpy .npz of flattened pytree leaves (portable, dependency-free,
exact) — the orbax-style sharded checkpoint path can layer on top for
multi-host runs without changing this interface.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Tuple

import jax
import numpy as np

from ..calendar import Calendar
from ..model.state import State


def _flatten_state(state: State):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def write_restart(dirpath: str, state: State, calendar: Calendar,
                  pointer_file: str | None = None, *, prefix: str = "iced",
                  extra: dict | None = None) -> str:
    """Dump state to `<dirpath>/<prefix>.<timestamp>.npz`; update pointer."""
    os.makedirs(dirpath, exist_ok=True)
    fname = os.path.join(dirpath, f"{prefix}.{calendar.timestamp()}.npz")
    leaves, _ = _flatten_state(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(year=calendar.year, month=calendar.month, day=calendar.day,
                sec=calendar.sec, istep=calendar.istep,
                calendar_type=calendar.calendar_type,
                year_init=calendar.year_init)
    if extra:
        meta.update(extra)
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(fname, **arrays)
    if pointer_file:
        os.makedirs(os.path.dirname(pointer_file) or ".", exist_ok=True)
        with open(pointer_file, "w") as f:
            f.write(fname + "\n")
    return fname


def read_restart(path_or_pointer: str, template: State) -> Tuple[State, Calendar]:
    """Load a restart; `template` supplies the pytree structure/dtypes."""
    path = path_or_pointer
    if not path.endswith(".npz"):
        with open(path_or_pointer) as f:
            path = f.read().strip()
    with np.load(path) as z:
        meta = json.loads(bytes(z["_meta"]).decode())
        leaves, treedef = jax.tree.flatten(template)
        new_leaves = []
        for i, ref in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            new_leaves.append(jax.numpy.asarray(arr, dtype=ref.dtype))
    state = jax.tree.unflatten(treedef, new_leaves)
    cal = Calendar(calendar_type=meta["calendar_type"], year=meta["year"],
                   month=meta["month"], day=meta["day"], sec=meta["sec"],
                   istep=meta["istep"], year_init=meta["year_init"])
    return state, cal
