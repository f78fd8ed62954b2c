"""Decomposition-aware parallel IO — the io_pio2 analogue.

The reference's PIO2 backend (cicecore/cicedyn/infrastructure/io/io_pio2/,
`ice_pio.F90:591` decomposition init) exists so restart/history writes scale:
each rank writes its own blocks through a parallel-netCDF decomposition
instead of gathering the globe to rank 0 (`ice_read_write.F90` root path).

TPU equivalent: every array is a `jax.Array` sharded over the device mesh;
`arr.addressable_shards` are exactly this process's "blocks". We write one
file per shard (no device->host gather of remote shards, no cross-host
traffic) plus a tiny JSON manifest holding the global shape/dtype and each
shard's index slices. On a multi-host mesh each process writes only its
addressable shards and reads them back by matching its sharding — the same
code, like the reference's iotasks/stride knobs collapse to "every host
writes its own".

Layout of a sharded field `name` under `dir/`:
  name.manifest.json       {shape, dtype, shards: [{file, index}]}
  name.s000.npy ...        one .npy per shard (this process's shards only)

`write_restart_sharded` / `read_restart_sharded` layer the restart pytree
contract (io/restart.py) on top; the exact-restart (BFB) guarantee holds
because shards round-trip bytewise.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..calendar import Calendar
from ..model.state import State


def _index_to_json(idx, ndim):
    """Serialize a per-shard index (tuple of slices) as [[start, stop], ...]."""
    out = []
    full = idx if isinstance(idx, tuple) else (idx,)
    full = full + (slice(None),) * (ndim - len(full))
    for sl in full:
        out.append([sl.start, sl.stop])
    return out


def _index_from_json(spec):
    return tuple(slice(a, b) for a, b in spec)


def write_field_sharded(dirpath: str, name: str, arr, writer=None) -> dict:
    """Write one (possibly sharded) array without gathering: one .npy per
    addressable shard + manifest. Returns the manifest dict.

    With `writer` (io.async_writer.AsyncWriter) shard payloads are queued to
    the native background pool (io_pio2-style off-critical-path writes)."""
    import io as _io

    from .async_writer import write_bytes

    os.makedirs(dirpath, exist_ok=True)
    arr = jax.numpy.asarray(arr)
    shards = []
    pid = jax.process_index()
    for k, sh in enumerate(arr.addressable_shards):
        fname = f"{name}.p{pid}s{k:03d}.npy"
        buf = _io.BytesIO()
        np.save(buf, np.asarray(sh.data))
        write_bytes(os.path.join(dirpath, fname), buf.getvalue(), writer)
        shards.append({"file": fname,
                       "index": _index_to_json(sh.index, arr.ndim),
                       "device": str(sh.device)})
    manifest = {"shape": list(arr.shape), "dtype": str(arr.dtype),
                "shards": shards, "nprocs": jax.process_count()}
    # each process writes its own manifest part; process 0's name is canonical
    mname = (f"{name}.manifest.json" if pid == 0
             else f"{name}.manifest.p{pid}.json")
    with open(os.path.join(dirpath, mname), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_field_sharded(dirpath: str, name: str,
                       sharding: Optional[jax.sharding.Sharding] = None):
    """Reassemble a field from its shard files. With `sharding`, each shard
    is placed directly on its device (no full-array host materialization on
    multi-host: only this process's byte ranges are read)."""
    parts = [p for p in os.listdir(dirpath)
             if p.startswith(name + ".manifest")]
    if not parts:
        raise FileNotFoundError(f"no manifest for field '{name}' in {dirpath}")
    shards = []
    shape = dtype = None
    for p in sorted(parts):
        with open(os.path.join(dirpath, p)) as f:
            man = json.load(f)
        shape, dtype = tuple(man["shape"]), np.dtype(man["dtype"])
        shards.extend(man["shards"])
    out = np.empty(shape, dtype)
    seen = np.zeros(shape, bool)
    for s in shards:
        idx = _index_from_json(s["index"])
        out[idx] = np.load(os.path.join(dirpath, s["file"]))
        seen[idx] = True
    if not seen.all():
        raise IOError(f"field '{name}': shard files do not cover the array")
    if sharding is not None:
        return jax.device_put(out, sharding)
    return jax.numpy.asarray(out)


def write_restart_sharded(dirpath: str, state: State, calendar: Calendar,
                          pointer_file: Optional[str] = None,
                          writer=None) -> str:
    """PIO-style restart dump: every leaf written shard-wise under
    `<dirpath>/iced.<timestamp>.pio/`. Pointer-file contract matches
    io/restart.py (ice.restart_file)."""
    ddir = os.path.join(dirpath, f"iced.{calendar.timestamp()}.pio")
    os.makedirs(ddir, exist_ok=True)
    leaves, _ = jax.tree.flatten(state)
    for i, leaf in enumerate(leaves):
        write_field_sharded(ddir, f"leaf_{i}", leaf, writer=writer)
    meta = dict(year=calendar.year, month=calendar.month, day=calendar.day,
                sec=calendar.sec, istep=calendar.istep,
                calendar_type=calendar.calendar_type,
                year_init=calendar.year_init, nleaves=len(leaves))
    if jax.process_index() == 0:
        with open(os.path.join(ddir, "meta.json"), "w") as f:
            json.dump(meta, f)
    if pointer_file:
        os.makedirs(os.path.dirname(pointer_file) or ".", exist_ok=True)
        with open(pointer_file, "w") as f:
            f.write(ddir + "\n")
    return ddir


def read_restart_sharded(path_or_pointer: str, template: State
                         ) -> Tuple[State, Calendar]:
    """Load a sharded restart; leaves adopt the template's sharding when the
    template leaves are committed jax Arrays."""
    path = path_or_pointer
    if not os.path.isdir(path):
        with open(path) as f:
            path = f.read().strip()
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    leaves, treedef = jax.tree.flatten(template)
    assert len(leaves) == meta["nleaves"], \
        f"restart has {meta['nleaves']} leaves, template {len(leaves)}"
    new = []
    for i, ref in enumerate(leaves):
        shd = getattr(ref, "sharding", None)
        arr = read_field_sharded(path, f"leaf_{i}", sharding=shd)
        new.append(arr.astype(ref.dtype))
    state = jax.tree.unflatten(treedef, new)
    cal = Calendar(calendar_type=meta["calendar_type"], year=meta["year"],
                   month=meta["month"], day=meta["day"], sec=meta["sec"],
                   istep=meta["istep"], year_init=meta["year_init"])
    return state, cal
