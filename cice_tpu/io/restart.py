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


# netCDF-3 classic has no 64-bit-int/bool types (reference io_netcdf restart
# stores logicals as reals, io_netcdf/ice_restart.F90): lossless i1/i4 casts,
# original dtype recorded per variable for the exact round-trip.
_NC3_CAST = {np.dtype(np.bool_): np.dtype(np.int8),
             np.dtype(np.int64): np.dtype(np.int32),
             np.dtype(np.uint8): np.dtype(np.int8),
             np.dtype(np.uint32): np.dtype(np.int32)}


def _write_restart_cdf1(fileobj, arrays: dict, meta: dict) -> None:
    """NetCDF-3 classic restart body (reference io_netcdf/ice_restart.F90
    define/write per field on root; restart_format='cdf1')."""
    from scipy.io import netcdf_file

    with netcdf_file(fileobj, "w") as f:
        f.meta_json = json.dumps(meta).encode()
        dims = {}
        for name, arr in arrays.items():
            scalar = arr.ndim == 0
            if scalar:
                arr = arr.reshape(1)
            vdims = []
            for size in arr.shape:
                if size not in dims:
                    dname = f"d{size}"
                    f.createDimension(dname, size)
                    dims[size] = dname
                vdims.append(dims[size])
            out = arr
            if arr.dtype in _NC3_CAST:
                out = arr.astype(_NC3_CAST[arr.dtype])
            v = f.createVariable(name, out.dtype.str.lstrip("<>=|"),
                                 tuple(vdims))
            v[:] = out
            v.orig_dtype = arr.dtype.str.encode()
            v.orig_scalar = np.array([1 if scalar else 0], np.int32)


def _read_restart_cdf1(path: str):
    from scipy.io import netcdf_file

    arrays = {}
    with netcdf_file(path, "r", mmap=False) as f:
        meta = json.loads(bytes(f.meta_json).decode())
        for name, v in f.variables.items():
            arr = np.asarray(v[:]).astype(np.dtype(v.orig_dtype.decode()))
            if np.any(np.asarray(getattr(v, "orig_scalar", 0))):
                arr = arr.reshape(())
            arrays[name] = arr
    return arrays, meta


def _write_restart_h5(fileobj, arrays: dict, meta: dict) -> None:
    """HDF5 restart body (reference restart_format='hdf5'; io_netcdf
    ice_restart.F90 with nf90_netcdf4). Exact dtype round-trip is native —
    HDF5 stores bools/int64 losslessly (no _NC3_CAST needed)."""
    import h5py

    with h5py.File(fileobj, "w") as f:
        f.attrs["meta_json"] = json.dumps(meta)
        for name, arr in arrays.items():
            f.create_dataset(name, data=arr,
                             **(dict(compression="gzip", compression_opts=1)
                                if arr.ndim else {}))


def _read_restart_h5(path: str):
    import h5py

    arrays = {}
    with h5py.File(path, "r") as f:
        meta = json.loads(f.attrs["meta_json"])
        for name in f:
            arrays[name] = np.asarray(f[name])
    return arrays, meta


_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def _is_hdf5(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(8) == _HDF5_MAGIC


def write_restart(dirpath: str, state: State, calendar: Calendar,
                  pointer_file: str | None = None, *, prefix: str = "iced",
                  extra: dict | None = None, fmt: str = "npz",
                  writer=None) -> str:
    """Dump state to `<dirpath>/<prefix>.<timestamp>.{npz,nc}`; update pointer.

    fmt: 'npz' (default, exact bytes), 'cdf1' (netCDF-3 classic, the
    io_netcdf ice_restart analogue) or 'hdf5' (netCDF-4/HDF5, deflated,
    native exact dtypes). With `writer` (io.async_writer
    .AsyncWriter) the payload is queued to the native background pool and
    this returns immediately; call writer.flush() before reading it back.
    """
    import io as _io

    from .async_writer import SnapshotBytesIO, write_bytes

    os.makedirs(dirpath, exist_ok=True)
    leaves, _ = _flatten_state(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(year=calendar.year, month=calendar.month, day=calendar.day,
                sec=calendar.sec, istep=calendar.istep,
                calendar_type=calendar.calendar_type,
                year_init=calendar.year_init)
    if extra:
        meta.update(extra)

    if fmt == "cdf1":
        fname = os.path.join(dirpath, f"{prefix}.{calendar.timestamp()}.nc")
        buf = SnapshotBytesIO()
        _write_restart_cdf1(buf, arrays, meta)
        payload = buf.value           # netcdf_file closed the buffer
    elif fmt == "hdf5":
        # netCDF-4/HDF5 restart (reference restart_format='hdf5'): native
        # dtypes round-trip exactly, datasets gzip-deflated
        fname = os.path.join(dirpath, f"{prefix}.{calendar.timestamp()}.nc")
        buf = SnapshotBytesIO()
        _write_restart_h5(buf, arrays, meta)
        payload = buf.getvalue()
    else:
        fname = os.path.join(dirpath, f"{prefix}.{calendar.timestamp()}.npz")
        arrays["_meta"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
        buf = _io.BytesIO()
        np.savez(buf, **arrays)
        payload = buf.getvalue()
    write_bytes(fname, payload, writer)
    if pointer_file:
        os.makedirs(os.path.dirname(pointer_file) or ".", exist_ok=True)
        with open(pointer_file, "w") as f:
            f.write(fname + "\n")
    return fname


def read_restart(path_or_pointer: str, template: State) -> Tuple[State, Calendar]:
    """Load a restart (.npz or .nc); `template` supplies the pytree
    structure/dtypes."""
    path = path_or_pointer
    if not (path.endswith(".npz") or path.endswith(".nc")):
        with open(path_or_pointer) as f:
            path = f.read().strip()
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = []
    if path.endswith(".nc"):
        # cdf1 and hdf5 restarts share the .nc suffix (as the reference's
        # do); dispatch on the HDF5 magic bytes
        arrays, meta = (_read_restart_h5(path) if _is_hdf5(path)
                        else _read_restart_cdf1(path))
        for i, ref in enumerate(leaves):
            new_leaves.append(jax.numpy.asarray(arrays[f"leaf_{i}"],
                                                dtype=ref.dtype))
    else:
        with np.load(path) as z:
            meta = json.loads(bytes(z["_meta"]).decode())
            for i, ref in enumerate(leaves):
                arr = z[f"leaf_{i}"]
                new_leaves.append(jax.numpy.asarray(arr, dtype=ref.dtype))
    state = jax.tree.unflatten(treedef, new_leaves)
    cal = Calendar(calendar_type=meta["calendar_type"], year=meta["year"],
                   month=meta["month"], day=meta["day"], sec=meta["sec"],
                   istep=meta["istep"], year_init=meta["year_init"])
    return state, cal
