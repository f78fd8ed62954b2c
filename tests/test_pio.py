"""Decomposition-aware parallel IO (io_pio2 analogue): shard-wise writes
round-trip bit-for-bit, both unsharded and on the 8-device mesh, and a
sharded restart written from one mesh shape reads back on another."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cice_tpu.config import Config
from cice_tpu.io.pio import (read_field_sharded, read_restart_sharded,
                             write_field_sharded, write_restart_sharded)
from cice_tpu.parallel.mesh import grid_sharding, make_mesh, shard_state


def test_field_roundtrip_unsharded(tmp_path):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 12, 16).astype(np.float32))
    write_field_sharded(str(tmp_path), "x", x)
    y = read_field_sharded(str(tmp_path), "x")
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_field_roundtrip_sharded(tmp_path):
    mesh = make_mesh(shape=(2, 4))
    rng = np.random.RandomState(1)
    x = jax.device_put(rng.randn(16, 32).astype(np.float32),
                       grid_sharding(mesh))
    man = write_field_sharded(str(tmp_path), "fld", x)
    assert len(man["shards"]) == 8          # one file per device shard
    y = read_field_sharded(str(tmp_path), "fld", sharding=x.sharding)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert y.sharding.is_equivalent_to(x.sharding, x.ndim)


def test_restart_roundtrip_cross_mesh(tmp_path):
    """Write on a (2,4) mesh, read back on a (4,2) mesh — exact."""
    from cice_tpu.model.driver import Model
    cfg = Config().with_overrides(**{
        "grid.nx_global": 16, "grid.ny_global": 16,
        "grid.grid_format": "rect", "grid.kmt_type": "none",
        "forcing.atm_data_type": "box2001",
        "forcing.ocn_data_type": "box2001"})
    m = Model(cfg)
    mesh_a = make_mesh(shape=(2, 4))
    state_a = shard_state(mesh_a, m.state)
    ptr = str(tmp_path / "ice.restart_file")
    write_restart_sharded(str(tmp_path), state_a, m.calendar, ptr)

    mesh_b = make_mesh(shape=(4, 2))
    template = shard_state(mesh_b, m.state)
    state_b, cal = read_restart_sharded(ptr, template)
    assert cal.istep == m.calendar.istep
    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
