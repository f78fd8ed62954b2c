"""Global reductions: the sumchk oracle ported (reference
drivers/unittest/sumchk + comm/mpi/ice_global_reductions.F90:99-750).

Every bfbflag mode must (a) agree with a trusted high-precision sum within
its advertised accuracy and (b) the layout-invariant modes must be exactly
invariant under permutation/reshape of the summands — the reference's
decomposition-independence contract.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice_tpu.core.reductions import (global_maxval, global_minval,
                                      global_sum)

MODES = ["off", "lsum4", "lsum8", "lsum16", "ddpdd", "reprosum"]


def _field(seed=0, n=64):
    rng = np.random.default_rng(seed)
    # wide dynamic range stresses accumulation error
    x = rng.uniform(-1.0, 1.0, (n, n)) * 10.0 ** rng.integers(-6, 6, (n, n))
    return x


@pytest.mark.parametrize("mode", MODES)
def test_sum_accuracy(mode):
    x = _field()
    ref = float(np.sum(x.astype(np.longdouble)))
    got = float(global_sum(jnp.asarray(x), bfbflag=mode))
    scale = max(abs(ref), np.abs(x).max())
    tol = {"off": 1e-12, "lsum4": 2e-4, "lsum8": 1e-12, "lsum16": 1e-14,
           "ddpdd": 1e-14, "reprosum": 1e-9}[mode]
    assert abs(got - ref) <= tol * scale, (mode, got, ref)


@pytest.mark.parametrize("mode", ["lsum16", "ddpdd", "reprosum"])
def test_layout_invariance(mode):
    """Permuting summands must not change the high-accuracy modes beyond
    their own roundoff floor; reprosum must be EXACTLY invariant."""
    x = _field(3)
    rng = np.random.default_rng(7)
    perm = rng.permutation(x.size)
    a = float(global_sum(jnp.asarray(x), bfbflag=mode))
    b = float(global_sum(jnp.asarray(x.ravel()[perm].reshape(x.shape)),
                         bfbflag=mode))
    if mode == "reprosum":
        assert a == b, (a, b)
    else:
        assert abs(a - b) <= 1e-13 * max(abs(a), np.abs(x).max())


def test_weighted_masked():
    x = jnp.asarray(_field(5))
    w = jnp.abs(x) * 0.1
    m = x > 0
    ref = float(np.sum(np.where(np.asarray(m), np.asarray(x * w), 0.0)))
    got = float(global_sum(x, weight=w, mask=m, bfbflag="lsum8"))
    assert abs(got - ref) <= 1e-9 * max(1.0, abs(ref))


def test_minmax_masked():
    x = jnp.asarray(_field(9))
    m = x < 0
    assert float(global_maxval(x, m)) == float(np.asarray(x)[np.asarray(m)].max())
    assert float(global_minval(x, m)) == float(np.asarray(x)[np.asarray(m)].min())
