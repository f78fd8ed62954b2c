"""Native helper tests: reproducible sums (sumchk analogue) + memusage."""

import numpy as np

from cice_tpu.native import (compsum_host, memusage_highwater_mb,
                             reprosum_host)


def test_memusage():
    hw = memusage_highwater_mb()
    assert hw > 1.0   # a python process uses > 1 MB


def test_reprosum_order_invariant():
    rng = np.random.default_rng(42)
    x = rng.standard_normal(100000) * 10.0 ** rng.integers(-6, 6, 100000)
    s1 = reprosum_host(x)
    s2 = reprosum_host(x[::-1])
    s3 = reprosum_host(rng.permutation(x))
    assert s1 == s2 == s3            # bit-for-bit, any order
    # and accurate: matches math.fsum
    import math
    assert abs(s1 - math.fsum(x)) <= abs(math.fsum(x)) * 1e-12 + 1e-9


def test_compsum_accuracy():
    # pathological cancellation case
    x = np.array([1e16, 1.0, -1e16, 1.0, 1e-3])
    assert abs(compsum_host(x) - 2.001) < 1e-12
