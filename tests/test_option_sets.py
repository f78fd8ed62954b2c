"""Option-fragment composition (set_nml.* analogues, SURVEY §2.8).

Every fragment in cli.main.OPTION_SETS must compose into a valid Config
(with_overrides raises on unknown keys), fragments must stack in order, and
the grid-shaping fragments must build real grids (boxislands kmt carves the
reference's obstacle course, ice_grid.F90:2935)."""

import numpy as np
import pytest

from cice_tpu.cli.main import OPTION_SETS
from cice_tpu.config import Config
from cice_tpu.core.grid import BC, make_kmt_rect


def test_all_fragments_compose():
    base = Config()
    for name, over in OPTION_SETS.items():
        cfg = base.with_overrides(**over)
        assert cfg is not None, name


def test_fragment_stacking_order():
    cfg = Config()
    for name in ("gx3", "mushy", "alt07", "ndte120"):
        cfg = cfg.with_overrides(**OPTION_SETS[name])
    # later fragments win: alt07 sets ndte=300, ndte120 overrides to 120
    assert cfg.dynamics.ndte == 120
    assert cfg.dynamics.capping_method == "sum"
    assert cfg.thermo.ktherm == 2
    assert cfg.grid.nx_global == 100


def test_unknown_fragment_key_rejected():
    with pytest.raises(Exception):
        Config().with_overrides(**{"dynamics.not_a_real_knob": 1})


def test_boxislands_kmt():
    hm = make_kmt_rect(80, 80, "boxislands", BC(ew="cyclic", ns="open"))
    assert hm.shape == (80, 80)
    ocean = hm.sum() / hm.size
    assert 0.5 < ocean < 0.98          # mostly ocean, real land carved out
    # obstacles are interior (islands), not only at the boundary
    assert (hm[20:60, 20:60] == 0.0).any()
    # tiny island present (2x2 block near 14*nyb)
    nyb = nxb = 80 // 20
    assert hm[14 * nyb - 1:14 * nyb + 1, 14 * nxb - 1:14 * nxb + 1].sum() == 0


@pytest.mark.parametrize("name", ["alt02", "alt04", "boxslotcyl", "qc"])
def test_composite_fragments_values(name):
    cfg = Config().with_overrides(**OPTION_SETS[name])
    if name == "alt02":
        assert cfg.domain.ncat == 1 and cfg.dynamics.revised_evp
    elif name == "alt04":
        assert cfg.thermo.conduct == "MU71"
        assert cfg.dynamics.evp_algorithm == "fused_pallas"
    elif name == "boxslotcyl":
        assert cfg.dynamics.kdyn == -1 and cfg.dynamics.ktransport == 1
    elif name == "qc":
        assert cfg.setup.npt_unit == "y" and cfg.setup.npt == 5
        assert cfg.setup.histfreq[0] == "d" and not cfg.setup.hist_avg
