"""Calendar semantics tests (oracle: reference unittest `calchk`,
drivers/unittest/calchk/calchk.F90 — long advances, leap rules, round trips)."""

from cice_tpu.calendar import (Calendar, date_to_elapsed_days,
                               elapsed_days_to_date, days_in_year, is_leap,
                               npt_to_steps)


def test_leap_rules():
    assert is_leap(2000)
    assert not is_leap(1900)
    assert is_leap(2004)
    assert not is_leap(2005)


def test_days_in_year():
    assert days_in_year("noleap", 2000) == 365
    assert days_in_year("gregorian", 2000) == 366
    assert days_in_year("360day", 2000) == 360


def test_advance_day_rollover():
    c = Calendar("noleap", 2005, 1, 31, 82800)
    c = c.advance(3600)
    assert (c.year, c.month, c.day, c.sec) == (2005, 2, 1, 0)


def test_advance_year_rollover():
    c = Calendar("noleap", 2005, 12, 31, 82800)
    c = c.advance(3600)
    assert (c.year, c.month, c.day, c.sec) == (2006, 1, 1, 0)


def test_gregorian_feb29():
    c = Calendar("gregorian", 2004, 2, 28, 82800)
    c = c.advance(3600)
    assert (c.month, c.day) == (2, 29)


def test_roundtrip_dates_100k_days():
    # calchk-style: elapsed-day <-> date round trip over long horizons
    for cal in ("noleap", "gregorian", "360day"):
        for edays in [0, 1, 59, 365, 366, 1000, 36524, 100000]:
            y, m, d = elapsed_days_to_date(cal, edays, ref_year=2000)
            back = date_to_elapsed_days(cal, y, m, d, ref_year=2000)
            assert back == edays, (cal, edays, (y, m, d))


def test_elapsed_days_long_advance():
    c = Calendar("noleap", 2005, 1, 1, 0, year_init=2005)
    for _ in range(365 * 24):
        c = c.advance(3600)
    assert (c.year, c.month, c.day, c.sec) == (2006, 1, 1, 0)
    assert c.elapsed_days == 365


def test_boundaries():
    c = Calendar("noleap", 2005, 1, 1, 0, year_init=2005)
    c = c.advance(3600 * 24)  # end of day 1... 24 steps? no: one 86400 s step
    assert c.is_boundary("d", 1)
    assert not c.is_boundary("m", 1)
    c2 = Calendar("noleap", 2005, 2, 1, 0, year_init=2005, istep=744)
    assert c2.is_boundary("m", 1)
    assert c2.is_boundary("1", 24)
    assert not c2.is_boundary("y", 1)


def test_npt_units():
    c = Calendar("noleap", 2005, 1, 1, 0, year_init=2005)
    assert npt_to_steps(24, "1", 3600.0, c) == 24
    assert npt_to_steps(1, "d", 3600.0, c) == 24
    assert npt_to_steps(1, "y", 3600.0, c) == 365 * 24
