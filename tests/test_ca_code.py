"""C/A code generation tests.

Gold-standard check: the first 10 chips of each PRN against the octal values
published in IS-GPS-200 Table 3-Ia (binary 1 -> chip +1).
"""

import numpy as np
import pytest

from softgnss_tpu import fast_config
from softgnss_tpu.signals import ca


# IS-GPS-200 Table 3-Ia: first 10 chips (octal) per PRN 1..32.
FIRST_10_CHIPS_OCTAL = {
    1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133, 6: 0o1455,
    7: 0o1131, 8: 0o1454, 9: 0o1626, 10: 0o1504, 11: 0o1642, 12: 0o1750,
    13: 0o1764, 14: 0o1772, 15: 0o1775, 16: 0o1776, 17: 0o1156, 18: 0o1467,
    19: 0o1633, 20: 0o1715, 21: 0o1746, 22: 0o1763, 23: 0o1063, 24: 0o1706,
    25: 0o1743, 26: 0o1761, 27: 0o1770, 28: 0o1774, 29: 0o1127, 30: 0o1453,
    31: 0o1625, 32: 0o1712,
}


def _first10_octal(code):
    bits = (code[:10] > 0).astype(int)
    return int("".join(map(str, bits)), 2)


@pytest.mark.parametrize("prn", list(range(1, 33)))
def test_first_10_chips_match_icd(prn):
    assert _first10_octal(ca.gold_code(prn)) == FIRST_10_CHIPS_OCTAL[prn]


def test_chip_alphabet_and_balance():
    codes = ca.gold_codes()
    assert codes.shape == (32, 1023)
    assert set(np.unique(codes)) == {-1, 1}
    # Gold codes of length 1023 have 512 ones / 511 zeros (sum == +/-1... sum=+1 with 1->+1)
    assert np.all(codes.sum(axis=1) == 1)


def test_codes_distinct_and_low_cross_correlation():
    codes = ca.gold_codes().astype(np.float64)
    xc = codes @ codes.T
    assert np.all(np.diag(xc) == 1023)
    off = xc - np.diag(np.diag(xc))
    # Gold code cross-correlation alphabet at zero lag: {-65, -1, 63}
    assert np.abs(off).max() <= 65


def test_padded_code_wraparound():
    p = ca.padded_code(7)
    c = ca.gold_code(7)
    assert p.shape == (1025,)
    assert p[0] == c[-1] and p[-1] == c[0]
    assert np.array_equal(p[1:-1], c)


def test_resample_indices_reference_semantics():
    cfg = fast_config()
    idx = ca.resample_indices(cfg)
    n = cfg.samples_per_code
    assert idx.shape == (n,)
    assert idx[0] == 0 and idx[-1] == 1022
    assert np.all(np.diff(idx) >= 0)
    # reference formula spot check (initialize.py:223-226)
    ts, tc = 1.0 / cfg.sampling_freq, 1.0 / cfg.code_freq_basis
    ref = np.ceil(ts * np.arange(1, n + 1) / tc) - 1
    ref[-1] = 1022
    assert np.array_equal(idx, ref.astype(np.int32))


def test_ca_table_shape_and_values():
    cfg = fast_config()
    table = ca.ca_table(cfg)
    assert table.shape == (32, cfg.samples_per_code)
    assert table.dtype == np.float32
    # each sample is a chip of the right PRN
    assert np.array_equal(table[4], ca.gold_code(5)[ca.resample_indices(cfg)])
