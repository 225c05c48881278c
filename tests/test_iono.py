"""Klobuchar ionospheric correction: codec round trip, model sanity, and
the closed loop (inject -> broadcast -> decode -> correct)."""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.nav.iono import klobuchar
from softgnss_tpu.nav.message import build_nav_stream, decode_iono
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario

#: strong-ionosphere broadcast coefficients (exact multiples of the field
#: scales, so the codec round trip is bit-exact; amplitude at the high
#: end of real activity so the E2E effect is unambiguous)
IONO = np.array([40 * 2.0**-30, 16 * 2.0**-27, -5 * 2.0**-24, -3 * 2.0**-24,
                 38 * 2.0**11, 3 * 2.0**14, -1 * 2.0**16, -5 * 2.0**16])


def test_codec_roundtrip_and_polarity():
    from softgnss_tpu.scenario import circular_ephemeris

    eph = circular_ephemeris()
    bits = np.asarray(build_nav_stream(eph, 12340, 6, iono=IONO))
    # frames start at Z-counts divisible by 5 -> subframe 4 is in there
    got = decode_iono(bits[300:1801], bits[299])
    np.testing.assert_array_equal(got, IONO)
    assert decode_iono(-bits[300:1801], -bits[299]) is not None
    # a stream without the page yields None
    plain = np.asarray(build_nav_stream(eph, 12340, 6))
    assert decode_iono(plain[300:1801], plain[299]) is None


def test_klobuchar_model_sanity():
    tow_day = 50400.0            # local 14:00 at lon 0 -> peak
    d_day = float(klobuchar(IONO, 47.0, 8.0, 120.0, 60.0, tow_day))
    d_night = float(klobuchar(IONO, 47.0, 8.0, 120.0, 60.0, 10000.0))
    d_lowel = float(klobuchar(IONO, 47.0, 8.0, 120.0, 10.0, tow_day))
    c = 299792458.0
    assert 1.0 < d_day * c < 40.0            # meters, plausible daytime
    assert d_night < d_day                   # night floor is lower
    assert d_lowel > d_day                   # slant factor grows at low el
    assert d_night * c > 1.0                 # 5 ns floor * F > 1 m


@pytest.mark.slow
def test_closed_loop_iono_injected_and_corrected():
    """Injected slant iono delays are recovered through the broadcast
    page: with the correction the fix meets the normal budget; without it
    the (common-mode absorbed) residual bias is visibly larger."""
    n_ms = 37000
    cfg = sg.fast_config(number_of_channels=5, ms_to_process=n_ms)
    # tow_count chosen so the capture's local time sits near the 14:00
    # Klobuchar peak (the default scenario tow lands on the night floor,
    # where the correction is a few-ns constant)
    sc = build_scenario(cfg, n_sats=5, tow_count=65660)
    sc.iono = IONO
    sig = synthesize_scenario(sc, n_ms + 20)

    res = run_receiver(cfg, signal=sig)
    assert res.has_fix
    err = np.linalg.norm(
        np.stack([res.solutions.x, res.solutions.y, res.solutions.z], 1)
        - np.asarray(sc.receiver_ecef), axis=1)
    corr_med = np.nanmedian(err)
    assert corr_med < 30.0

    res0 = run_receiver(cfg.with_options(use_iono_corr=False), signal=sig,
                        channels=res.channels)
    err0 = np.linalg.norm(
        np.stack([res0.solutions.x, res0.solutions.y, res0.solutions.z], 1)
        - np.asarray(sc.receiver_ecef), axis=1)
    assert np.nanmedian(err0) > corr_med + 2.0
