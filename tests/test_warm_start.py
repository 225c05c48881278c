"""Warm-start navigation: externally supplied ephemerides -> fix from a
short capture (the reference always needs the full 30 s frame decode)."""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.nav.message import (
    build_nav_stream,
    decode_ephemeris,
    decode_tow,
    load_ephemerides,
    save_ephemerides,
)
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario


def test_decode_tow_matches_frame_decode():
    """decode_tow on one subframe's first 60 bits agrees with the full
    frame decode's subframe-1 timestamp, for both polarities."""
    from softgnss_tpu.scenario import circular_ephemeris

    eph = circular_ephemeris()
    z0 = 12345
    bits = np.asarray(build_nav_stream(eph, z0, 6))     # (+/-1, 300-bit sfs)
    # stream[0] is the first bit of subframe z0; preceding bit unknown ->
    # build_nav_stream defines d30star = -1 start
    full_eph, tow_full = decode_ephemeris(bits[300:1800 + 1], bits[299])
    tow_sf = decode_tow(bits[300:360], bits[299])
    assert tow_sf == tow_full
    # the window starts at subframe z0+1, whose start time is (z0+1)*6
    assert tow_sf == (z0 + 1) * 6.0
    # inverted stream (Costas 180-degree ambiguity)
    assert decode_tow(-bits[300:360], -bits[299]) == tow_sf


def test_save_load_roundtrip(tmp_path):
    from softgnss_tpu.scenario import keplerian_ephemeris

    ephs = [None] * 32
    ephs[6] = keplerian_ephemeris()
    ephs[20] = keplerian_ephemeris(omega_0=1.0)
    path = str(tmp_path / "eph.npz")
    save_ephemerides(path, ephs)
    back = load_ephemerides(path)
    assert back[0] is None and back[31] is None
    for i in (6, 20):
        for name in ("sqrt_a", "omega_0", "m_0", "t_oe", "a_f0", "iodc",
                     "iode_sf2", "iode_sf3", "week_number"):
            assert getattr(back[i], name) == getattr(ephs[i], name), (i, name)
        assert back[i].complete
    assert isinstance(back[6].iodc, int)


def test_cli_ephemerides_roundtrip(tmp_path, capsys):
    """--save-ephemerides writes a set that --ephemerides loads back."""
    from softgnss_tpu.cli import main
    from softgnss_tpu.scenario import keplerian_ephemeris

    ephs = [None] * 32
    ephs[4] = keplerian_ephemeris()
    path = str(tmp_path / "eph.npz")
    save_ephemerides(path, ephs)
    back = load_ephemerides(path)
    assert back[4].complete
    # CLI parses the flag and loads the file (short capture: nav declines,
    # which proves the warm path was reached without error)
    import softgnss_tpu.io as sio
    cfg = sg.fast_config(number_of_channels=2)
    from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
    sig = synthesize_signal(cfg, [SatelliteSignal(prn=5, doppler_hz=1000.0,
                                                  delay_samples=100.0)],
                            300, noise_std=1.5, seed=3)
    cap = str(tmp_path / "cap.bin")
    sio.write_if_samples(cap, sig)
    rc = main(["--fast", "--file", cap, "--cpu", "--ms", "250",
               "--ephemerides", path])
    assert rc == 0
    assert "Tracked 250 ms" in capsys.readouterr().out


@pytest.mark.slow
def test_warm_start_fix_from_short_capture():
    """12 s of capture + a prior ephemeris set -> position fix; the cold
    path correctly refuses the same capture (36 s frame gate)."""
    cfg = sg.fast_config(number_of_channels=5, ms_to_process=12000)
    sc = build_scenario(cfg, n_sats=5)
    sig = synthesize_scenario(sc, 12020)

    cold = run_receiver(cfg, signal=sig)
    assert not cold.has_fix                      # too short without a frame

    ephs = [None] * 32
    for prn, eph in zip(sc.prns, sc.ephemerides):
        ephs[prn - 1] = eph
    warm = run_receiver(cfg, signal=sig, ephemerides=ephs)
    assert warm.has_fix
    sol = warm.solutions
    err = np.linalg.norm(np.stack([sol.x, sol.y, sol.z], 1)
                         - np.asarray(sc.receiver_ecef), axis=1)
    ok = np.isfinite(err)
    assert ok.sum() >= sol.n_epochs - 1
    assert np.nanmedian(err) < 30.0
