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
    from softgnss_tpu.nav.message import load_iono
    from softgnss_tpu.scenario import keplerian_ephemeris

    ephs = [None] * 32
    ephs[6] = keplerian_ephemeris()
    ephs[20] = keplerian_ephemeris(omega_0=1.0)
    path = str(tmp_path / "eph.npz")
    iono = np.arange(8) * 1e-8
    save_ephemerides(path, ephs, iono=iono)
    np.testing.assert_array_equal(load_iono(path), iono)
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


class TestAssistedAcquisition:
    def test_predict_doppler_matches_scenario_truth(self):
        """Predicted Doppler from the broadcast orbit agrees with the
        synthesizer's geometry-derived Doppler to a few Hz."""
        from softgnss_tpu.nav.assist import predict_doppler

        cfg = sg.fast_config(number_of_channels=5)
        sc = build_scenario(cfg, n_sats=5)
        synthesize_scenario(sc, 2)          # fills the truth delay/Doppler
        ephs = [None] * 32
        for prn, eph in zip(sc.prns, sc.ephemerides):
            ephs[prn - 1] = eph
        hints = predict_doppler(cfg, ephs, sc.receiver_ecef, sc.t_rx0)
        for i, prn in enumerate(sc.prns):
            truth = cfg.intermediate_freq + sc.dopplers[i]
            assert abs(hints[prn - 1] - truth) < 10.0, (prn, hints[prn - 1], truth)
        assert np.isnan(hints[[p - 1 for p in range(1, 33)
                               if p not in sc.prns]]).all()

    def test_hinted_acquisition_matches_and_masks(self):
        """A truth-centered hint reproduces the unhinted result; a hint
        pointing away from the true Doppler masks the satellite out."""
        from softgnss_tpu.acquire.search import acquire
        from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal

        cfg = sg.fast_config()
        sat = SatelliteSignal(prn=17, doppler_hz=2600.0, delay_samples=1500.0,
                              nav_bits=tuple(np.resize([1, -1, 1, 1], 32)))
        sig = synthesize_signal(cfg, [sat], cfg.acquisition_ms + 1,
                                noise_std=1.5, seed=8)
        sig = sig[: cfg.acquisition_ms * cfg.samples_per_code]
        cold = acquire(cfg, sig)
        hints = np.full(32, np.nan)
        hints[16] = cfg.intermediate_freq + 2600.0
        warm = acquire(cfg, sig, doppler_hints=hints)
        assert warm.acquired[16] and cold.acquired[16]
        assert warm.code_phase[16] == cold.code_phase[16]
        assert abs(warm.carr_freq[16] - cold.carr_freq[16]) < 1e-6
        # hint 5 kHz off with a tight window: the true peak is excluded
        hints[16] = cfg.intermediate_freq + 2600.0 - 5000.0
        masked = acquire(cfg, sig, doppler_hints=hints, hint_halfwidth_hz=400.0)
        assert not masked.acquired[16]
        assert np.isfinite(masked.peak_metric[16])


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
    # full assisted start: ephemerides + approximate position/time also
    # Doppler-hint the acquisition (position off by ~3 km, time by ~0.2 s
    # — the realistic warm-start knowledge level)
    warm = run_receiver(cfg, signal=sig, ephemerides=ephs,
                        assist_position=np.asarray(sc.receiver_ecef) + 2000.0,
                        assist_tow=sc.t_rx0 + 0.2)
    assert warm.has_fix
    sol = warm.solutions
    err = np.linalg.norm(np.stack([sol.x, sol.y, sol.z], 1)
                         - np.asarray(sc.receiver_ecef), axis=1)
    ok = np.isfinite(err)
    assert ok.sum() >= sol.n_epochs - 1
    assert np.nanmedian(err) < 30.0
