"""Acquisition tests: recover injected Doppler / code phase from synthetic IF."""

import numpy as np
import pytest

from softgnss_tpu import fast_config
from softgnss_tpu.acquire import acquire, assign_channels, format_channel_status
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal


@pytest.fixture(scope="module")
def cfg():
    return fast_config()


@pytest.fixture(scope="module")
def scenario(cfg):
    sats = [
        SatelliteSignal(prn=3, doppler_hz=1500.0, delay_samples=1234.0, amplitude=1.0,
                        phase0=0.7),
        SatelliteSignal(prn=17, doppler_hz=-2500.0, delay_samples=3210.0, amplitude=0.9,
                        phase0=2.1),
        SatelliteSignal(prn=28, doppler_hz=250.0, delay_samples=40.0, amplitude=1.2,
                        phase0=4.0),
    ]
    signal = synthesize_signal(cfg, sats, cfg.acquisition_ms + 1, noise_std=1.5, seed=3)
    return sats, signal


def test_acquires_injected_sats(cfg, scenario):
    sats, signal = scenario
    res = acquire(cfg, signal)
    injected = {s.prn for s in sats}
    detected = {i + 1 for i in np.flatnonzero(res.acquired)}
    assert injected <= detected, f"missed {injected - detected}"
    # no strong false alarms beyond the injected set
    assert len(detected - injected) == 0

    for s in sats:
        i = s.prn - 1
        # code phase exact to the sample (signal synthesized at integer delay)
        assert abs(int(res.code_phase[i]) - int(s.delay_samples)) <= 1
        # fine frequency within a few zoom-FFT bins + noise margin
        from softgnss_tpu.acquire.search import fine_freq_resolution
        fine_bin = fine_freq_resolution(cfg)
        truth = cfg.intermediate_freq + s.doppler_hz
        assert abs(res.carr_freq[i] - truth) < 3 * fine_bin + 5.0


def test_peak_metric_separates_signal_from_noise(cfg, scenario):
    sats, signal = scenario
    res = acquire(cfg, signal)
    for s in sats:
        assert res.peak_metric[s.prn - 1] > cfg.acq_threshold
    absent = sorted(set(range(1, 33)) - {s.prn for s in sats})
    absent_metrics = res.peak_metric[[p - 1 for p in absent]]
    assert np.median(absent_metrics) < 2.0


def test_channel_assignment(cfg, scenario):
    sats, signal = scenario
    res = acquire(cfg, signal)
    ch = assign_channels(cfg, res)
    assert len(ch) == cfg.number_of_channels
    active = [i for i in range(len(ch)) if ch.status[i] == "T"]
    assert len(active) == len(sats)
    # strongest metric first
    metrics = [res.peak_metric[ch.prn[i] - 1] for i in active]
    assert metrics == sorted(metrics, reverse=True)
    assert {int(ch.prn[i]) for i in active} == {s.prn for s in sats}
    # idle channels zeroed
    for i in range(len(active), len(ch)):
        assert ch.prn[i] == 0 and ch.status[i] == "-"
    table = format_channel_status(cfg, ch)
    assert "PRN" in table and table.count("\n") == cfg.number_of_channels + 3
