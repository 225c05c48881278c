"""Front-end compatibility: the reference's alternate capture format.

The reference names a second recording format, fs=16.3676 MHz /
IF=4.1304 MHz (GPS_and_GIOVE_A-NN-fs16_3676-if4_1304.bin, reference
main.py:60).  This config exercises a non-power-of-two samples_per_code
(16368 = 2^4*3*11*31 -> the folded-correlation acquisition path) and a
16-samples/chip code grid.  The synthetic backend requires ms-divisible
sampling (16.368 MHz here, 400 Hz off the real front end — receiver code
paths are identical; only the test generator needs the divisibility).
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.acquire import acquire, assign_channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track import track


@pytest.fixture(scope="module")
def giove_cfg():
    return sg.ReceiverConfig(
        sampling_freq=16_368_000.0,
        intermediate_freq=4_130_400.0,
        number_of_channels=3,
        ms_to_process=1000,
    )


def test_front_end_geometry(giove_cfg):
    cfg = giove_cfg
    assert cfg.samples_per_code == 16368
    assert cfg.samples_per_chip == 16
    # non-power-of-two: acquisition takes the folded 2N path
    from softgnss_tpu.acquire.search import _corr_fft_len
    assert _corr_fft_len(cfg) == 32768  # next pow2 >= 2*16368


def test_acquire_and_track(giove_cfg):
    cfg = giove_cfg
    sats = [SatelliteSignal(prn=9, doppler_hz=2300.0, delay_samples=5000.0),
            SatelliteSignal(prn=27, doppler_hz=-1100.0, delay_samples=12000.0)]
    sig = synthesize_signal(cfg, sats, cfg.acquisition_ms + 310, noise_std=1.5, seed=4)
    res = acquire(cfg, sig)
    for s in sats:
        assert res.acquired[s.prn - 1], s.prn
        assert abs(int(res.code_phase[s.prn - 1]) - s.delay_samples) <= 1
        truth = cfg.intermediate_freq + s.doppler_hz
        assert abs(res.carr_freq[s.prn - 1] - truth) < 10.0

    ch = assign_channels(cfg, res)
    tr = track(cfg, sig, ch, n_ms=300)
    for c in range(2):
        ip = np.abs(tr.i_p[c, 150:]).mean()
        qp = np.abs(tr.q_p[c, 150:]).mean()
        assert ip / qp > 4.0, f"channel {c} not locked at the GIOVE front end"
        want = cfg.intermediate_freq + [s for s in sats if s.prn == ch.prn[c]][0].doppler_hz
        assert abs(np.median(tr.carr_freq[c, 150:]) - want) < 5.0
