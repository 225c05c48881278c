"""Weak-signal envelope: detection, tracking, and fix quality vs C/N0.

Real L1 captures sit at ~35-50 dB-Hz; the rest of the suite runs at the
toy ~59 dB-Hz.  These tests pin the receiver's measured sensitivity floor
(documented in BASELINE.md):

* acquisition, reference scheme (2-ms best-of, acquisition.py:129-133,
  threshold 2.5): detection collapses below ~47 dB-Hz,
* acquisition, non-coherent K=10 accumulation (beyond the reference):
  ~100% detection down to 43 dB-Hz with no false alarms,
* tracking: lock holds at 35 dB-Hz; at <= 32 dB-Hz the loops lose lock
  and the lock detector (profiling.channel_lock_loss) must say so,
* end-to-end at a realistic 45 dB-Hz: navigation still fixes (slow test).

Note the receiver processes a REAL-valued IF capture: complex mixing
folds the image band's noise into baseband, so effective correlator C/N0
runs ~3 dB below the RF value (plus ~1 dB estimator/squaring losses) —
identical physics to the reference front end.
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels, acquire
from softgnss_tpu.profiling import channel_lock_loss, lock_metrics
from softgnss_tpu.signals.synth import (
    SatelliteSignal,
    amplitude_for_cn0,
    synthesize_signal,
)
from softgnss_tpu.track import track

SIGMA = 2.0


def _acq_trials(cfg_ref, cfg_nc, cn0, trials=8, seed=100):
    """Run both acquisition schemes on the same weak-signal captures."""
    rng = np.random.default_rng(seed)
    amp = amplitude_for_cn0(cfg_ref, cn0, SIGMA)
    det_ref = det_nc = 0
    false_alarms_nc = 0
    n_ms = max(cfg_ref.acquisition_ms, cfg_nc.acquisition_ms) + 1
    for _ in range(trials):
        prn = int(rng.integers(1, 33))
        sat = SatelliteSignal(
            prn=prn, doppler_hz=float(rng.uniform(-6000, 6000)),
            delay_samples=float(rng.uniform(0, cfg_ref.samples_per_code)),
            amplitude=amp, phase0=float(rng.uniform(0, 6.28)),
            nav_bits=tuple(rng.choice([-1, 1], size=32)))
        sig = synthesize_signal(cfg_ref, [sat], n_ms, noise_std=SIGMA,
                                seed=int(rng.integers(1 << 30)))
        a_ref = acquire(cfg_ref, sig[: cfg_ref.acquisition_ms * cfg_ref.samples_per_code])
        a_nc = acquire(cfg_nc, sig[: cfg_nc.acquisition_ms * cfg_nc.samples_per_code])
        det_ref += int(a_ref.acquired[prn - 1])
        det_nc += int(a_nc.acquired[prn - 1])
        false_alarms_nc += int(a_nc.acquired.sum()) - int(a_nc.acquired[prn - 1])
    return det_ref, det_nc, false_alarms_nc


class TestAcquisitionSensitivity:
    def test_noncoherent_beats_reference_scheme_at_43dbhz(self):
        """At 43 dB-Hz the reference's 1-ms scheme is blind (measured
        0/12 detections) while K=10 non-coherent accumulation detects
        essentially always with zero false alarms."""
        cfg_ref = sg.fast_config()
        cfg_nc = sg.fast_config(acq_noncoherent_ms=10)
        det_ref, det_nc, fa_nc = _acq_trials(cfg_ref, cfg_nc, cn0=43.0)
        assert det_nc >= 7, (det_ref, det_nc)
        assert det_ref <= 2, (det_ref, det_nc)
        assert fa_nc == 0

    def test_both_detect_at_50dbhz(self):
        cfg_ref = sg.fast_config()
        cfg_nc = sg.fast_config(acq_noncoherent_ms=10)
        det_ref, det_nc, fa_nc = _acq_trials(cfg_ref, cfg_nc, cn0=50.0,
                                             trials=4, seed=7)
        assert det_ref == 4 and det_nc == 4
        assert fa_nc == 0

    def test_noncoherent_matches_reference_scheme_when_strong(self):
        """Same peak location/frequency from both schemes on one capture."""
        cfg_ref = sg.fast_config()
        cfg_nc = sg.fast_config(acq_noncoherent_ms=10)
        sat = SatelliteSignal(prn=21, doppler_hz=1234.0, delay_samples=555.0,
                              amplitude=0.5,
                              nav_bits=tuple(np.resize([1, -1, 1, 1], 32)))
        sig = synthesize_signal(cfg_ref, [sat], cfg_nc.acquisition_ms + 1,
                                noise_std=SIGMA, seed=5)
        a_ref = acquire(cfg_ref, sig[: cfg_ref.acquisition_ms * cfg_ref.samples_per_code])
        a_nc = acquire(cfg_nc, sig[: cfg_nc.acquisition_ms * cfg_nc.samples_per_code])
        assert a_ref.acquired[20] and a_nc.acquired[20]
        assert a_ref.code_phase[20] == a_nc.code_phase[20]
        assert abs(a_ref.carr_freq[20] - a_nc.carr_freq[20]) < 1.0
        assert a_nc.peak_metric[20] > a_ref.peak_metric[20]

    def test_noise_only_no_detection_k10(self):
        cfg_nc = sg.fast_config(acq_noncoherent_ms=10)
        rng = np.random.default_rng(3)
        sig = rng.normal(0, SIGMA, cfg_nc.acquisition_ms
                         * cfg_nc.samples_per_code).astype(np.int8)
        a = acquire(cfg_nc, sig)
        assert not a.acquired.any()
        # K-ms square-law sum concentrates the noise metric well below the
        # threshold (the 2-ms scheme's noise metric ranges up to ~2.5)
        assert a.peak_metric.max() < 2.2


def _track_at(cn0, n_ms=3000, **cfg_kwargs):
    cfg = sg.fast_config(number_of_channels=4, **cfg_kwargs)
    amp = amplitude_for_cn0(cfg, cn0, SIGMA)
    sat = SatelliteSignal(prn=7, doppler_hz=1700.0, delay_samples=900.0,
                          amplitude=amp,
                          nav_bits=tuple(np.random.default_rng(2).choice(
                              [-1, 1], size=64)))
    sig = synthesize_signal(cfg, [sat], n_ms + 2, noise_std=SIGMA, seed=11)
    ch = Channels(prn=np.asarray([7, 0, 0, 0], np.int64),
                  acquired_freq=np.asarray(
                      [cfg.intermediate_freq + 1700.0, 0, 0, 0]),
                  code_phase=np.asarray([900, 0, 0, 0], np.int64),
                  status=["T", "-", "-", "-"])
    return cfg, track(cfg, sig, ch, n_ms=n_ms)


class TestTrackingSensitivity:
    def test_lock_holds_at_35dbhz(self):
        """35 dB-Hz is the measured tracking floor: data still on I
        (I/Q > 1.5), phase-lock indicator high, no demotion, median
        carrier-frequency error bounded by PLL thermal noise."""
        cfg, tr = _track_at(35.0)
        ip = np.abs(tr.i_p[0, 1000:]).mean()
        qp = np.abs(tr.q_p[0, 1000:]).mean()
        assert ip / qp > 1.5
        m = lock_metrics(cfg, tr, window_ms=1000)
        assert m["pll_lock"][0, -1] > 0.6
        assert np.isinf(channel_lock_loss(cfg, tr)[0])
        ferr = np.median(np.abs(tr.carr_freq[0, 1000:]
                                - (cfg.intermediate_freq + 1700.0)))
        assert ferr < 40.0

    def test_lock_lost_and_detected_at_30dbhz(self):
        """Below the floor the loops track noise — and the lock detector
        must say so instead of keeping the channel alive (the reference
        has no such detector at any C/N0)."""
        cfg, tr = _track_at(30.0)
        assert np.isfinite(channel_lock_loss(cfg, tr)[0])

    def test_pdi_extends_floor_to_30dbhz(self):
        """Coherent integration below the 1-ms floor (beyond the
        reference): at 30 dB-Hz the 1-ms loops lose lock (previous test)
        but 10-ms coherent integration with the PLL narrowed to 10 Hz
        holds — the standard long-PDI/narrow-loop weak-signal pairing
        (measured sweep: 5 ms at 25 Hz is still below threshold, 10 ms at
        10 Hz locks at ~7 Hz median error, 20 ms at 6 Hz at ~4 Hz)."""
        cfg, tr = _track_at(30.0, pdi_ms=10, pll_noise_bandwidth=10.0)
        ferr = np.median(np.abs(tr.carr_freq[0, 1000:]
                                - (cfg.intermediate_freq + 1700.0)))
        assert ferr < 20.0
        # phase lock on the 10-ms coherent sums
        ipK = np.abs(tr.i_p[0, 1000:3000].reshape(-1, 10).sum(1)).mean()
        qpK = np.abs(tr.q_p[0, 1000:3000].reshape(-1, 10).sum(1)).mean()
        assert ipK / qpK > 1.5, ipK / qpK
        # the lock detector's C/N0 floor scales with the coherent gain
        # (28 -> 18 dB-Hz at K=10), so the held channel is NOT demoted
        # even though its C/N0 sits below the 1-ms floor
        assert np.isinf(channel_lock_loss(cfg, tr)[0])

    def test_jitter_grows_monotonically(self):
        """DLL discriminator scatter rises as C/N0 falls (sanity on the
        noise model end to end)."""
        scatter = []
        for cn0 in (50.0, 40.0):
            _, tr = _track_at(cn0, n_ms=1500)
            scatter.append(np.std(tr.dll_discr[0, 500:]))
        assert scatter[0] < scatter[1]


@pytest.mark.slow
class TestRealisticEndToEnd:
    def test_fix_at_45dbhz(self):
        """Full closed loop at a realistic 45 dB-Hz: K=10 non-coherent
        acquisition finds all satellites (the reference scheme is ~50%
        at this level) and the fix lands within the weak-signal DLL
        noise budget."""
        from softgnss_tpu.pipeline import run_receiver
        from softgnss_tpu.scenario import build_scenario, synthesize_scenario

        n_ms = 37000
        cfg = sg.fast_config(number_of_channels=5, ms_to_process=n_ms,
                             acq_noncoherent_ms=10)
        amp = amplitude_for_cn0(cfg, 45.0, SIGMA)
        sc = build_scenario(cfg, n_sats=5, noise_std=SIGMA, amplitude=amp)
        sig = synthesize_scenario(sc, n_ms + cfg.acquisition_ms + 2)
        res = run_receiver(cfg, signal=sig)
        assert res.has_fix
        for prn in sc.prns:
            assert res.acquisition.acquired[prn - 1], f"PRN {prn} missed"
        sol = res.solutions
        rx = sc.receiver_ecef
        ok = np.isfinite(sol.x)
        assert ok.sum() >= 0.9 * sol.n_epochs
        err = np.sqrt((sol.x[ok] - rx[0]) ** 2 + (sol.y[ok] - rx[1]) ** 2
                      + (sol.z[ok] - rx[2]) ** 2)
        assert np.median(err) < 60.0
