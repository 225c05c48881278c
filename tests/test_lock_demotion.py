"""Lock-quality channel demotion (beyond the reference).

The reference records the observables behind lock metrics but never reacts
to lock loss (tracking.py:253-275): a channel that loses its signal keeps
status 'T' and keeps feeding navigation.  Here, profiling.channel_lock_loss
detects the collapse (Van Dierendonck C/N0 + NBD/NBP phase lock) and the
pipeline/navigation demote the channel from that millisecond on.

RF-level detection is tested by killing a satellite mid-capture via the
synthesizer's per-ms amplitude envelope; the navigation-side exclusion is
tested at the observables level in tests/test_postnav.py.
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.profiling import channel_lock_loss
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal

N_MS = 4000
KILL_MS = 2500


@pytest.fixture(scope="module")
def killed_run():
    cfg = sg.fast_config(number_of_channels=4)
    sats = [
        SatelliteSignal(prn=3, doppler_hz=1500.0, delay_samples=400.0,
                        nav_bits=(1, -1, 1, 1, -1, 1, -1, -1)),
        SatelliteSignal(prn=9, doppler_hz=-2600.0, delay_samples=1800.0,
                        nav_bits=(-1, 1, 1, -1, 1, -1, 1, 1)),
        # killed mid-capture: full strength until KILL_MS, then silence
        SatelliteSignal(prn=17, doppler_hz=800.0, delay_samples=3000.0,
                        nav_bits=(1, 1, -1, 1, -1, -1, 1, -1),
                        amplitude=(1.0,) * KILL_MS + (0.0,)),
        SatelliteSignal(prn=25, doppler_hz=-500.0, delay_samples=900.0,
                        nav_bits=(-1, -1, 1, 1, 1, -1, -1, 1)),
    ]
    sig = synthesize_signal(cfg, sats, N_MS + cfg.acquisition_ms + 2,
                            noise_std=1.5, seed=3)
    res = run_receiver(cfg, signal=sig, n_ms=N_MS, navigate=False)
    return cfg, sats, res


class TestLockLossDetection:
    def test_killed_channel_demoted(self, killed_run):
        cfg, sats, res = killed_run
        tr = res.tracking
        assert tr.lock_loss_ms is not None
        ch = int(np.flatnonzero(tr.prn == 17)[0])
        loss = tr.lock_loss_ms[ch]
        # demotion lands on a lock-window boundary at/after the kill;
        # the window containing the kill may still average above threshold
        assert KILL_MS - cfg.lock_window_ms <= loss <= KILL_MS + cfg.lock_window_ms
        assert tr.status[ch] == "L"

    def test_healthy_channels_keep_status(self, killed_run):
        cfg, sats, res = killed_run
        tr = res.tracking
        for prn in (3, 9, 25):
            ch = int(np.flatnonzero(tr.prn == prn)[0])
            assert tr.status[ch] == "T"
            assert np.isinf(tr.lock_loss_ms[ch])

    def test_summary_reports_transition(self, killed_run):
        cfg, sats, res = killed_run
        s = res.summary()
        assert "lock lost" in s
        assert "PRN 17" in s

    def test_direct_detector_agrees(self, killed_run):
        cfg, sats, res = killed_run
        loss = channel_lock_loss(cfg, res.tracking)
        np.testing.assert_array_equal(loss, res.tracking.lock_loss_ms)

    def test_short_capture_no_demotion_info(self, killed_run):
        cfg, sats, res = killed_run

        class Short:
            i_p = np.asarray(res.tracking.i_p)[:, :500]
            status = res.tracking.status

        assert np.all(np.isinf(channel_lock_loss(cfg, Short())))

    def test_demotion_disabled_keeps_t_status(self, killed_run):
        cfg, sats, res = killed_run
        from softgnss_tpu.pipeline import _demote_unlocked
        from softgnss_tpu.track.scan import TrackResults
        import dataclasses

        off = cfg.with_options(lock_demotion=False)
        clean = dataclasses.replace(res.tracking, lock_loss_ms=None,
                                    status=["T"] * len(res.tracking.status))
        _demote_unlocked(off, clean)
        assert clean.lock_loss_ms is None
        assert all(s == "T" for s in clean.status)


class TestEnvelopeSynthesis:
    def test_scalar_amplitude_unchanged(self):
        """A length-1 envelope equals the scalar-amplitude signal."""
        cfg = sg.fast_config()
        sat_s = SatelliteSignal(prn=7, doppler_hz=1000.0, amplitude=0.8)
        sat_e = SatelliteSignal(prn=7, doppler_hz=1000.0, amplitude=(0.8,))
        a = synthesize_signal(cfg, [sat_s], 20, noise_std=0.5, seed=1)
        b = synthesize_signal(cfg, [sat_e], 20, noise_std=0.5, seed=1)
        np.testing.assert_array_equal(a, b)

    def test_envelope_silences_tail(self):
        cfg = sg.fast_config()
        sat = SatelliteSignal(prn=7, doppler_hz=1000.0,
                              amplitude=(1.0,) * 10 + (0.0,))
        sig = synthesize_signal(cfg, [sat], 20, noise_std=0.0)
        spc = cfg.samples_per_code
        assert np.abs(sig[: 10 * spc]).max() > 0
        assert np.abs(sig[10 * spc:]).max() == 0
