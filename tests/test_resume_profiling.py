"""Mid-capture resume determinism and the observability subsystem."""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.acquire import acquire, assign_channels
from softgnss_tpu.pipeline import load_tracking, save_tracking
from softgnss_tpu.profiling import StageTimer, lock_metrics, trace
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track import track


@pytest.fixture(scope="module")
def setup():
    cfg = sg.fast_config(number_of_channels=3)
    nav_bits = tuple(np.random.default_rng(3).choice([-1, 1], size=64))
    sats = [SatelliteSignal(prn=6, doppler_hz=900.0, delay_samples=1500.0,
                            nav_bits=nav_bits),
            SatelliteSignal(prn=13, doppler_hz=-2100.0, delay_samples=222.0,
                            nav_bits=nav_bits)]
    sig = synthesize_signal(cfg, sats, 2050, noise_std=1.0, seed=6)
    ch = assign_channels(cfg, acquire(cfg, sig))
    return cfg, sig, ch


class TestResume:
    def test_split_run_equals_single_run(self, setup):
        cfg, sig, ch = setup
        full = track(cfg, sig, ch, n_ms=400)
        first = track(cfg, sig, ch, n_ms=250)
        second = track(cfg, sig, ch, n_ms=150, state=first.final_state)
        # integer NCO + identical platform => bit-exact continuation
        np.testing.assert_array_equal(
            np.concatenate([first.absolute_sample, second.absolute_sample], axis=1),
            full.absolute_sample)
        np.testing.assert_array_equal(
            np.concatenate([first.i_p, second.i_p], axis=1), full.i_p)
        np.testing.assert_array_equal(
            np.concatenate([first.carr_freq, second.carr_freq], axis=1),
            full.carr_freq)

    def test_state_survives_checkpoint_file(self, setup, tmp_path):
        cfg, sig, ch = setup
        first = track(cfg, sig, ch, n_ms=200)
        path = str(tmp_path / "ck.npz")
        save_tracking(path, first)
        loaded = load_tracking(path)
        assert loaded.final_state is not None
        resumed = track(cfg, sig, ch, n_ms=100, state=loaded.final_state)
        full = track(cfg, sig, ch, n_ms=300)
        np.testing.assert_array_equal(resumed.i_p, full.i_p[:, 200:])


class TestObservability:
    def test_stage_timer_and_trace(self, setup):
        timer = StageTimer()
        with timer.stage("alpha"):
            with trace("inner"):
                sum(range(1000))
        with timer.stage("beta"):
            pass
        assert set(timer.timings_s) == {"alpha", "beta"}
        assert timer.timings_s["alpha"] >= 0
        assert "alpha" in timer.report()

    def test_lock_metrics(self, setup):
        cfg, sig, ch = setup
        # 20 ms of slack lets the estimator align windows to nav-bit edges
        res = track(cfg, sig, ch, n_ms=2040)
        m = lock_metrics(cfg, res, window_ms=1000)
        assert m["cn0_dbhz"].shape == (3, 2)
        active = [c for c in range(3) if ch.status[c] == "T"]
        # strong synthetic signals: high C/N0 and solid phase lock
        assert np.all(m["cn0_dbhz"][active, 1] > 40.0)
        assert np.all(m["pll_lock"][active, 1] > 0.8)
        # Doppler-consistent code rate: offset matches doppler/1540
        for c in active:
            prn_dopp = 900.0 if ch.prn[c] == 6 else -2100.0
            want = prn_dopp / 1540.0
            assert abs(m["code_rate_offset_hz"][c, 1] - want) < 0.3

    def test_lock_metrics_short_input(self, setup):
        cfg, sig, ch = setup
        res = track(cfg, sig, ch, n_ms=50)
        with pytest.raises(ValueError):
            lock_metrics(cfg, res, window_ms=1000)


    def test_lock_metrics_bit_alignment(self, setup):
        """C/N0 must not collapse when tracking starts mid-bit (sums must
        align to nav-bit edges, not tracking start)."""
        cfg, sig, ch = setup
        res = track(cfg, sig, ch, n_ms=2040)
        # drop 10 ms so naive 20-ms blocks straddle every bit edge
        import copy
        shifted = copy.copy(res)
        shifted.i_p = res.i_p[:, 10:]
        shifted.q_p = res.q_p[:, 10:]
        shifted.code_freq = res.code_freq[:, 10:]
        a = lock_metrics(cfg, res, window_ms=1000)
        b = lock_metrics(cfg, shifted, window_ms=1000)
        active = [c for c in range(3) if ch.status[c] == "T"]
        # without bit alignment the straddled sums collapse C/N0 by >10 dB;
        # with it both estimates stay strong (estimator variance ~5 dB)
        assert np.all(a["cn0_dbhz"][active, 0] > 45.0)
        assert np.all(b["cn0_dbhz"][active, 0] > 45.0)
        assert np.all(np.abs(a["cn0_dbhz"][active, 0] - b["cn0_dbhz"][active, 0]) < 8.0)
