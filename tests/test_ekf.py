"""EKF navigation filter (nav.ekf, config.nav_filter='ekf').

One kinematic golden capture is tracked once; both filters run on the
same tracking output through the public post_navigate surface, so the
comparisons isolate the navigation filter itself.
"""

import copy

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.nav.solve import post_navigate
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario

N_MS = 37000
V_ENU = (15.0, 8.0, 1.0)


@pytest.fixture(scope="module")
def tracked():
    cfg = sg.fast_config(number_of_channels=5, ms_to_process=N_MS)
    scenario = build_scenario(cfg, n_sats=5, noise_std=1.5,
                              velocity_enu=V_ENU)
    signal = synthesize_scenario(scenario, N_MS + cfg.acquisition_ms + 2)
    results = run_receiver(cfg, signal=signal, navigate=False)
    return cfg, scenario, results.tracking


def _truth_err(scenario, sol):
    epoch_ms = sol.first_epoch_ms + sol._period_ms * np.arange(sol.n_epochs)
    truth = scenario.receiver_ecef_at(scenario.t_rx0 + epoch_ms / 1000.0)
    return np.sqrt((sol.x - truth[0]) ** 2 + (sol.y - truth[1]) ** 2
                   + (sol.z - truth[2]) ** 2)


@pytest.mark.slow
class TestEkfFilter:
    def test_smooths_the_trajectory(self, tracked):
        """Steady-state EKF fixes carry far less epoch-to-epoch jitter
        than per-epoch least squares at comparable accuracy (the white
        code noise integrates out; the systematic ephemeris-quantization
        bias floor is common to both)."""
        cfg, scenario, track = tracked
        sol_ls, _ = post_navigate(cfg, track)
        sol_kf, _ = post_navigate(cfg.with_options(nav_filter="ekf"), track)
        assert sol_ls is not None and sol_kf is not None
        assert sol_kf.nav_filter == "ekf"
        err_ls = _truth_err(scenario, sol_ls)
        err_kf = _truth_err(scenario, sol_kf)
        # the filter spends ~25 epochs averaging away the (unlucky) first
        # cold fix against per-satellite systematic biases; judge steady
        # state on the last third
        tail = slice(2 * sol_kf.n_epochs // 3, None)
        assert np.isfinite(err_kf[tail]).all()
        assert np.nanpercentile(err_kf[tail], 90) < np.nanpercentile(
            err_ls[tail], 90)
        assert np.nanmedian(err_kf[tail]) < 2.0 * np.nanmedian(err_ls[tail])
        # epoch-to-epoch scatter: the white code noise integrates out
        jitter_ls = np.nanstd(np.diff(err_ls[tail]))
        jitter_kf = np.nanstd(np.diff(err_kf[tail]))
        assert jitter_kf < 0.3 * jitter_ls

    def test_velocity_and_lsq_columns(self, tracked):
        cfg, scenario, track = tracked
        sol, _ = post_navigate(cfg.with_options(nav_filter="ekf"), track)
        v = np.stack([sol.vx, sol.vy, sol.vz])
        verr = np.linalg.norm(v - scenario.receiver_vel[:, None], axis=0)
        assert np.nanmedian(verr) < 0.3
        # the per-epoch LS solution rides along for comparison
        assert sol.lsq_x is not None and np.isfinite(sol.lsq_x).sum() > 60
        assert sol.ekf_used is not None
        assert (sol.ekf_used[np.isfinite(sol.x)] >= 1).all()

    def test_inactive_channel_does_not_poison_state(self, tracked):
        """A channel outside the active set carries an infinite travel
        time through nav.solve; the EKF must zero (not merely gain-mask)
        that innovation — 0 * inf = NaN would wipe the whole state.
        Regression: with channels > usable satellites every EKF fix was
        NaN."""
        cfg, scenario, track = tracked
        t2 = copy.copy(track)
        t2.status = list(track.status)
        t2.status[4] = "-"                 # drop to 4 usable satellites
        sol, _ = post_navigate(cfg.with_options(nav_filter="ekf"), t2)
        assert sol is not None
        assert np.isfinite(sol.x).sum() >= 0.9 * sol.n_epochs
        err = _truth_err(scenario, sol)
        assert np.nanmedian(err) < 60.0

    def test_bridges_satellite_outage(self, tracked):
        """Two channels lose lock mid-capture leaving 3 usable satellites:
        least squares produces nothing from that epoch on, the initialized
        EKF keeps solving through the outage with bounded drift."""
        cfg, scenario, track = tracked
        kill_ms = 20000.0
        t2 = copy.copy(track)
        loss = np.full(len(track.prn), np.inf)
        loss[3] = kill_ms
        loss[4] = kill_ms
        t2.lock_loss_ms = loss

        sol_ls, _ = post_navigate(cfg, t2)
        sol_kf, _ = post_navigate(cfg.with_options(nav_filter="ekf"), t2)
        assert sol_ls is not None and sol_kf is not None
        err_kf = _truth_err(scenario, sol_kf)
        epoch_ms = (sol_ls.first_epoch_ms
                    + sol_ls._period_ms * np.arange(sol_ls.n_epochs))
        out = epoch_ms > kill_ms + sol_ls._period_ms
        assert out.sum() >= 10
        # LS cannot fix on 3 satellites ...
        assert not np.isfinite(sol_ls.x[out]).any()
        # ... the EKF can, staying within tens of meters through the outage
        assert np.isfinite(sol_kf.x[out]).all()
        assert (sol_kf.ekf_used[out] <= 3).all()
        assert np.nanmax(err_kf[out]) < 100.0
