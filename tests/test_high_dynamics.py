"""High-dynamics closed loop: an ACCELERATING receiver (1.5 g).

The reference's recordings are static; the round-2 kinematic test covers
constant velocity.  Here the receiver accelerates at 15 m/s^2 for the
whole 37 s capture (0 -> ~555 m/s, carrier Doppler sweeping ~80 Hz/s and
~2.9 kHz total), exercising: the tracking loops' dynamic range, the
Doppler-consistent pseudorange chain on a curved trajectory, and the
EKF's process-noise handling under sustained model mismatch.
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.nav.solve import post_navigate
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario

N_MS = 37000
ACCEL_ENU = (10.0, 11.0, 0.0)   # ~1.5 g horizontal


@pytest.fixture(scope="module")
def dynamic_run():
    cfg = sg.fast_config(number_of_channels=5, ms_to_process=N_MS)
    scenario = build_scenario(cfg, n_sats=5, noise_std=1.5,
                              velocity_enu=(5.0, -3.0, 0.0),
                              accel_enu=ACCEL_ENU)
    signal = synthesize_scenario(scenario, N_MS + cfg.acquisition_ms + 2)
    results = run_receiver(cfg, signal=signal, navigate=False)
    return cfg, scenario, results.tracking


@pytest.mark.slow
class TestHighDynamics:
    def test_tracking_holds_through_the_sweep(self, dynamic_run):
        cfg, scenario, track = dynamic_run
        tail = slice(-2000, None)
        i_p = np.abs(np.asarray(track.i_p)[:, tail]).mean(axis=1)
        q_p = np.abs(np.asarray(track.q_p)[:, tail]).mean(axis=1)
        active = [i for i, s in enumerate(track.status) if s == "T"]
        assert (i_p[active] / q_p[active] > 5.0).all()
        # the tracked carrier really swept: the acceleration projects
        # onto each line of sight differently (some are nearly
        # perpendicular), but the best-aligned channel moves by > 1.5 kHz
        cf = np.asarray(track.carr_freq)
        sweep = np.abs(cf[active, -100:].mean(axis=1)
                       - cf[active, :100].mean(axis=1))
        assert sweep.max() > 1500.0, sweep

    def test_fixes_follow_the_curved_trajectory(self, dynamic_run):
        cfg, scenario, track = dynamic_run
        sol, _ = post_navigate(cfg, track)
        assert sol is not None
        epoch_ms = sol.first_epoch_ms + sol._period_ms * np.arange(sol.n_epochs)
        t_rx = scenario.t_rx0 + epoch_ms / 1000.0
        truth = scenario.receiver_ecef_at(t_rx)
        err = np.sqrt((sol.x - truth[0]) ** 2 + (sol.y - truth[1]) ** 2
                      + (sol.z - truth[2]) ** 2)
        assert np.isfinite(err).sum() >= 0.9 * sol.n_epochs
        assert np.nanmedian(err) < 30.0
        # the trajectory is genuinely curved: a straight line fitted to
        # the truth track misses it by >> the fix error
        disp = truth - truth[:, :1]
        line = disp[:, -1:] * (epoch_ms - epoch_ms[0])[None, :] / (
            epoch_ms[-1] - epoch_ms[0])
        assert np.max(np.linalg.norm(disp - line, axis=0)) > 500.0

    def test_ekf_tracks_the_velocity_ramp(self, dynamic_run):
        cfg, scenario, track = dynamic_run
        sol, _ = post_navigate(
            cfg.with_options(nav_filter="ekf", ekf_accel_psd=50.0), track)
        assert sol is not None
        epoch_ms = sol.first_epoch_ms + sol._period_ms * np.arange(sol.n_epochs)
        t_rx = scenario.t_rx0 + epoch_ms / 1000.0
        v_truth = scenario.receiver_vel_at(t_rx)               # (3, E)
        v_est = np.stack([sol.vx, sol.vy, sol.vz])
        verr = np.linalg.norm(v_est - v_truth, axis=0)
        tail = slice(sol.n_epochs // 3, None)
        assert np.nanmedian(verr[tail]) < 2.0, np.nanmedian(verr[tail])
        # and the positions stay bounded through the maneuver
        truth = scenario.receiver_ecef_at(t_rx)
        err = np.sqrt((sol.x - truth[0]) ** 2 + (sol.y - truth[1]) ** 2
                      + (sol.z - truth[2]) ** 2)
        assert np.nanmedian(err[tail]) < 40.0
