"""Kinematic closed loop: a MOVING receiver through the full RF chain.

The reference is static-only (its recordings and the static-position
navSolutions plots, postNavigation.py:307-439).  Here the golden scenario
moves the receiver at constant velocity, so the synthesized delays sweep,
the tracked Doppler carries the receiver's own motion, and both the
per-epoch position fixes and the carrier-Doppler velocity solution must
recover the trajectory — the closed-loop validation of the velocity
output that the static E2E cannot provide.
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario

N_MS = 37000
#: ~61 km/h ground speed, gentle climb — car-like dynamics
V_ENU = (15.0, 8.0, 1.0)


@pytest.fixture(scope="module")
def kinematic_results():
    cfg = sg.fast_config(number_of_channels=5, ms_to_process=N_MS)
    scenario = build_scenario(cfg, n_sats=5, noise_std=1.5,
                              velocity_enu=V_ENU)
    signal = synthesize_scenario(scenario, N_MS + cfg.acquisition_ms + 2)
    results = run_receiver(cfg, signal=signal)
    return cfg, scenario, results


@pytest.mark.slow
class TestKinematic:
    def test_fixes_track_the_trajectory(self, kinematic_results):
        cfg, scenario, results = kinematic_results
        assert results.has_fix
        sol = results.solutions
        ok = np.isfinite(sol.x)
        assert ok.sum() >= 0.9 * sol.n_epochs
        epoch_ms = sol.first_epoch_ms + sol._period_ms * np.arange(sol.n_epochs)
        t_rx = scenario.t_rx0 + epoch_ms / 1000.0
        truth = scenario.receiver_ecef_at(t_rx)          # (3, E)
        err = np.sqrt((sol.x - truth[0]) ** 2 + (sol.y - truth[1]) ** 2
                      + (sol.z - truth[2]) ** 2)
        assert np.nanmedian(err) < 30.0

    def test_trajectory_displacement(self, kinematic_results):
        """The fix track covers the truth displacement (~0.6 km), i.e. the
        receiver really followed the motion rather than averaging it."""
        cfg, scenario, results = kinematic_results
        sol = results.solutions
        ok = np.flatnonzero(np.isfinite(sol.x))
        i, j = ok[0], ok[-1]
        moved = np.sqrt((sol.x[j] - sol.x[i]) ** 2 + (sol.y[j] - sol.y[i]) ** 2
                        + (sol.z[j] - sol.z[i]) ** 2)
        dt = (j - i) * sol._period_ms / 1000.0
        v_truth = np.linalg.norm(scenario.receiver_vel)
        assert moved == pytest.approx(v_truth * dt, rel=0.05)

    def test_velocity_solution_matches_truth(self, kinematic_results):
        cfg, scenario, results = kinematic_results
        sol = results.solutions
        v = np.stack([sol.vx, sol.vy, sol.vz])           # (3, E)
        ok = np.isfinite(v).all(axis=0)
        assert ok.sum() >= 0.9 * sol.n_epochs
        verr = np.linalg.norm(v[:, ok] - scenario.receiver_vel[:, None], axis=0)
        # static-receiver budget is ~4 cm/s; allow PLL dynamics margin
        assert np.median(verr) < 0.5
        speed = np.linalg.norm(v[:, ok], axis=0)
        assert np.median(speed) == pytest.approx(
            np.linalg.norm(scenario.receiver_vel), abs=0.5)

    def test_raim_quiet_during_clean_kinematics(self, kinematic_results):
        """Receiver motion must not read as a pseudorange fault."""
        cfg, scenario, results = kinematic_results
        sol = results.solutions
        assert np.all(sol.raim_flag == 0)
