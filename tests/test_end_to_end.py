"""Full closed-loop end-to-end: golden scenario RF samples -> position fix.

Synthesizes a geometry-consistent 38-second int8 IF capture from circular
satellite orbits and real encoded nav subframes, then runs the complete
receiver (acquire -> track -> navigate) and checks the PVT solution
against the injected receiver position.  This is the framework's
"minimum end-to-end slice" milestone test (SURVEY.md §7 step 5).

Position error budget at the fast config (fs = 4.096 MHz): pseudoranges
use the Q40 code NCO's sub-sample boundary fraction (nav/solve.py), so
the c/fs = 73 m integer-sample quantization of the reference's fid.tell()
counters drops out and the fix is DLL-noise-limited (a few meters,
chip length 293 m x tracking jitter ~1e-2 chip, diluted by geometry).
"""

import numpy as np
import pytest

import softgnss_tpu as sg
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario

N_MS = 37000


@pytest.fixture(scope="module")
def e2e_results():
    cfg = sg.fast_config(number_of_channels=5, ms_to_process=N_MS)
    scenario = build_scenario(cfg, n_sats=5, noise_std=1.5)
    signal = synthesize_scenario(scenario, N_MS + cfg.acquisition_ms + 2)
    results = run_receiver(cfg, signal=signal)
    return cfg, scenario, results


@pytest.mark.slow
class TestEndToEnd:
    def test_all_satellites_acquired(self, e2e_results):
        cfg, scenario, results = e2e_results
        acq = results.acquisition
        for i, prn in enumerate(scenario.prns):
            assert acq.acquired[prn - 1], f"PRN {prn} not acquired"
            assert abs(acq.code_phase[prn - 1] - scenario.expected_code_phase(i)) <= 1.5
            assert abs(acq.carr_freq[prn - 1] - scenario.expected_carrier_freq(i)) < 20.0

    def test_tracking_locked(self, e2e_results):
        cfg, scenario, results = e2e_results
        tr = results.tracking
        for c in range(len(tr.prn)):
            if tr.status[c] == "-":
                continue
            ip = np.abs(tr.i_p[c, 2000:]).mean()
            qp = np.abs(tr.q_p[c, 2000:]).mean()
            assert ip / qp > 4.0, f"channel {c} not phase locked"

    def test_ephemeris_decoded(self, e2e_results):
        cfg, scenario, results = e2e_results
        for i, prn in enumerate(scenario.prns):
            eph = results.ephemerides[prn - 1]
            assert eph is not None and eph.complete, f"PRN {prn} ephemeris missing"
            truth = scenario.ephemerides[i]
            assert eph.sqrt_a == pytest.approx(truth.sqrt_a, abs=2.0**-19)
            assert eph.t_oe == truth.t_oe
            assert eph.iode_sf2 == truth.iode_sf2

    def test_position_fix_matches_truth(self, e2e_results):
        cfg, scenario, results = e2e_results
        assert results.has_fix
        sol = results.solutions
        assert sol.tow == scenario.tow_count * 6
        rx = scenario.receiver_ecef
        ok = np.isfinite(sol.x)
        assert ok.sum() >= 0.9 * sol.n_epochs
        err = np.sqrt((sol.x[ok] - rx[0]) ** 2 + (sol.y[ok] - rx[1]) ** 2
                      + (sol.z[ok] - rx[2]) ** 2)
        # DLL-jitter-limited (measured ~5 m median at this seed/noise)
        assert np.median(err) < 30.0
        assert np.mean(err) < 40.0
        # height/lat/lon sanity vs injected 47N 8.5E 500m
        assert np.nanmedian(np.abs(sol.latitude - 47.0)) < 0.01
        assert np.nanmedian(np.abs(sol.longitude - 8.5)) < 0.01

    def test_velocity_solution(self, e2e_results):
        """Static-receiver velocity from tracked carrier Doppler: bounded
        by PLL frequency noise x DOP."""
        cfg, scenario, results = e2e_results
        sol = results.solutions
        v = np.sqrt(sol.vx**2 + sol.vy**2 + sol.vz**2)
        ok = np.isfinite(v)
        assert ok.sum() >= 0.9 * sol.n_epochs
        assert np.median(v[ok]) < 0.3             # m/s (measured ~0.04)

    def test_dop_and_elevations_reported(self, e2e_results):
        cfg, scenario, results = e2e_results
        sol = results.solutions
        ok = np.isfinite(sol.x)
        assert np.all(sol.dop[0][ok] > 0)
        el = sol.el[np.isfinite(sol.el)]
        assert np.all(el >= cfg.elevation_mask_deg - 1.0)

    def test_unhealthy_satellite_excluded(self, e2e_results):
        """A satellite broadcasting a nonzero SV health word is excluded
        from navigation (the reference decodes health but never checks
        it); the fix survives on the remaining satellites."""
        cfg, scenario, results = e2e_results
        import copy

        sc2 = copy.copy(scenario)
        sc2.ephemerides = [copy.copy(e) for e in scenario.ephemerides]
        sick = sc2.prns[0]
        sc2.ephemerides[0].health = 1
        sig = synthesize_scenario(sc2, N_MS + cfg.acquisition_ms + 2)
        res = run_receiver(cfg, signal=sig)
        assert res.has_fix
        # the unhealthy PRN never appears in any epoch's used-satellite set
        assert not (res.solutions.prn == sick).any()
        err = np.linalg.norm(
            np.stack([res.solutions.x, res.solutions.y, res.solutions.z], 1)
            - np.asarray(sc2.receiver_ecef), axis=1)
        assert np.nanmedian(err) < 30.0

    def test_satellite_killed_mid_capture_fix_survives(self, e2e_results):
        """Kill one satellite's signal at 33 s (amplitude envelope): the
        lock detector must demote its channel ('L', loss near the kill),
        navigation must exclude it from later epochs, and the fix must
        survive on the remaining four satellites.  The reference keeps a
        dead channel in the solution forever (tracking.py:253-275 never
        reacts to lock loss)."""
        import dataclasses

        cfg, scenario, results = e2e_results
        kill_ms = 33000
        n_sig = N_MS + cfg.acquisition_ms + 2
        env = np.ones((len(scenario.prns), n_sig), np.float32)
        env[-1, kill_ms:] = 0.0
        sc2 = dataclasses.replace(scenario, amplitude_ms=env)
        sig = synthesize_scenario(sc2, n_sig)
        res = run_receiver(cfg, signal=sig, channels=results.channels)

        tr = res.tracking
        ch = int(np.flatnonzero(tr.prn == scenario.prns[-1])[0])
        assert tr.status[ch] == "L"
        assert kill_ms - cfg.lock_window_ms <= tr.lock_loss_ms[ch] \
            <= kill_ms + 2 * cfg.lock_window_ms
        for c in range(len(tr.prn)):
            if c != ch and tr.status[c] != "-":
                assert np.isinf(tr.lock_loss_ms[c])

        assert res.has_fix
        sol = res.solutions
        rx = scenario.receiver_ecef
        ok = np.isfinite(sol.x)
        assert ok.sum() >= 0.9 * sol.n_epochs
        err = np.sqrt((sol.x[ok] - rx[0]) ** 2 + (sol.y[ok] - rx[1]) ** 2
                      + (sol.z[ok] - rx[2]) ** 2)
        assert np.median(err) < 30.0
        # epochs at/after the kill: demoted channel excluded, fix survives
        # on the remaining 4 satellites
        ms_idx = sol.first_subframe[ch] + cfg.nav_sol_period_ms * np.arange(sol.n_epochs)
        late = np.flatnonzero(ms_idx >= tr.lock_loss_ms[ch])
        assert late.size >= 3
        assert np.all(np.isnan(sol.el[ch, late]))
        late_ok = np.isfinite(sol.x[late])
        assert late_ok.mean() >= 0.8
        late_err = np.sqrt((sol.x[late][late_ok] - rx[0]) ** 2
                           + (sol.y[late][late_ok] - rx[1]) ** 2
                           + (sol.z[late][late_ok] - rx[2]) ** 2)
        assert np.median(late_err) < 100.0

    def test_time_sharded_tracking_feeds_navigation(self, e2e_results):
        """Sequence-parallel tracking (2 time blocks x warm-up re-lock +
        polarity reconciliation) must produce observables the navigation
        stage decodes to the same fix quality as the sequential run."""
        from softgnss_tpu.nav.solve import post_navigate
        from softgnss_tpu.parallel import receiver_mesh, track_time_sharded

        cfg, scenario, results = e2e_results
        sig = synthesize_scenario(scenario, N_MS + cfg.acquisition_ms + 2)
        mesh = receiver_mesh(cfg, n_time=2, n_channel=4)
        tr = track_time_sharded(cfg, sig, results.channels, mesh, n_ms=N_MS)
        sol, ephs = post_navigate(cfg, tr)
        assert sol is not None
        rx = scenario.receiver_ecef
        ok = np.isfinite(sol.x)
        assert ok.sum() >= 0.9 * sol.n_epochs
        err = np.sqrt((sol.x[ok] - rx[0]) ** 2 + (sol.y[ok] - rx[1]) ** 2
                      + (sol.z[ok] - rx[2]) ** 2)
        assert np.median(err) < 60.0
