#!/usr/bin/env python
"""Headline benchmark: 12-channel tracking throughput (capture samples/s).

Set BENCH_METRIC=acquisition for the acquisition-search metric instead
(correlation points/s over the full 32-PRN x Doppler x code-phase grid).

Workload per BASELINE.md ("12-channel parallel tracking"): the reference
default front end (fs = 38.192 MHz int8, IF 9.548 MHz), 12 channels of
DLL/PLL tracking with 1 ms integration.  The metric is capture samples
consumed per wall-clock second by the full 12-channel tracker (each sample
feeds 12 channels x 6 correlators).

``vs_baseline`` compares against the math-equivalent float64 NumPy oracle
(softgnss_tpu.oracle) measured in-process on the CPU — the reference
publishes no numbers (SURVEY.md §6), so the baseline is self-measured.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def bench_acquisition() -> None:
    import jax
    import jax.numpy as jnp

    import softgnss_tpu as sg
    from softgnss_tpu.acquire.search import _acquire_device
    from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal

    import contextlib

    config = sg.default_config()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        sig = synthesize_signal(
            config, [SatelliteSignal(prn=7, doppler_hz=2500.0,
                                     delay_samples=12345.0)],
            config.acquisition_ms + 1, noise_std=1.5, seed=3)
    need = config.acquisition_ms * config.samples_per_code
    sigs = [jnp.asarray(np.concatenate([sig[:need - 1], np.array([r], np.int8)]))
            for r in range(4)]
    out = _acquire_device(config, sigs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(1, 4):
        out = _acquire_device(config, sigs[r])
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    n_corr = 32 * config.num_doppler_bins * config.samples_per_code
    # oracle: measured in-process on one PRN, scaled to 32
    from softgnss_tpu.oracle import oracle_acquire_grid

    t0 = time.perf_counter()
    oracle_acquire_grid(config, np.asarray(sig), 7)
    t_oracle = (time.perf_counter() - t0) * 32
    print(json.dumps({
        "metric": "acquisition_corr_points_per_sec_32prn_fs38.192MHz",
        "value": round(n_corr / dt, 1),
        "unit": "corr-points/s",
        "vs_baseline": round((n_corr / dt) / (n_corr / t_oracle), 2),
    }))


def main() -> None:
    import jax

    if os.environ.get("BENCH_METRIC", "tracking") == "acquisition":
        bench_acquisition()
        return

    import softgnss_tpu as sg
    from softgnss_tpu.acquire.search import Channels
    from softgnss_tpu.oracle import oracle_track_channel
    from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
    from softgnss_tpu.track import track
    from softgnss_tpu.track.scan import _track_device, initial_state
    import jax.numpy as jnp

    n_channels = int(os.environ.get("BENCH_CHANNELS", "12"))
    n_ms = int(os.environ.get("BENCH_MS", "8000"))
    oracle_ms = int(os.environ.get("BENCH_ORACLE_MS", "40"))

    config = sg.default_config(
        number_of_channels=n_channels,
        correlator_impl=os.environ.get("BENCH_IMPL", "auto"),
        pallas_contraction=os.environ.get("BENCH_CONTRACTION", "mxu"))
    spc = config.samples_per_code
    rng = np.random.default_rng(42)

    prns = list(range(1, n_channels + 1))
    sats = [SatelliteSignal(prn=p,
                            doppler_hz=float(rng.uniform(-4000, 4000)),
                            delay_samples=float(rng.integers(0, spc)),
                            phase0=float(rng.uniform(0, 6.28)),
                            nav_bits=tuple(rng.choice([-1, 1], size=64)))
            for p in prns]
    # synthesize on the host CPU backend: not the benchmarked path
    import contextlib

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        signal = synthesize_signal(config, sats, n_ms + 3, noise_std=1.0, seed=9)

    channels = Channels(
        prn=np.asarray(prns, np.int64),
        acquired_freq=np.asarray([config.intermediate_freq + s.doppler_hz for s in sats]),
        code_phase=np.asarray([int(s.delay_samples) for s in sats], np.int64),
        status=["T"] * n_channels)

    # --- device timing ------------------------------------------------------
    # Marginal cost per tracked millisecond: time the tracker at two scan
    # lengths and take (T_long - T_short)/(n_long - n_short), best of
    # ``reps`` runs each.  This cancels the per-launch overhead of the
    # remote-device tunnel (~tens of ms, varying with congestion), which
    # would otherwise dominate the metric.  Each run fetches a value that
    # depends on every step — block_until_ready alone does not force
    # execution on remote backends.
    from softgnss_tpu.track.tables import build_tables

    tables = build_tables(config, np.asarray(prns), np.asarray(channels.acquired_freq))
    active = np.ones(n_channels, bool)
    state0 = initial_state(config, channels)
    # ship the capture pre-packed, as track() does (host view is free)
    from softgnss_tpu.track.scan import host_pack_signal

    sig_dev = jnp.asarray(host_pack_signal(config, signal))
    args = (sig_dev, jax.tree.map(jnp.asarray, tables),
            jnp.asarray(channels.acquired_freq, jnp.float64), jnp.asarray(active))
    if n_ms < 100:
        raise SystemExit(f"BENCH_MS must be >= 100 for marginal-cost timing, got {n_ms}")
    n_short = min(max(200, n_ms // 8), n_ms // 2)

    def run(length, st):
        final, ys, _ovf = _track_device(config, *args, length, st, 0)
        return float(jnp.asarray(ys.i_p[-1]).sum()) + float(final.ptr.sum())

    reps = 5
    times = {}
    for length in (n_short, n_ms):
        assert np.isfinite(run(length, state0))          # compile + warm
        samples = []
        for r in range(reps):
            # vary an input per repetition: the runtime may serve repeated
            # identical launches from a cache, faking multi-Gsps numbers
            st = state0._replace(carr_phase=state0.carr_phase + r + 1)
            t0 = time.perf_counter()
            run(length, st)
            samples.append(time.perf_counter() - t0)
        # MEDIAN, not best-of: the remote-tunnel launch overhead has
        # +-10 ms variance, comparable to the marginal compute signal at
        # short lengths; best-of biases the difference arbitrarily
        times[length] = float(np.median(samples))
    step_s = (times[n_ms] - times[n_short]) / (n_ms - n_short)
    device_sps = spc / step_s

    # --- CPU oracle baseline (single channel, scaled to n_channels) --------
    t0 = time.perf_counter()
    oracle_track_channel(config, signal, prns[0],
                         float(channels.acquired_freq[0]),
                         int(channels.code_phase[0]), oracle_ms)
    t_oracle_1ch = time.perf_counter() - t0
    oracle_sps = (oracle_ms * spc) / (t_oracle_1ch * n_channels)

    # roofline context: tracking is VPU-bound (the MXU is essentially
    # idle), so "fraction of chip FLOPs" is the wrong lens; step time vs
    # the VPU op floor is the honest one.  Per-sample op counts by
    # correlator: the one-hot contraction does ~3*onehot_width
    # compare/select/adds plus the ~30-op baseband mix; the round-5
    # megakernel does ~53 ops/sample (unpack 3, mask 5, angle-addition
    # carrier rotation off the shared per-ms lane table 6, baseband 4,
    # shared-product Q40 digit ramp 7, table funnel+clamp 7, three
    # select/accumulate tap pairs 18, ~3 amortized shared-table build),
    # with ZERO padded rows (tables.mega_split packs 2C channel rows),
    # so its floor is LOWER than earlier rounds' and utilization reads
    # honestly worse.
    from softgnss_tpu.track.tables import mega_window, onehot_width

    if config.resolved_correlator == "megakernel":
        ops_per_sample = 53
        vpu_ops = mega_window(config) * ops_per_sample * n_channels
    else:
        ops_per_sample = 3 * onehot_width(config) + 30
        vpu_ops = config.track_window * ops_per_sample * n_channels
    floor_s = vpu_ops / 4e12

    print(json.dumps({
        "metric": f"tracking_samples_per_sec_{n_channels}ch_fs38.192MHz",
        "value": round(device_sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(device_sps / oracle_sps, 2),
        "step_time_us": round(step_s * 1e6, 2),
        "vpu_floor_us": round(floor_s * 1e6, 2),
        "approx_vpu_util": round(floor_s / step_s, 3),
    }))


if __name__ == "__main__":
    main()
