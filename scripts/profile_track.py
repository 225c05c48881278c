#!/usr/bin/env python
"""Compare tracking scan variants on the live backend.

Times the full 12-channel tracker at two scan lengths per variant and
reports the marginal per-ms cost ((T_long - T_short)/(n_long - n_short)),
which cancels launch overhead (see memory: axon launch ~27 ms, varies).

Usage: python scripts/profile_track.py [B ...]   (B=1 is the per-ms path)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track.scan import _track_device, initial_state
from softgnss_tpu.track.tables import build_tables, onehot_width

N_CH = 12
N_SHORT, N_LONG = 200, 2000


def make_inputs(config):
    spc = config.samples_per_code
    rng = np.random.default_rng(42)
    prns = list(range(1, N_CH + 1))
    sats = [SatelliteSignal(prn=p,
                            doppler_hz=float(rng.uniform(-4000, 4000)),
                            delay_samples=float(rng.integers(0, spc)),
                            phase0=float(rng.uniform(0, 6.28)),
                            nav_bits=tuple(rng.choice([-1, 1], size=64)))
            for p in prns]
    import contextlib
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        signal = synthesize_signal(config, sats, N_LONG + 3, noise_std=1.0, seed=9)
    channels = Channels(
        prn=np.asarray(prns, np.int64),
        acquired_freq=np.asarray([config.intermediate_freq + s.doppler_hz for s in sats]),
        code_phase=np.asarray([int(s.delay_samples) for s in sats], np.int64),
        status=["T"] * N_CH)
    return signal, channels


def time_variant(config, signal, channels, reps=3):
    tables = build_tables(config, np.asarray(channels.prn),
                          np.asarray(channels.acquired_freq))
    active = np.ones(N_CH, bool)
    state0 = initial_state(config, channels)
    args = (jnp.asarray(signal), jax.tree.map(jnp.asarray, tables),
            jnp.asarray(channels.acquired_freq, jnp.float64), jnp.asarray(active))

    def run(n_ms, st):
        f, ys, ovf = _track_device(config, *args, n_ms, st)
        # block_until_ready alone is not sufficient on the axon tunnel:
        # fetch a value that depends on every step to force execution
        o = int(jnp.asarray(ovf))
        if o:
            raise RuntimeError(f"frame overflow {o}")
        return float(jnp.asarray(ys.i_p[-1]).sum()) + float(f.ptr.sum())

    ts = {}
    for n_ms in (N_SHORT, N_LONG):
        run(n_ms, state0)  # compile
        best = np.inf
        for r in range(reps):
            st = state0._replace(carr_phase=state0.carr_phase + r + 1)
            t0 = time.perf_counter()
            run(n_ms, st)
            best = min(best, time.perf_counter() - t0)
        ts[n_ms] = best
    per_ms = (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)
    return ts, per_ms


def main():
    # each arg is B[,unroll[,margin[,pack]]]
    specs = []
    for a in sys.argv[1:]:
        parts = [int(x) for x in a.split(",")]
        specs.append((parts + [1, 0, 2])[:4])
    specs = specs or [[1, 1, 0, 2], [64, 1, 0, 2]]
    base = sg.default_config(number_of_channels=N_CH)
    signal, channels = make_inputs(base)
    print(f"backend={jax.default_backend()} spc={base.samples_per_code}")
    for b, unroll, margin, pk in specs:
        cfg = base.with_options(track_block_ms=b, track_unroll=unroll,
                                track_frame_margin=margin, track_pack_size=pk)
        w = onehot_width(cfg)
        try:
            ts, per_ms = time_variant(cfg, signal, channels)
        except RuntimeError as e:
            print(f"B={b:4d} u={unroll} m={margin}: {e}")
            continue
        sps = base.samples_per_code / per_ms
        print(f"B={b:4d} u={unroll} m={margin:4d} p={cfg.track_pack} "
              f"win={cfg.track_window} pre={cfg.track_frame_pre} w={w}"
              f"  T{N_SHORT}={ts[N_SHORT]*1e3:7.1f}ms T{N_LONG}={ts[N_LONG]*1e3:7.1f}ms"
              f"  per-ms={per_ms*1e6:7.1f}us  -> {sps/1e6:7.1f} Msps")


if __name__ == "__main__":
    main()
