"""Sweep megakernel block size / chunk span on the reference workload."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track.scan import _track_device, initial_state
from softgnss_tpu.track.tables import build_tables

n_ch = int(os.environ.get("CH", "12"))
n_ms = int(os.environ.get("MS", "2000"))
rng = np.random.default_rng(42)
prns = list(range(1, n_ch + 1))


def bench(block_ms, k_tiles):
    config = sg.default_config(
        number_of_channels=n_ch, correlator_impl="megakernel",
        track_block_ms=block_ms, pallas_k_tiles=k_tiles)
    spc = config.samples_per_code
    sats = [SatelliteSignal(prn=p, doppler_hz=float(rng.uniform(-4000, 4000)),
                            delay_samples=float(rng.integers(0, spc)),
                            phase0=float(rng.uniform(0, 6.28)))
            for p in prns]
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
        status=["T"] * n_ch)
    tables = build_tables(config, np.asarray(prns), np.asarray(channels.acquired_freq))
    state0 = initial_state(config, channels)
    n = signal.shape[0] // 4 * 4
    sigp = np.ascontiguousarray(np.asarray(signal)[:n]).view(np.int32)
    args = (jnp.asarray(sigp), jax.tree.map(jnp.asarray, tables),
            jnp.asarray(channels.acquired_freq, jnp.float64),
            jnp.asarray(np.ones(n_ch, bool)))

    def run(length, st):
        final, ys, _ovf = _track_device(config, *args, length, st, 0)
        return float(jnp.asarray(ys.i_p[-1]).sum()) + float(final.ptr.sum())

    n_short = max(256, n_ms // 8)
    times = {}
    for length in (n_short, n_ms):
        run(length, state0)
        best = np.inf
        for r in range(3):
            st = state0._replace(carr_phase=state0.carr_phase + r + 1)
            t0 = time.perf_counter()
            run(length, st)
            best = min(best, time.perf_counter() - t0)
        times[length] = best
    step = (times[n_ms] - times[n_short]) / (n_ms - n_short)
    print(f"block_ms={block_ms:4d} k_tiles={k_tiles:3d}: "
          f"{step*1e6:6.2f} us/step  {spc/step/1e9:.3f} Gsps", flush=True)


for block_ms, k_tiles in [(64, 38), (64, 76), (128, 38), (128, 76),
                          (256, 76), (64, 19)]:
    try:
        bench(block_ms, k_tiles)
    except Exception as e:
        print(f"block_ms={block_ms} k_tiles={k_tiles}: FAIL {str(e)[:120]}",
              flush=True)
