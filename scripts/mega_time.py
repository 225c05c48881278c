"""Tight timing of the megakernel call and the full tracking step."""
import functools
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
from softgnss_tpu.track.megakernel import (_mega_call, _pad_rows,
                                           mega_c_pad, mega_rows)
from softgnss_tpu.track.scan import _track_device, initial_state
from softgnss_tpu.track.tables import build_tables, mega_split, mega_window

cfg = sg.default_config(number_of_channels=int(os.environ.get("CH", "12")),
                        correlator_impl="megakernel",
                        track_block_ms=int(os.environ.get("BMS", "64")),
                        pallas_k_tiles=int(os.environ.get("KT", "0")))
C = cfg.number_of_channels
C8 = max(8, (C + 7) // 8 * 8)
B = cfg.track_block_ms
spc = cfg.samples_per_code
win = mega_window(cfg)

prns = np.arange(1, C + 1)
freqs = cfg.intermediate_freq + np.linspace(-3000, 3000, C)
tables = build_tables(cfg, prns, freqs)
tabs = jnp.asarray(tables.mega_tabs)
hb0 = jnp.asarray(tables.mega_hb0)
rng = np.random.default_rng(0)
CP = mega_c_pad(C)
RP = mega_rows(cfg, C)
frames = jnp.asarray(rng.integers(-2**30, 2**30,
                                  (B, RP, win // 4 // mega_split(cfg)),
                                  np.int64).astype(np.int32))
tabs = _pad_rows(tabs, RP)
hb0 = _pad_rows(hb0, CP)
ci = jnp.zeros((CP, 8), jnp.int32).at[:C, 1].set(1).at[:, 0].set(123456789)
sf = jnp.zeros((CP, 16), jnp.float32)
si = jnp.zeros((CP, 16), jnp.int32).at[:, 0].set(60).at[:, 4].set(4000)


@functools.partial(jax.jit, static_argnums=(1,))
def kloop(sf_, n):
    def step(carry, _):
        ys, sfo, sio = _mega_call(cfg, B, C, frames, tabs, hb0, ci,
                                  carry + sf_ * 0, si)
        return carry + sfo * 1e-9, ys[0, 0, 0]
    c, ys = jax.lax.scan(step, jnp.zeros((CP, 16), jnp.float32), None, length=n)
    return ys.sum() + c.sum()


times = {}
for n in (4, 16):
    kloop(sf, n).block_until_ready()
    best = np.inf
    for r in range(6):
        t0 = time.perf_counter()
        kloop(sf + r * 1e-6, n).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    times[n] = best
per_ms = (times[16] - times[4]) / (12 * B)
print(f"kernel : {per_ms*1e6:6.2f} us/ms", flush=True)

# full step
n_ms = int(os.environ.get("MS", "1024"))
sats = [SatelliteSignal(prn=int(p), doppler_hz=float(rng.uniform(-4000, 4000)),
                        delay_samples=float(rng.integers(0, spc)))
        for p in prns]
import contextlib
try:
    cpu = jax.devices("cpu")[0]
except RuntimeError:
    cpu = None
with (jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()):
    signal = synthesize_signal(cfg, sats, n_ms + 3, noise_std=1.0, seed=9)
channels = Channels(prn=prns.astype(np.int64),
                    acquired_freq=np.asarray(freqs),
                    code_phase=np.asarray([int(s.delay_samples) for s in sats],
                                          np.int64),
                    status=["T"] * C)
state0 = initial_state(cfg, channels)
_n = signal.shape[0] // 4 * 4
sigp = np.ascontiguousarray(np.asarray(signal)[:_n]).view(np.int32)
args = (jnp.asarray(sigp), jax.tree.map(jnp.asarray, tables),
        jnp.asarray(freqs, jnp.float64), jnp.asarray(np.ones(C, bool)))


def run(length, st):
    final, ys, _ = _track_device(cfg, *args, length, st, 0)
    return float(jnp.asarray(ys.i_p[-1]).sum()) + float(final.ptr.sum())


times = {}
for length in (256, n_ms):
    run(length, state0)
    best = np.inf
    for r in range(6):
        st = state0._replace(carr_phase=state0.carr_phase + r + 1)
        t0 = time.perf_counter()
        run(length, st)
        best = min(best, time.perf_counter() - t0)
    times[length] = best
step = (times[n_ms] - times[256]) / (n_ms - 256)
print(f"step   : {step*1e6:6.2f} us/ms  ({spc/step/1e9:.3f} Gsps)", flush=True)
