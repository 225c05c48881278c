#!/usr/bin/env python
"""Capture a jax.profiler trace of the tracking step and summarize op costs."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track.scan import _track_device, initial_state
from softgnss_tpu.track.tables import build_tables

N_CH = 12

cfg = sg.default_config(number_of_channels=N_CH).with_options(
    track_block_ms=int(os.environ.get("B", "64")),
    track_unroll=int(os.environ.get("U", "1")))
spc = cfg.samples_per_code
rng = np.random.default_rng(42)
prns = list(range(1, N_CH + 1))
sats = [SatelliteSignal(prn=p, doppler_hz=float(rng.uniform(-4000, 4000)),
                        delay_samples=float(rng.integers(0, spc)),
                        nav_bits=tuple(rng.choice([-1, 1], size=64)))
        for p in prns]
import contextlib
try:
    cpu = jax.devices("cpu")[0]
except RuntimeError:
    cpu = None
ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
with ctx:
    signal = synthesize_signal(cfg, sats, 403, noise_std=1.0, seed=9)
channels = Channels(prn=np.asarray(prns, np.int64),
                    acquired_freq=np.asarray([cfg.intermediate_freq + s.doppler_hz for s in sats]),
                    code_phase=np.asarray([int(s.delay_samples) for s in sats], np.int64),
                    status=["T"] * N_CH)
tables = build_tables(cfg, np.asarray(prns), np.asarray(channels.acquired_freq))
state0 = initial_state(cfg, channels)
from softgnss_tpu.track.scan import host_pack_signal

args = (jnp.asarray(host_pack_signal(cfg, signal)),
        jax.tree.map(jnp.asarray, tables),
        jnp.asarray(channels.acquired_freq, jnp.float64),
        jnp.asarray(np.ones(N_CH, bool)))

N_MS = 400


def run(st):
    f, ys, _ = _track_device(cfg, *args, N_MS, st)
    return float(jnp.asarray(ys.i_p[-1]).sum()) + float(f.ptr.sum())


run(state0)  # compile
outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    run(state0._replace(carr_phase=state0.carr_phase + 1))

files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if not files:
    sys.exit(0)
with gzip.open(files[0], "rt") as f:
    data = json.load(f)
ev = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
# find device lanes (TensorFlow Op / XLA Op lanes)
by_name = defaultdict(float)
cnt = defaultdict(int)
pid_names = {e["pid"]: e["args"].get("name", "") for e in data.get("traceEvents", [])
             if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
for e in ev:
    pn = pid_names.get(e["pid"], "")
    if "TPU" in pn or "tpu" in pn or "/device" in pn.lower():
        by_name[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
print("process lanes:", set(pid_names.values()))
tot = sum(by_name.values())
print(f"total device op time: {tot/1e3:.2f} ms over {N_MS} ms-steps")
for name, d in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{d/1e3:9.2f} ms  n={cnt[name]:6d}  {d/max(cnt[name],1):7.1f}us/call  {name[:110]}")
