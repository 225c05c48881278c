"""jax.profiler device-op breakdown of one tracking call (megakernel path)."""
import os, sys, glob, gzip, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track.scan import _track_device, initial_state, host_pack_signal
from softgnss_tpu.track.tables import build_tables

cfg = sg.default_config(number_of_channels=12, correlator_impl='megakernel')
spc = cfg.samples_per_code
rng = np.random.default_rng(42)
prns = list(range(1, 13))
sats = [SatelliteSignal(prn=p, doppler_hz=float(rng.uniform(-4000, 4000)),
                        delay_samples=float(rng.integers(0, spc)))
        for p in prns]
with jax.default_device(jax.devices('cpu')[0]):
    signal = synthesize_signal(cfg, sats, 1027, noise_std=1.0, seed=9)
channels = Channels(prn=np.asarray(prns, np.int64),
                    acquired_freq=np.asarray([cfg.intermediate_freq + s.doppler_hz for s in sats]),
                    code_phase=np.asarray([int(s.delay_samples) for s in sats], np.int64),
                    status=['T']*12)
tables = build_tables(cfg, np.asarray(prns), np.asarray(channels.acquired_freq))
st = initial_state(cfg, channels)
sig_dev = jnp.asarray(host_pack_signal(cfg, signal))
args = (sig_dev, jax.tree.map(jnp.asarray, tables),
        jnp.asarray(channels.acquired_freq, jnp.float64), jnp.asarray([True]*12))

def run():
    final, ys, _ = _track_device(cfg, *args, 1024, st, 0)
    return jax.block_until_ready((ys.i_p, final.ptr))

run()
out = '/tmp/glue_trace'
with jax.profiler.trace(out):
    run()
# parse the trace proto for device op durations
import json
files = glob.glob(out + '/**/*.trace.json.gz', recursive=True)
print('trace files:', files)
ev = []
for f in files:
    with gzip.open(f, 'rt') as fh:
        d = json.load(fh)
    for e in d.get('traceEvents', []):
        if e.get('ph') == 'X' and 'dur' in e:
            ev.append((e.get('pid'), e.get('name', ''), e['dur']))
import collections
agg = collections.Counter()
for pid, name, dur in ev:
    agg[name] += dur
for name, tot in agg.most_common(28):
    print(f'{tot/1024:9.3f} us/ms  {name[:100]}')
