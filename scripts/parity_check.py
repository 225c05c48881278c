import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track import track
import jax
C = int(sys.argv[1]) if len(sys.argv) > 1 else 3
cfg = sg.default_config(number_of_channels=C, track_block_ms=64)
rng = np.random.default_rng(7)
prns = list(range(1, C + 1))
dops = [float(rng.uniform(-4000, 4000)) for _ in prns]
phs = [int(rng.integers(0, cfg.samples_per_code)) for _ in prns]
sats = [SatelliteSignal(prn=p, doppler_hz=d, delay_samples=float(s),
                        nav_bits=tuple(rng.choice([-1,1], size=8)))
        for p, d, s in zip(prns, dops, phs)]
with jax.default_device(jax.devices('cpu')[0]):
    signal = synthesize_signal(cfg, sats, 100, noise_std=0.8, seed=4)
channels = Channels(prn=np.asarray(prns),
                    acquired_freq=np.asarray([cfg.intermediate_freq + d for d in dops]),
                    code_phase=np.asarray(phs, np.int64),
                    status=['T']*C)
res_oh = track(cfg.with_options(correlator_impl='onehot'), signal, channels, n_ms=96)
res_mk = track(cfg.with_options(correlator_impl='megakernel'), signal, channels, n_ms=96)
as_eq = np.array_equal(np.asarray(res_oh.absolute_sample), np.asarray(res_mk.absolute_sample))
worst = 0; per_ch = None
for f in ('i_p','i_e','i_l','q_e','q_p','q_l'):
    a = np.asarray(getattr(res_oh, f), np.float64); b = np.asarray(getattr(res_mk, f), np.float64)
    worst = max(worst, np.sqrt(np.mean((a-b)**2)) / np.sqrt(np.mean(a**2)))
a = np.asarray(res_oh.i_p, np.float64); b = np.asarray(res_mk.i_p, np.float64)
chrms = [float(np.sqrt(np.mean((a[c]-b[c])**2))/max(1e-9, np.sqrt(np.mean(a[c]**2)))) for c in range(C)]
print(f'C={C}: abs_sample_equal={as_eq} worst_rms={worst:.2e} per-ch i_p rms=' +
      ' '.join('%.0e' % x for x in chrms))
