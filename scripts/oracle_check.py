import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track import track
from softgnss_tpu.oracle import oracle_track_channel
import jax

cfg = sg.default_config(number_of_channels=3, track_block_ms=64)
rng = np.random.default_rng(7)
params = [(5, 1200.0, 3333), (11, -2500.0, 17777), (20, 400.0, 404)]
sats = [SatelliteSignal(prn=p, doppler_hz=d, delay_samples=float(s),
                        nav_bits=tuple(rng.choice([-1,1], size=8)))
        for p, d, s in params]
with jax.default_device(jax.devices('cpu')[0]):
    signal = synthesize_signal(cfg, sats, 100, noise_std=0.8, seed=4)
channels = Channels(prn=np.asarray([p for p,_,_ in params]),
                    acquired_freq=np.asarray([cfg.intermediate_freq + d for _,d,_ in params]),
                    code_phase=np.asarray([s for _,_,s in params], np.int64),
                    status=['T']*3)
n_ms = 96
orc = oracle_track_channel(cfg, np.asarray(signal), 5, cfg.intermediate_freq + 1200.0, 3333, n_ms)
for impl in ('onehot', 'pallas', 'megakernel'):
    res = track(cfg.with_options(correlator_impl=impl), signal, channels, n_ms=n_ms)
    ip = np.asarray(res.i_p, np.float64)[0]
    a = np.asarray(orc['i_p'], np.float64)
    rms = np.sqrt(np.mean((a - ip)**2)) / np.sqrt(np.mean(a**2))
    das = np.abs(np.asarray(res.absolute_sample)[0] - orc['absolute_sample']).max()
    print(f'{impl:10s} vs f64 oracle: i_p rel rms {rms:.2e}  max|dAS| {das}')
