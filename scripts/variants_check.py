"""Hardware parity of megakernel config variants vs the onehot path.

Run on the real TPU after kernel or toolchain changes (interpret-mode
tests cannot catch Mosaic lowering bugs): narrow correlator spacing
(multi-word funnel), pdi_ms > 1 (in-kernel accumulate/hold cadence,
typed-constant remainder), and carrier-aided DLL + FLL.

    python scripts/variants_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import softgnss_tpu as sg
from softgnss_tpu.acquire.search import Channels
from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
from softgnss_tpu.track import track
from softgnss_tpu.track.tables import mega_n_words, mega_split, subdivision

VARIANTS = [
    ("narrow 0.25-chip", dict(dll_correlator_spacing=0.25), 2e-3),
    ("pdi_ms=2", dict(pdi_ms=2), 2e-3),
    ("aided+FLL", dict(carrier_aided_dll=True, fll_bandwidth_hz=5.0), 3e-3),
]

for tag, opts, tol in VARIANTS:
    cfg = sg.default_config(number_of_channels=3, **opts)
    rng = np.random.default_rng(7)
    params = [(5, 1200.0, 3333), (11, -2500.0, 17777), (20, 400.0, 404)]
    sats = [SatelliteSignal(prn=p, doppler_hz=d, delay_samples=float(s),
                            nav_bits=tuple(rng.choice([-1, 1], size=8)))
            for p, d, s in params]
    with jax.default_device(jax.devices("cpu")[0]):
        signal = synthesize_signal(cfg, sats, 100, noise_std=0.8, seed=4)
    ch = Channels(
        prn=np.asarray([p for p, _, _ in params]),
        acquired_freq=np.asarray(
            [cfg.intermediate_freq + d for _, d, _ in params]),
        code_phase=np.asarray([s for _, _, s in params], np.int64),
        status=["T"] * 3)
    a = track(cfg.with_options(correlator_impl="onehot"), signal, ch, n_ms=96)
    b = track(cfg.with_options(correlator_impl="megakernel"), signal, ch,
              n_ms=96)
    x = np.asarray(a.i_p, np.float64)
    y = np.asarray(b.i_p, np.float64)
    rms = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x ** 2))
    print("%-18s S=%d n_tab=%d subdiv=%d  i_p rel rms %.1e" % (
        tag, mega_split(cfg), mega_n_words(cfg), subdivision(cfg), rms))
    assert rms < tol, (tag, rms)
print("variant hardware parity PASS")
