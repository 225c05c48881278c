"""Reference-scale closed loop on the real TPU: 37 s at fs=38.192 MHz,
8 channels (the reference's exact default workload) -> PVT fixes vs the
injected truth, with per-stage wall times."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
import softgnss_tpu as sg
from softgnss_tpu.pipeline import run_receiver
from softgnss_tpu.scenario import build_scenario, synthesize_scenario

cfg = sg.default_config(number_of_channels=8, ms_to_process=37000)
t0 = time.perf_counter()
sc = build_scenario(cfg, n_sats=8)
with jax.default_device(jax.devices('cpu')[0]):
    sig = synthesize_scenario(sc, 37000 + cfg.acquisition_ms + 2)
print('synth %.1f s, capture %.2f GB' % (time.perf_counter() - t0,
                                         sig.nbytes / 1e9), flush=True)
t0 = time.perf_counter()
res = run_receiver(cfg, signal=sig)
wall = time.perf_counter() - t0
assert res.has_fix
sol = res.solutions
xyz = np.stack([sol.x, sol.y, sol.z], axis=1)
err = np.linalg.norm(xyz - np.asarray(sc.receiver_ecef)[None, :], axis=1)
print(res.summary())
print('RESULT: %d/%d fixes, median 3D %.2f m, mean %.2f m; receiver wall %.1f s'
      % (np.isfinite(err).sum(), len(err), np.median(err), err.mean(), wall))
# steady-state tracking: re-run the tracking stage alone on the warm jit

t0 = time.perf_counter()
res2 = run_receiver(cfg, signal=sig)
wall2 = time.perf_counter() - t0
print('WARM: wall %.1f s; stages: %s' % (
    wall2, {k: round(v, 2) for k, v in res2.timings_s.items()}))
