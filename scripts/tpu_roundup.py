"""One-shot TPU measurement session: rerun after kernel/scan changes.

Runs (on the real chip): tracking bench (pallas auto + onehot), a
32-channel scaling point, the full fast-config closed loop through the
pallas path, the same with stream=True (wall-time comparison), and a
short PDI tracking drive.  Prints a summary block; paste results into
BASELINE.md.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench(env=None):
    import subprocess

    e = dict(os.environ)
    e.update(env or {})
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, env=e, cwd="/root/repo", timeout=900)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return line[-1] if line else out.stderr[-500:]


def main():
    import jax

    print("backend:", jax.default_backend())
    print("bench auto  :", bench())
    print("bench auto 2:", bench())
    print("bench onehot:", bench({"BENCH_IMPL": "onehot"}))
    print("bench 32ch  :", bench({"BENCH_CHANNELS": "32"}))

    import softgnss_tpu as sg
    from softgnss_tpu.pipeline import run_receiver
    from softgnss_tpu.scenario import build_scenario, synthesize_scenario

    cfg = sg.fast_config(number_of_channels=5, ms_to_process=37000)
    print("resolved correlator:", cfg.resolved_correlator)
    sc = build_scenario(cfg, n_sats=5)
    sig = synthesize_scenario(sc, 37020)
    for label, kw in (("monolithic", {}), ("stream", {"stream": True})):
        t0 = time.perf_counter()
        res = run_receiver(cfg, signal=np.asarray(sig), **kw)
        wall = time.perf_counter() - t0
        est = res.solutions
        err = np.linalg.norm(np.stack([est.x, est.y, est.z], 1)
                             - np.asarray(sc.receiver_ecef), axis=1)
        print(f"closed loop [{label}]: {np.isfinite(err).sum()}/{len(err)} fixes, "
              f"median {np.nanmedian(err):.2f} m, wall {wall:.1f} s, "
              f"stages {dict((k, round(v, 2)) for k, v in res.timings_s.items())}")

    # PDI on the TPU path (short): locked with 4-ms coherent integration
    from softgnss_tpu.acquire.search import Channels
    from softgnss_tpu.signals.synth import SatelliteSignal, synthesize_signal
    from softgnss_tpu.track import track

    c4 = sg.fast_config(number_of_channels=2, pdi_ms=4)
    sats = [SatelliteSignal(prn=9, doppler_hz=1200.0, delay_samples=500.0)]
    s2 = synthesize_signal(c4, sats, 403, noise_std=1.0, seed=11)
    ch = Channels(prn=np.array([9, 0], np.int64),
                  acquired_freq=np.array([c4.intermediate_freq + 1200.0, 0.0]),
                  code_phase=np.array([500, 0], np.int64), status=["T", "-"])
    tr = track(c4, np.asarray(s2), ch, n_ms=400)
    ferr = abs(np.median(tr.carr_freq[0, 200:]) - (c4.intermediate_freq + 1200.0))
    print(f"pdi_ms=4 TPU drive: carr err {ferr:.2f} Hz "
          f"({'OK' if ferr < 2 else 'CHECK'})")


if __name__ == "__main__":
    main()
