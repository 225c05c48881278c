"""Tracing / profiling / metrics subsystem.

The reference's only observability is a wall-clock print around tracking
and a 50-ms progress ticker (initialize.py:499-509, tracking.py:137-143).
Here, first-class:

* :class:`StageTimer` — hierarchical wall-clock stage timing (the numbers
  behind ReceiverResults.timings_s),
* :func:`trace` — context manager wiring ``jax.profiler`` TraceAnnotations
  so receiver stages show up named in TensorBoard/XProf device traces,
* :func:`profile_to` — capture a full device trace of a code region,
* :func:`lock_metrics` — the per-ms tracking observables reduced to a
  lock-quality metrics stream (C/N0 estimate, phase-lock indicator, code
  rate offset) — the framework's equivalent of the reference's
  validation-by-plots (SURVEY.md §5.5).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class StageTimer:
    """Accumulates named stage wall times; nests via dotted names."""

    timings_s: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        import jax

        with jax.profiler.TraceAnnotation(f"softgnss/{name}"):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.timings_s[name] = (self.timings_s.get(name, 0.0)
                                        + time.perf_counter() - t0)

    def report(self) -> str:
        width = max((len(k) for k in self.timings_s), default=0)
        return "\n".join(f"{k:{width}s} {v:8.3f} s"
                         for k, v in self.timings_s.items())


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region so it appears named in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(f"softgnss/{name}"):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a jax.profiler device trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def lock_metrics(config, tracking, window_ms: int = 1000,
                 hop_ms: int | None = None) -> dict:
    """Per-channel lock-quality metrics from tracking output.

    ``hop_ms``: stride between window starts (default = ``window_ms``,
    non-overlapping; window k covers ms [k*hop, k*hop + window) up to the
    per-channel bit-alignment offset).  Returns arrays of shape
    (C, n_windows):
      - ``cn0_dbhz``: narrowband/wideband C/N0 estimate,
      - ``pll_lock``: NBD/NBP phase-lock indicator in [-1, 1] (~1 locked),
      - ``code_rate_offset_hz``: mean code-frequency offset from nominal.
    """
    i_p = np.asarray(tracking.i_p)
    q_p = np.asarray(tracking.q_p)
    c, n_ms = i_p.shape
    hop_ms = window_ms if hop_ms is None else int(hop_ms)
    if not 0 < hop_ms <= window_ms:
        raise ValueError(f"hop_ms must be in (0, window_ms], got {hop_ms}")
    if n_ms < window_ms + 20:
        raise ValueError(f"need >= {window_ms + 20} ms of tracking, got {n_ms}")

    # align the 20-ms coherent sums to each channel's nav-bit edges (the
    # I_P sign-transition phase mod 20); unaligned sums straddle bit
    # transitions and bias C/N0 low by >10 dB on healthy channels
    signs = np.sign(i_p)
    flips = (signs[:, 1:] * signs[:, :-1]) < 0          # (C, n_ms-1)
    offsets = np.zeros(c, np.int64)
    for ch in range(c):
        edges = np.flatnonzero(flips[ch]) + 1
        if edges.size:
            offsets[ch] = np.bincount(edges % 20, minlength=20).argmax()

    n_win = (n_ms - 20 - window_ms) // hop_ms + 1
    win_idx = (np.arange(n_win)[:, None] * hop_ms
               + np.arange(window_ms)[None, :])          # (n_win, window_ms)
    ip = np.stack([i_p[ch, offsets[ch] + win_idx] for ch in range(c)])
    qp = np.stack([q_p[ch, offsets[ch] + win_idx] for ch in range(c)])

    # 20-ms coherent sums (one nav bit) inside each window
    m = window_ms // 20
    ip20 = ip[:, :, : m * 20].reshape(c, n_win, m, 20)
    qp20 = qp[:, :, : m * 20].reshape(c, n_win, m, 20)
    nbp = ip20.sum(-1) ** 2 + qp20.sum(-1) ** 2            # narrowband power
    wbp = (ip20**2 + qp20**2).sum(-1)                       # wideband power
    np_ratio = nbp / np.maximum(wbp, 1e-30)
    mu = np_ratio.mean(-1)                                  # (C, n_win)
    # Van Dierendonck C/N0 estimator, T = 1 ms, M = 20
    with np.errstate(divide="ignore", invalid="ignore"):
        cn0 = 10.0 * np.log10(np.maximum((mu - 1.0) / (20.0 - mu), 1e-12) * 1000.0)

    # phase-lock detector: (NBD)/(NBP) over 20-ms sums
    nbd = ip20.sum(-1) ** 2 - qp20.sum(-1) ** 2
    pll_lock = (nbd / np.maximum(nbp, 1e-30)).mean(-1)

    code_off = np.asarray(tracking.code_freq)[:, win_idx].mean(-1)


    return {"cn0_dbhz": cn0, "pll_lock": pll_lock,
            "code_rate_offset_hz": code_off - config.code_freq_basis}


def channel_lock_loss(config, tracking) -> np.ndarray:
    """Per-channel ms index at which tracking lock was lost (inf = held).

    A channel is demoted at the START of the first ``config.lock_window_ms``
    window whose Van Dierendonck C/N0 falls below
    ``config.lock_cn0_threshold_dbhz`` or whose NBD/NBP phase-lock indicator
    falls below ``config.lock_pll_threshold``.  Demotion is permanent:
    downstream consumers (navigation, status reporting) exclude the channel
    from that millisecond on.  Beyond the reference, which records the
    observables behind these metrics but never reacts to lock loss
    (tracking.py:253-275).

    Windows slide at half-window hops so a collapse anywhere except the
    very last ``window/2 + 20`` ms of the capture lands in at least one
    fully-covering window.  Returns (C,) float64; channels with '-' status
    or captures shorter than one metrics window report inf (no demotion
    information).

    The C/N0 floor encodes "the loops cannot hold below this"; with
    multi-ms coherent integration (``config.pdi_ms`` K > 1) the tracking
    floor drops by the coherent gain, so the configured threshold is
    lowered by 10 log10(K) dB.  The phase-lock indicator (computed from
    20-ms coherent sums) measures actual phase stability and is
    cadence-independent — its threshold is used as-is.
    """
    i_p = np.asarray(tracking.i_p)
    c, n_ms = i_p.shape
    loss = np.full(c, np.inf)
    window = int(config.lock_window_ms)
    if n_ms < window + 20:
        return loss
    hop = max(window // 2, 20)
    metrics = lock_metrics(config, tracking, window_ms=window, hop_ms=hop)
    cn0_floor = (config.lock_cn0_threshold_dbhz
                 - 10.0 * np.log10(config.pdi_ms))
    bad = ((metrics["cn0_dbhz"] < cn0_floor)
           | (metrics["pll_lock"] < config.lock_pll_threshold))
    for ch in range(c):
        if tracking.status[ch] == "-":
            continue
        idx = np.flatnonzero(bad[ch])
        if idx.size:
            loss[ch] = float(idx[0] * hop)
    return loss
