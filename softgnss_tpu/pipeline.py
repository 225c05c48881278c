"""Receiver pipeline: probe -> acquire -> track -> navigate.

The reference's orchestrator is Settings.postProcessing
(initialize.py:454-527): open file, read 11 ms, acquire, allocate
channels, track (with a .npy cache), postNavigate, plot.  This pipeline
keeps that staged shape but:

* the capture is loaded once (file or in-memory array) and handed to the
  jitted stages whole — no file handle threading,
* per-stage wall times are recorded first-class (the reference prints the
  tracking time only, initialize.py:499-509),
* tracking results can be checkpointed to .npz and reloaded explicitly
  (``checkpoint=`` argument) — the reference's silent stale-cache pickup
  (initialize.py:504-507) is a documented hazard we do not replicate,
* plotting is separate (softgnss_tpu.plots) and never gates computation
  (the reference's inverted plot gate, initialize.py:521, is fixed).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

import numpy as np

from softgnss_tpu import io as sio
from softgnss_tpu.acquire.search import (
    AcquisitionResults,
    Channels,
    acquire,
    assign_channels,
    format_channel_status,
)
from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.nav.message import Ephemeris
from softgnss_tpu.nav.solve import NavSolutions, post_navigate
from softgnss_tpu.track.scan import TrackResults, track

logger = logging.getLogger(__name__)


@dataclass
class ReceiverResults:
    """Everything a full receiver run produces."""

    config: ReceiverConfig
    probe: dict | None = None
    acquisition: AcquisitionResults | None = None
    channels: Channels | None = None
    tracking: TrackResults | None = None
    solutions: NavSolutions | None = None
    ephemerides: list[Ephemeris | None] = field(default_factory=lambda: [None] * 32)
    timings_s: dict = field(default_factory=dict)

    @property
    def has_fix(self) -> bool:
        return self.solutions is not None and np.isfinite(self.solutions.x).any()

    def summary(self) -> str:
        lines = []
        if self.acquisition is not None:
            n_acq = int(self.acquisition.acquired.sum())
            lines.append(f"Acquired {n_acq} satellites: "
                         f"{[i + 1 for i in np.flatnonzero(self.acquisition.acquired)]}")
        if self.channels is not None:
            lines.append(format_channel_status(self.config, self.channels))
        if self.tracking is not None:
            lines.append(f"Tracked {self.tracking.n_ms} ms on "
                         f"{sum(1 for s in self.tracking.status if s != '-')} channels")
            if self.tracking.lock_loss_ms is not None:
                for ch in np.flatnonzero(np.isfinite(self.tracking.lock_loss_ms)):
                    lines.append(f"  lock lost: channel {ch} "
                                 f"(PRN {int(self.tracking.prn[ch])}) at "
                                 f"{self.tracking.lock_loss_ms[ch] / 1000.0:.1f} s "
                                 f"-> status 'L', demoted from navigation")
        if self.solutions is not None:
            ok = np.isfinite(self.solutions.latitude)
            if ok.any():
                tag = (" (EKF)" if getattr(self.solutions, "nav_filter", "lsq")
                       == "ekf" else "")
                n_used = getattr(self.solutions, "n_used", None)
                if (tag and n_used is not None
                        and (fin_lt4 := ok & (n_used < 4)).any()):
                    tag += (f", {int(fin_lt4.sum())} epochs bridged"
                            " with < 4 usable satellites")
                lines.append(
                    f"PVT{tag}: {int(ok.sum())}/{self.solutions.n_epochs} fixes, mean "
                    f"lat {np.nanmean(self.solutions.latitude):.6f} deg, "
                    f"lon {np.nanmean(self.solutions.longitude):.6f} deg, "
                    f"hgt {np.nanmean(self.solutions.height):.1f} m, "
                    f"mean PDOP {np.nanmean(self.solutions.dop[1]):.2f}, "
                    f"TTFF {self.solutions.ttff_ms / 1000.0:.1f} s")
                if self.solutions.vx is not None:
                    v = np.sqrt(self.solutions.vx**2 + self.solutions.vy**2
                                + self.solutions.vz**2)
                    if np.isfinite(v).any():
                        lines.append(f"Velocity: median |v| {np.nanmedian(v):.3f} m/s, "
                                     f"clock drift {np.nanmedian(self.solutions.clock_drift):.3f} m/s")
                utc_off = self.solutions.utc_offset_s()
                if utc_off is not None:
                    lines.append(
                        f"UTC: GPS-UTC offset {utc_off:.9f} s "
                        f"(leap seconds "
                        f"{int(self.solutions.utc_params.delta_t_ls)}; "
                        f"week {self.solutions.week_number})")
                flags = self.solutions.raim_flag
                if flags is not None and (flags > 0).any():
                    n_ex = int((flags == 1).sum())
                    n_bad = int((flags == 2).sum())
                    prns = sorted(set(
                        self.solutions.raim_excluded_prn[flags == 1].tolist()))
                    lines.append(
                        f"RAIM: {n_ex} epoch(s) with a satellite excluded"
                        + (f" (PRNs {prns})" if prns else "")
                        + (f", {n_bad} epoch(s) invalidated (non-isolable fault)"
                           if n_bad else ""))
            else:
                lines.append("PVT: no fixes")
        elif self.tracking is not None:
            lines.append("PVT: navigation solution not computed")
        for stage, dt in self.timings_s.items():
            lines.append(f"  {stage:12s} {dt:8.2f} s")
        return "\n".join(lines)


def _checkpoint_path(path: str) -> str:
    """np.savez appends .npz; normalize so save/exists/load agree."""
    return path if path.endswith(".npz") else path + ".npz"


def _demote_unlocked(config: ReceiverConfig, tracking: TrackResults) -> None:
    """Flag channels that lost lock mid-capture (config.lock_demotion).

    Fills ``tracking.lock_loss_ms`` and flips the status of affected
    channels 'T' -> 'L' (still counted as tracked — their pre-loss data is
    valid — but navigation excludes them from every epoch at/after the
    loss).  Beyond the reference, whose channel status never changes after
    acquisition (tracking.py:253-275 logs lock observables but never
    reacts).
    """
    if not config.lock_demotion or tracking.n_ms < config.lock_window_ms + 20:
        return
    from softgnss_tpu.profiling import channel_lock_loss

    loss = channel_lock_loss(config, tracking)
    tracking.lock_loss_ms = loss
    for ch in np.flatnonzero(np.isfinite(loss)):
        if tracking.status[ch] == "T":
            tracking.status[ch] = "L"
        logger.warning("Channel %d (PRN %d) lost lock at %.0f ms "
                       "(C/N0 or phase-lock below threshold); demoted.",
                       ch, int(tracking.prn[ch]), loss[ch])


def save_tracking(path: str, tracking: TrackResults) -> None:
    """Checkpoint tracking output to .npz.

    Covers both the reference's results cache (resume navigation without
    re-tracking, initialize.py:504-507) and true mid-capture resume: the
    final loop state is stored, so ``track(..., state=loaded.final_state)``
    continues the capture exactly (integer-NCO determinism).
    """
    state = {}
    if tracking.final_state is not None:
        state = {f"state_{k}": np.asarray(v)
                 for k, v in tracking.final_state._asdict().items()}
    if tracking.lock_loss_ms is not None:
        state["lock_loss_ms"] = np.asarray(tracking.lock_loss_ms)
    np.savez_compressed(
        _checkpoint_path(path), prn=tracking.prn, status=np.asarray(tracking.status),
        **{k: getattr(tracking, k) for k in (
            "absolute_sample", "sample_frac", "code_freq", "carr_freq", "i_p", "i_e", "i_l",
            "q_e", "q_p", "q_l", "dll_discr", "dll_discr_filt", "pll_discr",
            "pll_discr_filt")},
        **state)


def load_tracking(path: str) -> TrackResults:
    from softgnss_tpu.track.scan import TrackState

    data = np.load(_checkpoint_path(path), allow_pickle=False)
    state = None
    if "state_ptr" in data:
        # coherent-accumulator leaves default to zero for checkpoints
        # written before pdi_ms existed (exact for pdi_ms == 1 runs)
        state = TrackState(**{
            k: (data[f"state_{k}"] if f"state_{k}" in data
                else np.zeros(data["state_ptr"].shape, np.float32))
            for k in TrackState._fields})
    return TrackResults(
        prn=data["prn"], status=[str(s) for s in data["status"]],
        final_state=state,
        lock_loss_ms=data["lock_loss_ms"] if "lock_loss_ms" in data else None,
        **{k: data[k] for k in (
            "absolute_sample", "sample_frac", "code_freq", "carr_freq", "i_p", "i_e", "i_l",
            "q_e", "q_p", "q_l", "dll_discr", "dll_discr_filt", "pll_discr",
            "pll_discr_filt")})


def run_receiver(config: ReceiverConfig, signal: np.ndarray | None = None,
                 file_name: str | None = None, n_ms: int | None = None,
                 probe: bool = False, navigate: bool = True,
                 checkpoint: str | None = None,
                 channels: Channels | None = None,
                 mesh=None, shard: str = "channel",
                 stream: bool = False,
                 ephemerides: list | None = None,
                 iono: "np.ndarray | None" = None,
                 utc=None,
                 assist_position: np.ndarray | None = None,
                 assist_tow: float | None = None) -> ReceiverResults:
    """Run the full receiver chain.

    ``signal``: in-memory int8 capture (absolute sample indexing including
    ``config.skip_samples``), or ``file_name`` to read one.  ``n_ms``
    overrides ``config.ms_to_process``.  ``checkpoint``: path to a .npz
    tracking checkpoint — loaded if it exists, written after tracking
    otherwise.  ``channels``: pre-assigned tracking channels — skips the
    acquisition stage (also honored when ``config.skip_acquisition`` is
    set, the reference's skipAcquisition flag, initialize.py:117).

    ``mesh``: a jax.sharding.Mesh (softgnss_tpu.parallel.receiver_mesh)
    to distribute the run: acquisition shards its PRN axis, tracking
    shards per ``shard`` — 'channel' (exact data-parallel), 'time'
    (sequence-parallel blocks with warm-up re-lock), or 'time-exact'
    (sequential-carry time blocks, bit-exact anchor).

    ``stream``: software-pipeline the tracking stage over
    ``config.track_stream_chunk_ms`` time chunks (capture upload, device
    compute, and output readback overlap — softgnss_tpu.parallel.stream);
    integer observables identical to the monolithic run.  Single-device
    only (exclusive with ``mesh``).

    ``ephemerides``: per-PRN list of 32 for a warm start (e.g. a previous
    run's ``results.ephemerides``, or ``message.load_ephemerides(path)``):
    navigation then needs only ~8 s of capture instead of the 36 s frame
    decode (see nav.solve.post_navigate).  With ``assist_position``
    (approximate receiver ECEF) and ``assist_tow`` (approximate GPS time
    of week at capture start) also given, acquisition is Doppler-hinted
    from the ephemerides (nav.assist.predict_doppler) — the full
    assisted/warm start.
    """
    import os

    if shard not in ("channel", "time", "time-exact"):
        raise ValueError(
            f"shard must be 'channel', 'time', or 'time-exact', got {shard!r}")
    results = ReceiverResults(config=config)
    if signal is None:
        if not (file_name or config.file_name):
            raise ValueError("provide signal= or file_name=")
        t0 = time.monotonic()
        # complex I/Q formats come back upconverted to a real stream with
        # the IF shifted by fs/4 (sio.load_capture) — the adjusted config
        # governs everything downstream
        signal, config = sio.load_capture(file_name or config.file_name,
                                          config)
        results.config = config
        results.timings_s["read"] = time.monotonic() - t0
    signal = np.asarray(signal)

    n_ms = int(config.ms_to_process if n_ms is None else n_ms)
    skip = config.skip_samples
    spc = config.samples_per_code

    if probe:
        results.probe = sio.probe_data(config, signal[skip:])

    # --- tracking checkpoint short-circuit ---------------------------------
    # a loaded checkpoint supersedes acquisition AND tracking; running the
    # full acquisition first would waste it and print a channel table
    # unrelated to the loaded rows
    if checkpoint is not None and os.path.exists(_checkpoint_path(checkpoint)):
        logger.info("Loading tracking checkpoint %s", _checkpoint_path(checkpoint))
        t0 = time.monotonic()
        results.tracking = load_tracking(checkpoint)
        if results.tracking.lock_loss_ms is None:
            _demote_unlocked(config, results.tracking)      # pre-demotion checkpoint
        results.timings_s["track"] = time.monotonic() - t0
        if navigate:
            t0 = time.monotonic()
            results.solutions, results.ephemerides = post_navigate(
                config, results.tracking, ephemerides=ephemerides, iono=iono, utc=utc)
            results.timings_s["navigate"] = time.monotonic() - t0
        return results

    # --- acquisition (reference: initialize.py:481-492) --------------------
    if channels is not None:
        results.channels = channels
    elif config.skip_acquisition:
        raise ValueError("config.skip_acquisition requires channels= "
                         "(pre-assigned tracking channels)")
    else:
        t0 = time.monotonic()
        acq_need = config.acquisition_ms * spc
        if len(signal) < skip + acq_need:
            raise ValueError(f"capture too short for acquisition: need "
                             f"{skip + acq_need} samples, got {len(signal)}")
        hints = None
        if (ephemerides is not None and assist_position is not None
                and assist_tow is not None):
            from softgnss_tpu.nav.assist import predict_doppler

            hints = predict_doppler(config, ephemerides,
                                    np.asarray(assist_position),
                                    float(assist_tow))
        if mesh is not None:
            from softgnss_tpu.parallel import acquire_sharded

            results.acquisition = acquire_sharded(
                config, signal[skip: skip + acq_need], mesh,
                doppler_hints=hints)
        else:
            results.acquisition = acquire(config, signal[skip: skip + acq_need],
                                          doppler_hints=hints)
        results.timings_s["acquire"] = time.monotonic() - t0

        if not results.acquisition.acquired.any():
            logger.warning("No GNSS signals detected, signal processing finished.")
            return results
        results.channels = assign_channels(config, results.acquisition)

    # --- tracking -----------------------------------------------------------
    t0 = time.monotonic()
    if stream and mesh is not None and shard != "channel":
        raise ValueError("stream=True composes with mesh= only for "
                         "shard='channel' (time sharding partitions the "
                         "capture itself)")
    if stream:
        from softgnss_tpu.parallel import track_streamed

        results.tracking = track_streamed(config, signal, results.channels,
                                          n_ms=n_ms, mesh=mesh)
    elif mesh is not None:
        from softgnss_tpu.parallel import (track_channels_sharded,
                                           track_time_exact,
                                           track_time_sharded)

        track_fn = {"channel": track_channels_sharded,
                    "time": track_time_sharded,
                    "time-exact": track_time_exact}[shard]
        results.tracking = track_fn(config, signal, results.channels, mesh,
                                    n_ms=n_ms)
    else:
        results.tracking = track(config, signal, results.channels, n_ms=n_ms)
    _demote_unlocked(config, results.tracking)
    if checkpoint is not None:
        save_tracking(checkpoint, results.tracking)
    results.timings_s["track"] = time.monotonic() - t0

    # --- navigation ---------------------------------------------------------
    if navigate:
        t0 = time.monotonic()
        results.solutions, results.ephemerides = post_navigate(
                config, results.tracking, ephemerides=ephemerides, iono=iono, utc=utc)
        results.timings_s["navigate"] = time.monotonic() - t0
    return results
