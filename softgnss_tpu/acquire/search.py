"""Cold-start acquisition: batched FFT code-phase/Doppler search.

Searches every PRN over a Doppler grid for code phase and carrier frequency
via FFT circular correlation, then refines carrier frequency with a long
zero-padded FFT — the same math as the reference (acquisition.py:27-204), but
batched TPU-first:

* the reference loops 32 PRNs x 29 Doppler bins in Python, doing ~3.7k
  single-row FFT/IFFT pairs (reference: acquisition.py:92-133); here the whole
  (PRN-chunk x doppler x code-phase) tensor goes through one batched
  FFT -> multiply -> IFFT -> |.|^2, chunked over PRNs only to bound HBM,
* peak/second-peak detection is a vectorized masked argmax over the grid
  (reference: acquisition.py:139-164 builds per-case index ranges; we use the
  equivalent circular-distance exclusion mask),
* the fine-frequency stage (reference: acquisition.py:166-193) runs for all
  PRNs under ``lax.map`` with masked selection — no data-dependent branching.

Documented divergence from the reference: the reference drops the +4 bin
offset when mapping the fine-FFT argmax back to a frequency
(``fftFreqBins[fftMaxIndex]`` after searching ``fftxc[4:...]``,
acquisition.py:186-191), a constant ~fs/fftNumPts*4 Hz underestimate. We add
the offset back; the PLL would pull either in, but ours starts on frequency.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals.ca import ca_table, gold_codes


@dataclass
class AcquisitionResults:
    """Per-PRN acquisition outputs (row i is PRN i+1).

    Mirrors the reference's acqResults recarray (acquisition.py:201-203):
    ``carr_freq == 0`` marks a PRN as not acquired (acquisition.py:44-46).
    """

    carr_freq: np.ndarray   # (32,) f64, Hz; 0 if not acquired
    code_phase: np.ndarray  # (32,) i64, samples
    peak_metric: np.ndarray  # (32,) f64, first/second peak ratio

    @property
    def acquired(self) -> np.ndarray:
        return self.carr_freq > 0


@dataclass
class Channels:
    """Tracking channel assignments (reference preRun, acquisition.py:259-306)."""

    prn: np.ndarray            # (C,) i64; 0 = idle channel
    acquired_freq: np.ndarray  # (C,) f64
    code_phase: np.ndarray     # (C,) i64
    status: list[str]          # 'T' tracking / '-' idle

    def __len__(self):
        return len(self.prn)


def _fine_freq_fft_size(config: ReceiverConfig) -> int:
    n = config.acq_fine_freq_ms * config.samples_per_code
    return int(8 * 2 ** int(np.ceil(np.log2(n))))


def _baseband_ffts(config: ReceiverConfig, long_signal: jnp.ndarray):
    """Doppler-mixed FFTs of the two acquisition milliseconds, (B, N) each,
    plus the DC-removed fine-frequency signal.  PRN-independent."""
    spc = config.samples_per_code
    fs = config.sampling_freq
    sig = long_signal.astype(jnp.float32)
    sig1, sig2 = sig[:spc], sig[spc: 2 * spc]
    sig0dc = sig - jnp.mean(sig)

    # reference mixes with sin/cos separately (acquisition.py:103-117);
    # sin(th) + j*cos(th) = j*exp(-j*th), and the global j drops under |.|^2.
    freqs = jnp.asarray(config.doppler_bin_freqs, jnp.float64)      # (B,)
    t = jnp.arange(spc, dtype=jnp.float64) / fs
    theta = 2.0 * jnp.pi * freqs[:, None] * t[None, :]
    mixer = jnp.exp(-1j * theta.astype(jnp.float64)).astype(jnp.complex64)

    x1 = jnp.fft.fft(mixer * sig1[None, :])                          # (B, N)
    x2 = jnp.fft.fft(mixer * sig2[None, :])
    return x1, x2, sig0dc


def _fine_chip_indices(config: ReceiverConfig) -> np.ndarray:
    """Static chip-index gather for the 10-ms code wipe-off
    (reference: acquisition.py:172-177)."""
    fine_n = config.acq_fine_freq_ms * config.samples_per_code
    ts = 1.0 / config.sampling_freq
    tc = 1.0 / config.code_freq_basis
    chip_idx = np.floor(ts * np.arange(1, fine_n + 1, dtype=np.float64) / tc)
    return np.mod(chip_idx, 1023).astype(np.int32)


def _prn_block(config: ReceiverConfig, x1, x2, sig0dc, code_fd, gold):
    """Full acquisition math for a block of PRNs.

    ``code_fd``: (p, N) conjugated code FFTs; ``gold``: (p, 1023) chips.
    Returns (fine_or_zero_carr_freq, code_phase, metric), each (p,).
    PRN-independent inputs (x1, x2, sig0dc) are shared — this same block
    function serves the single-chip chunked path and the mesh-sharded path
    (softgnss_tpu.parallel.acquire).
    """
    spc = config.samples_per_code
    fs = config.sampling_freq
    p = code_fd.shape[0]

    r1 = jnp.abs(jnp.fft.ifft(x1[None, :, :] * code_fd[:, None, :])) ** 2
    r2 = jnp.abs(jnp.fft.ifft(x2[None, :, :] * code_fd[:, None, :])) ** 2
    # per Doppler row, keep whichever millisecond has the stronger peak
    # (bit-transition hedge, reference: acquisition.py:129-133)
    take1 = r1.max(-1, keepdims=True) > r2.max(-1, keepdims=True)
    results = jnp.where(take1, r1, r2)                               # (p, B, N)

    # --- peak / second-peak metric (reference: acquisition.py:139-164) ------
    flat = results.reshape(p, -1)
    peak_idx = jnp.argmax(flat, axis=1)
    bin_idx = peak_idx // spc
    code_phase = peak_idx % spc
    peak = jnp.take_along_axis(flat, peak_idx[:, None], 1)[:, 0]

    # exclude +/- one chip (circularly) around the peak in its Doppler row
    spchip = config.samples_per_chip
    pos = jnp.arange(spc)
    dist = jnp.abs(pos[None, :] - code_phase[:, None])
    circ = jnp.minimum(dist, spc - dist)
    row = jnp.take_along_axis(results, bin_idx[:, None, None], 1)[:, 0, :]  # (p, N)
    second = jnp.max(jnp.where(circ >= spchip, row, -jnp.inf), axis=1)
    metric = peak / second

    # --- fine carrier frequency over 10 ms (reference: acquisition.py:166-193)
    fine_n = config.acq_fine_freq_ms * spc
    fft_pts = _fine_freq_fft_size(config)
    uniq = int(np.ceil((fft_pts + 1) / 2))
    chip_idx = jnp.asarray(_fine_chip_indices(config))

    def fine_one(args):
        cp, code = args
        long_code = code[chip_idx]
        x = jax.lax.dynamic_slice(sig0dc, (cp,), (fine_n,)) * long_code
        mag = jnp.abs(jnp.fft.fft(x.astype(jnp.complex64), fft_pts))
        window = jax.lax.dynamic_slice(mag, (4,), (uniq - 9,))
        k = jnp.argmax(window) + 4
        return k.astype(jnp.float64) * (fs / fft_pts)

    fine_freq = jax.lax.map(fine_one, (code_phase, gold))

    carr_freq = jnp.where(metric > config.acq_threshold, fine_freq, 0.0)
    return carr_freq, code_phase.astype(jnp.int64), metric.astype(jnp.float64)


@partial(jax.jit, static_argnums=(0,))
def _acquire_device(config: ReceiverConfig, long_signal: jnp.ndarray):
    prn_list = np.asarray(config.acq_satellite_list, np.int64)
    x1, x2, sig0dc = _baseband_ffts(config, long_signal)

    spc = config.samples_per_code
    codes = jnp.asarray(ca_table(config)[prn_list - 1])              # (P, N)
    code_fd = jnp.conj(jnp.fft.fft(codes.astype(jnp.complex64)))     # (P, N)
    gold = jnp.asarray(gold_codes()[prn_list - 1], jnp.float32)      # (P, 1023)

    # chunk over PRNs: the (chunk, B, N) grid bounds HBM footprint
    chunk = min(config.acq_prn_chunk, len(prn_list))
    n_prn = len(prn_list)
    pad = (-n_prn) % chunk
    code_fd = jnp.pad(code_fd, ((0, pad), (0, 0))).reshape(-1, chunk, spc)
    gold = jnp.pad(gold, ((0, pad), (0, 0))).reshape(-1, chunk, 1023)

    outs = jax.lax.map(
        lambda args: _prn_block(config, x1, x2, sig0dc, args[0], args[1]),
        (code_fd, gold))
    carr_freq, code_phase, metric = (o.reshape(-1)[:n_prn] for o in outs)
    return carr_freq, code_phase, metric


def acquire(config: ReceiverConfig, long_signal: np.ndarray) -> AcquisitionResults:
    """Run acquisition on >= acquisition_ms milliseconds of raw IF samples."""
    need = config.acquisition_ms * config.samples_per_code
    if long_signal.shape[0] < need:
        raise ValueError(f"acquisition needs {need} samples, got {long_signal.shape[0]}")
    carr, phase, metric = _acquire_device(config, jnp.asarray(long_signal[:need]))
    out = tuple(np.asarray(jax.device_get(v)) for v in (carr, phase, metric))

    # scatter back into 32-wide arrays indexed by PRN
    n = 32
    carr_freq = np.zeros(n)
    code_phase = np.zeros(n, np.int64)
    peak_metric = np.zeros(n)
    for i, prn in enumerate(config.acq_satellite_list):
        carr_freq[prn - 1] = out[0][i]
        code_phase[prn - 1] = out[1][i]
        peak_metric[prn - 1] = out[2][i]
    return AcquisitionResults(carr_freq, code_phase, peak_metric)


def assign_channels(config: ReceiverConfig, acq: AcquisitionResults) -> Channels:
    """Allocate the strongest acquired PRNs to tracking channels.

    Sorts by peak metric descending and fills up to number_of_channels
    (reference: acquisition.py:276-305).
    """
    c = config.number_of_channels
    prn = np.zeros(c, np.int64)
    freq = np.zeros(c)
    phase = np.zeros(c, np.int64)
    status = ["-"] * c

    order = np.argsort(-acq.peak_metric, kind="stable")
    n_active = min(c, int(acq.acquired.sum()))
    for i in range(n_active):
        p = order[i]
        prn[i] = p + 1
        freq[i] = acq.carr_freq[p]
        phase[i] = acq.code_phase[p]
        status[i] = "T"
    return Channels(prn, freq, phase, status)


def format_channel_status(config: ReceiverConfig, channels: Channels) -> str:
    """ASCII channel table (reference: acquisition.py:308-336)."""
    bar = "*=========*=====*===============*===========*=============*========*"
    lines = [bar,
             "| Channel | PRN |   Frequency   |  Doppler  | Code Offset | Status |",
             bar]
    for i in range(len(channels)):
        if channels.status[i] != "-":
            lines.append("|      %2d | %3d |  %2.5e |   %5.0f   |    %6d   |     %1s  |" % (
                i, channels.prn[i], channels.acquired_freq[i],
                channels.acquired_freq[i] - config.intermediate_freq,
                channels.code_phase[i], channels.status[i]))
        else:
            lines.append("|      %2d | --- |  ------------ |   -----   |    ------   |   Off  |" % i)
    lines.append(bar)
    return "\n".join(lines)
