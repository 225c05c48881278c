"""Static correlator tables for the gather-free tracking hot path.

TPU gathers with data-dependent indices are ~40x the cost of everything
else in the tracking step combined (the reference-style per-sample code
lookup, tracking.py:166-190, becomes three 38k-element gathers per ms).
The tracker instead contracts a *narrow one-hot* of the half-chip index
against small per-tile code tables — pure elementwise + batched-matmul
ops that XLA fuses and the MXU executes:

* Half-chip index ``h = ceil(2 * tq)`` encodes all three correlator taps
  at once: with integer h, ``ceil(tq) = (h+1)//2``, ``ceil(tq-1/2) =
  h//2``, ``ceil(tq+1/2) = h//2 + 1`` — so one index stream drives
  early/prompt/late through three precomputed half-chip code tables.
* Within a ``track_tile``-sample tile, h spans only ~``2*tile*chips_per
  _sample`` values, and its offset from a *nominal* per-tile base (chip
  rate from acquisition Doppler) is bounded by the DLL pull-in range; so
  ``h_local = h - h_base(tile)`` fits in a static window of width
  ``onehot_width`` and the contraction is against statically-gathered
  per-tile code slices.

The correlator outputs are numerically the same sums as the gather
formulation (f32 accumulation order differs; parity vs the float64
oracle stays under the 1e-3 RMS budget, tests/test_tracking.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.signals import ca


class CorrelatorTables(NamedTuple):
    """Per-channel static tables (leading axis = channels)."""

    #: (C, 1025) padded code chips (for the exact-gather fallback path)
    code_pads: np.ndarray
    #: (C, n_tiles, onehot_width, 3) E/P/L code values per tile-local half-chip
    codes_static: np.ndarray
    #: (C, n_tiles) nominal half-chip index at each tile start, minus margin
    h_base: np.ndarray


#: margin half-chips above/below a tile's nominal span.  Bound: remainder
#: phase contributes < 2*step (~0.05), the ceil/floor offsets < 2, and
#: code-rate drift vs the table nominal < 2*(5 Hz/fs)*window (~0.01) — a
#: +-2 offset with +5 width headroom covers all of it several times over.
_H_OFFSET = 2
_H_MARGIN = 5


def onehot_width(config: ReceiverConfig) -> int:
    """Static width of the tile-local half-chip window."""
    per_tile = 2.0 * config.track_tile * config.code_freq_basis / config.sampling_freq
    w = int(np.ceil(per_tile)) + _H_MARGIN
    return (w + 7) // 8 * 8


def n_tiles(config: ReceiverConfig) -> int:
    return config.track_window // config.track_tile


def _half_chip_tables(code_pad: np.ndarray) -> np.ndarray:
    """(n_half, 3) E/P/L code values indexed by half-chip index h.

    code_pad is the 1025-chip padded code (pad[i] = chip i-1); entries are
    E[h] = pad[h//2], P[h] = pad[(h+1)//2], L[h] = pad[h//2+1], clamped at
    the table edges (out-of-range h only occurs on masked samples).
    """
    n_half = 2 * 1023 + 32
    h = np.arange(n_half)
    e = code_pad[np.clip(h // 2, 0, 1024)]
    p = code_pad[np.clip((h + 1) // 2, 0, 1024)]
    late = code_pad[np.clip(h // 2 + 1, 0, 1024)]
    return np.stack([e, p, late], axis=1).astype(np.float32)


def build_tables(config: ReceiverConfig, prns: np.ndarray,
                 acquired_freq: np.ndarray | None = None) -> CorrelatorTables:
    """Build correlator tables for a channel set.

    ``prns``: (C,) 1-based PRNs (0 = idle channel -> zero tables);
    ``acquired_freq``: (C,) acquisition carrier frequencies, used for the
    Doppler-consistent nominal chip rate that centers each tile's window
    (None -> the nominal IF; the window margin covers any L1 Doppler).
    """
    c = len(prns)
    tile = config.track_tile
    t_count = n_tiles(config)
    w = onehot_width(config)

    code_pads = np.zeros((c, 1025), np.float32)
    codes_static = np.zeros((c, t_count, w, 3), np.float32)
    h_base = np.zeros((c, t_count), np.int64)

    t_idx = np.arange(t_count)
    for i in range(c):
        if prns[i] <= 0:
            continue
        pad = ca.padded_code(int(prns[i])).astype(np.float32)
        code_pads[i] = pad
        half = _half_chip_tables(pad)                      # (n_half, 3)
        doppler = (0.0 if acquired_freq is None
                   else acquired_freq[i] - config.intermediate_freq)
        fc_eff = config.code_freq_basis * (1.0 + doppler / config.l1_freq)
        s_chips = fc_eff / config.sampling_freq            # chips per sample
        base = np.floor(2.0 * s_chips * tile * t_idx).astype(np.int64) - _H_OFFSET
        h_base[i] = base
        idx = base[:, None] + np.arange(w)[None, :]        # (T, w)
        codes_static[i] = half[np.clip(idx, 0, len(half) - 1)]
    return CorrelatorTables(code_pads, codes_static, h_base)
