"""Acquisition assistance from a prior ephemeris set (warm start).

With ephemerides (a previous run's decode or ``message.load_ephemerides``),
an approximate receiver position, and approximate GPS time, each visible
satellite's Doppler is predictable to a few Hz — far tighter than the
+-7 kHz cold-search band.  ``predict_doppler`` feeds
``acquire.acquire(doppler_hints=...)``, which then restricts each hinted
PRN's peak search to a narrow Doppler window (the reference has no
assisted mode; its search is always the full band, acquisition.py:92-133).

Caveat: the measured Doppler also carries the front-end oscillator offset
(common to all PRNs).  If it is known, add it to the hints; if unknown
and potentially larger than the hint half-width, widen
``hint_halfwidth_hz`` to cover it.
"""

from __future__ import annotations

import numpy as np

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.nav.message import Ephemeris
from softgnss_tpu.nav.orbit import satellite_positions


def predict_doppler(config: ReceiverConfig, ephemerides: list[Ephemeris | None],
                    rx_ecef: np.ndarray, tow: float,
                    dt: float = 0.5) -> np.ndarray:
    """(32,) predicted absolute carrier frequencies (IF + Doppler), NaN
    where no complete ephemeris is supplied.

    Range rate is a central finite difference of the broadcast orbit over
    ``dt`` seconds (the reference's satpos math, geoFunctions:819-885);
    Doppler = -range_rate / c * f_L1.
    """
    out = np.full(32, np.nan)
    idx = [i for i, e in enumerate(ephemerides[:32])
           if e is not None and e.complete]
    if not idx:
        return out
    ephs = [ephemerides[i] for i in idx]
    pos_a, _ = satellite_positions(tow - dt / 2, ephs)      # (3, S)
    pos_b, _ = satellite_positions(tow + dt / 2, ephs)
    rx = np.asarray(rx_ecef, np.float64).reshape(3, 1)
    r_a = np.linalg.norm(pos_a - rx, axis=0)
    r_b = np.linalg.norm(pos_b - rx, axis=0)
    range_rate = (r_b - r_a) / dt                           # m/s, + = receding
    doppler = -range_rate / config.speed_of_light * config.l1_freq
    out[np.asarray(idx)] = config.intermediate_freq + doppler
    return out
