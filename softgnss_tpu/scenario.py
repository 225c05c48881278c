"""Golden scenario builder: truth geometry -> ephemerides -> IF capture.

The reference ships no test recordings (its golden inputs are unpublished
textbook files, reference: initialize.py:99, main.py:60), so the framework
establishes correctness closed-loop (SURVEY.md §4): pick a receiver
position and a satellite constellation, derive per-ms light times from the
SAME broadcast-orbit model the receiver inverts, encode real nav subframes,
and synthesize a geometry-consistent int8 IF capture.  A correct receiver
must then acquire every satellite, track it, decode its ephemeris, and
produce PVT fixes at the injected position.

Simplifications (each is exercised separately in unit tests):
* satellite clock terms a_f0/a_f1/a_f2/T_GD are zero and orbits are
  circular (e=0), so satellite clock corrections are exactly zero and the
  only receiver-side unknowns are position + receiver clock;
* the receiver is static and its clock drift-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from softgnss_tpu.config import ReceiverConfig
from softgnss_tpu.nav.geodesy import geo2cart, topocent
from softgnss_tpu.nav.message import Ephemeris, build_nav_stream
from softgnss_tpu.nav.orbit import GM, OMEGA_E_DOT
from softgnss_tpu.nav.pvt import SPEED_OF_LIGHT
from softgnss_tpu.signals.synth import synthesize_dynamic

_W_SAGNAC = 7.292115147e-5   # e_r_corr's rotation rate (geoFunctions:509)


def circular_ephemeris(sqrt_a: float = 5153.8, i_0: float = 0.96,
                       omega_0: float = 0.0, m_0: float = 0.0,
                       t_oe: float = 0.0, iod: int = 1) -> Ephemeris:
    """Zero-eccentricity, zero-harmonics, zero-clock broadcast ephemeris."""
    return Ephemeris(
        week_number=2000, accuracy=0, health=0, t_gd=0.0, iodc=iod,
        t_oc=t_oe, a_f0=0.0, a_f1=0.0, a_f2=0.0,
        iode_sf2=iod, c_rs=0.0, delta_n=0.0, m_0=m_0, c_uc=0.0, e=0.0,
        c_us=0.0, sqrt_a=sqrt_a, t_oe=t_oe, c_ic=0.0, omega_0=omega_0,
        c_is=0.0, i_0=i_0, c_rc=0.0, omega=0.0, omega_dot=0.0,
        iode_sf3=iod, i_dot=0.0,
    )


def propagate_circular(eph: Ephemeris, t: np.ndarray) -> np.ndarray:
    """ECEF positions (3, T) of a circular-orbit ephemeris at GPS times t.

    Closed form (e=0 makes the Kepler solve the identity); independent of
    the receiver's jitted propagator, so scenario truth and receiver code
    cannot share a bug.
    """
    t = np.asarray(t, np.float64)
    a = eph.sqrt_a**2
    tk = t - eph.t_oe
    n = np.sqrt(GM / a**3) + eph.delta_n
    u = eph.m_0 + n * tk + eph.omega
    inc = eph.i_0 + eph.i_dot * tk
    node = eph.omega_0 + (eph.omega_dot - OMEGA_E_DOT) * tk - OMEGA_E_DOT * eph.t_oe
    x_orb, y_orb = a * np.cos(u), a * np.sin(u)
    x = x_orb * np.cos(node) - y_orb * np.cos(inc) * np.sin(node)
    y = x_orb * np.sin(node) + y_orb * np.cos(inc) * np.cos(node)
    z = y_orb * np.sin(inc)
    return np.stack([x, y, z])


def light_times(rx_ecef: np.ndarray, eph: Ephemeris, t_tx: np.ndarray) -> np.ndarray:
    """Signal flight times with Sagnac rotation — the model the PVT inverts.

    ``t_tx``: transmit times (the receiver's satpos is also evaluated at
    transmit time).
    """
    pos = propagate_circular(eph, t_tx)
    tau = np.full(pos.shape[1], 0.07)
    for _ in range(4):
        ang = _W_SAGNAC * tau
        rot = np.stack([np.cos(ang) * pos[0] + np.sin(ang) * pos[1],
                        -np.sin(ang) * pos[0] + np.cos(ang) * pos[1],
                        pos[2]])
        tau = np.linalg.norm(rot - rx_ecef[:, None], axis=0) / SPEED_OF_LIGHT
    return tau


@dataclass
class Scenario:
    """Injected truth for a full-receiver closed-loop run."""

    config: ReceiverConfig
    receiver_ecef: np.ndarray            # (3,)
    prns: list[int]
    ephemerides: list[Ephemeris]
    tow_count: int                       # Z-count of the first in-capture subframe
    t_rx0: float                         # GPS time at capture sample 0
    noise_std: float = 1.5
    amplitude: float = 1.0
    #: optional (S, n_ms) per-ms amplitude envelope overriding ``amplitude``
    #: (e.g. zero a row's tail to kill a satellite mid-capture and exercise
    #: the receiver's lock-loss demotion)
    amplitude_ms: np.ndarray = field(default=None, repr=False)
    delays: np.ndarray = field(default=None, repr=False)     # (S, n_ms+1) s
    dopplers: np.ndarray = field(default=None, repr=False)   # (S,) Hz at t_rx0

    @property
    def t_bits0(self) -> float:
        """Transmit time of bit 0 (one subframe of history before tow_count)."""
        return (self.tow_count - 1) * 6.0

    def expected_code_phase(self, i: int) -> float:
        """Acquisition code phase (samples) of satellite i at capture start."""
        cfg = self.config
        fc = cfg.code_freq_basis
        chips = fc * (self.t_rx0 - self.delays[i, 0] - self.t_bits0)
        frac = np.ceil(chips / cfg.code_length) * cfg.code_length - chips
        return float(frac / fc * cfg.sampling_freq)

    def expected_carrier_freq(self, i: int) -> float:
        return float(self.config.intermediate_freq + self.dopplers[i])


def build_scenario(config: ReceiverConfig, n_sats: int = 5,
                   latitude: float = 47.0, longitude: float = 8.5,
                   height: float = 500.0, tow_count: int = 70000,
                   noise_std: float = 1.5, amplitude: float = 1.0,
                   min_elevation: float = 20.0, seed: int = 11,
                   sync_offset_s: float = 0.35) -> Scenario:
    """Construct a consistent scenario with n_sats visible satellites.

    The capture starts ``sync_offset_s`` before the arrival of subframe
    ``tow_count``, so the first confirmed preamble lands early in tracking.
    """
    rx = np.asarray(geo2cart(np.array([latitude, 0, 0]),
                             np.array([longitude, 0, 0]), height, 4))
    t0 = tow_count * 6.0
    rng = np.random.default_rng(seed)

    ephs, prns = [], []
    trial = 0
    while len(ephs) < n_sats and trial < 500:
        trial += 1
        eph = circular_ephemeris(
            i_0=float(rng.uniform(0.8, 1.1)),
            omega_0=float(rng.uniform(0, 2 * np.pi)),
            m_0=float(rng.uniform(0, 2 * np.pi)),
            t_oe=t0, iod=len(ephs) + 1,
        )
        pos = propagate_circular(eph, np.asarray([t0]))[:, 0]
        _, el, _ = topocent(rx, pos - rx)
        if float(el) > min_elevation:
            ephs.append(eph)
            prns.append(len(ephs))  # PRNs 1..n, distinct
    if len(ephs) < n_sats:
        raise RuntimeError("scenario generation failed to place satellites")

    t_rx0 = t0 - sync_offset_s
    return Scenario(config=config, receiver_ecef=rx, prns=prns,
                    ephemerides=ephs, tow_count=tow_count, t_rx0=t_rx0,
                    noise_std=noise_std, amplitude=amplitude)


def synthesize_scenario(scenario: Scenario, n_ms: int, seed: int = 0) -> np.ndarray:
    """int8 IF capture of ``n_ms`` milliseconds for the scenario.

    Also fills ``scenario.delays``/``scenario.dopplers`` with the truth
    tables used (for assertions against receiver output).
    """
    cfg = scenario.config
    s = len(scenario.prns)
    t_bounds = scenario.t_rx0 + 1e-3 * np.arange(n_ms + 1)

    delays = np.empty((s, n_ms + 1))
    for i, eph in enumerate(scenario.ephemerides):
        # solve tau(t_rx): receive-time grid -> iterate transmit time
        tau = np.full(n_ms + 1, 0.07)
        for _ in range(3):
            tau = light_times(scenario.receiver_ecef, eph, t_bounds - tau)
        delays[i] = tau
    scenario.delays = delays
    scenario.dopplers = -cfg.l1_freq * (delays[:, 1] - delays[:, 0]) * 1000.0

    n_subframes = int(np.ceil((scenario.t_rx0 - scenario.t_bits0 + n_ms / 1000.0) / 6.0)) + 2
    streams = np.stack([
        build_nav_stream(eph, scenario.tow_count - 1, n_subframes)
        for eph in scenario.ephemerides
    ]).astype(np.float32)

    if scenario.amplitude_ms is not None:
        amps = np.empty((s, n_ms), np.float32)
        env = np.asarray(scenario.amplitude_ms, np.float32)
        k = min(env.shape[1], n_ms)
        amps[:, :k] = env[:, :k]
        amps[:, k:] = env[:, -1:]                           # edge hold
    else:
        amps = np.full(s, scenario.amplitude, np.float32)
    return synthesize_dynamic(
        cfg, scenario.prns, delays, streams,
        scenario.t_rx0 - scenario.t_bits0, n_ms,
        amplitudes=amps,
        phase0=np.linspace(0.0, 5.0, s),
        noise_std=scenario.noise_std, seed=seed)
