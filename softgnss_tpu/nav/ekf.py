"""Extended Kalman filter navigation: PV + clock states across epochs.

The reference (and this framework's default) solves every measurement
epoch independently by least squares (reference geoFunctions:636-739) —
each fix forgets the last, epochs with fewer than 4 usable satellites
produce nothing, and code noise passes straight into the trajectory.
``config.nav_filter='ekf'`` runs this 8-state filter over the epoch scan
instead:

    x = [p (3, ECEF m), v (3, m/s), cdt (clock bias, m), cddt (drift, m/s)]

* **Dynamics**: constant-velocity + clock-drift random walk;
  discrete white-noise-acceleration process noise
  (``ekf_accel_psd`` m^2/s^3 per axis, ``ekf_clock_psd`` for the drift).
* **Measurements**: per satellite, the corrected pseudorange
  (Sagnac-rotated geometry + troposphere + optional Klobuchar, the SAME
  model as the least-squares solver in nav.pvt) and the carrier-Doppler
  range rate.  Updates are SEQUENTIAL scalar Kalman steps (no matrix
  inversion — one division per measurement, Joseph-form covariance), so
  masking a satellite is just a zero gain: epochs with 1-3 usable
  satellites still update the filter instead of being discarded.
* **Innovation gating**: measurements whose innovation exceeds
  ``ekf_gate_sigma`` standard deviations of the predicted innovation
  variance are skipped — a per-measurement outlier guard on top of the
  epoch-level RAIM in nav.solve (the filter runs on the post-RAIM,
  post-lock-demotion mask).

The filter runs inside the same ``lax.scan`` as the least-squares solve
(nav.solve._epoch_scan) with its (x, P, initialized) state in the scan
carry; the first successful LS fix initializes it.  One pseudorange
subtlety: the LS path re-floors the common travel-time offset per epoch
(reference postNavigation.py:64-71), which steps the solved clock bias
by whole milliseconds when the minimum travel time crosses an integer —
harmless for memoryless LS, fatal for a filter modeling clock bias as
continuous.  The EKF therefore consumes pseudoranges anchored at the
FIRST epoch's offset; its cdt differs from the LS dt by that constant
(plus any per-epoch re-floor steps), and the reported positions are
unaffected.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from softgnss_tpu.nav.atmosphere import tropo
from softgnss_tpu.nav.geodesy import e_r_corr, topocent

SPEED_OF_LIGHT = 299792458.0
N_STATES = 8


class EkfState(NamedTuple):
    """Filter state carried across measurement epochs (all f64)."""

    x: jnp.ndarray      # (8,) [px py pz vx vy vz cdt cddt]
    p: jnp.ndarray      # (8, 8) covariance
    init: jnp.ndarray   # bool: has the filter been initialized?


def initial_ekf_state() -> EkfState:
    return EkfState(x=jnp.zeros(N_STATES, jnp.float64),
                    p=jnp.eye(N_STATES, dtype=jnp.float64),
                    init=jnp.bool_(False))


def _transition(t: float):
    """(F, Q): constant-velocity dynamics over t seconds with
    white-noise-acceleration process noise (set in ekf_epoch)."""
    f = jnp.eye(N_STATES, dtype=jnp.float64)
    f = f.at[0, 3].set(t).at[1, 4].set(t).at[2, 5].set(t).at[6, 7].set(t)
    return f


def _wna_q(t: float, q_accel: float, q_clock: float, q_bias: float):
    """Discrete white-noise-acceleration Q for the [pos, vel] pairs and
    the [bias, drift] pair."""
    t2, t3 = t * t, t * t * t
    q = jnp.zeros((N_STATES, N_STATES), jnp.float64)
    for i in range(3):
        q = (q.at[i, i].set(q_accel * t3 / 3.0)
              .at[i, i + 3].set(q_accel * t2 / 2.0)
              .at[i + 3, i].set(q_accel * t2 / 2.0)
              .at[i + 3, i + 3].set(q_accel * t))
    q = (q.at[6, 6].set(q_clock * t3 / 3.0 + q_bias * t)
          .at[6, 7].set(q_clock * t2 / 2.0)
          .at[7, 6].set(q_clock * t2 / 2.0)
          .at[7, 7].set(q_clock * t))
    return q


def _scalar_update(x, p, h, innov, r, use):
    """One masked scalar Kalman update (Joseph form).

    h: (8,) measurement row; innov: z - h(x) scalar; r: variance;
    use: bool — False leaves (x, p) untouched."""
    ph = p @ h                                        # (8,)
    s = h @ ph + r
    k = jnp.where(use, ph / s, jnp.zeros_like(ph))
    x_new = x + k * innov
    ikh = jnp.eye(N_STATES, dtype=jnp.float64) - jnp.outer(k, h)
    p_new = ikh @ p @ ikh.T + r * jnp.outer(k, k)
    return x_new, p_new


@partial(jax.jit, static_argnums=(6,))
def ekf_epoch(state: EkfState, sat_pos, sat_vel, pr_obs, rr_obs, mask,
              use_trop: bool, iono_tow=None, *,
              t_step: float, q_accel: float, q_clock: float,
              q_bias: float, r_pr: float, r_rr: float, gate: float,
              ls_pos=None, ls_ok=None, ls_vel=None):
    """Predict + update over one epoch's satellite set.

    sat_pos/sat_vel: (S, 3) ECEF m, m/s (at transmit time); pr_obs: (S,)
    corrected pseudoranges (satellite clock applied, FIXED common travel
    offset — module docstring); rr_obs: (S,) corrected range rates
    (-lambda*doppler + c*sat_clock_drift); mask: (S,) usable satellites.
    ``ls_pos``/``ls_ok``: this epoch's least-squares solution [x y z dt],
    used once to initialize the filter.

    Returns (new_state, (pos_ecef (3,), vel (3,), cdt, cddt, used))
    where ``used`` counts accepted pseudorange updates; outputs are NaN
    until the filter initializes.
    """
    s_count = sat_pos.shape[0]

    # --- initialize from the first valid LS fix ------------------------------
    # covariance matches a cold single-epoch fix (tens of meters under
    # poor DOP), so the first few epochs' measurements can pull the state
    # quickly; velocity/drift seed from the LS Doppler solution when given
    def do_init(_):
        x0 = jnp.zeros(N_STATES, jnp.float64)
        x0 = x0.at[0:3].set(ls_pos[:3]).at[6].set(ls_pos[3])
        if ls_vel is not None:
            v_ok = jnp.all(jnp.isfinite(ls_vel))
            x0 = x0.at[3:6].set(jnp.where(v_ok, ls_vel[:3], 0.0))
            x0 = x0.at[7].set(jnp.where(v_ok, ls_vel[3], 0.0))
        p0 = jnp.diag(jnp.asarray(
            [2500.0, 2500.0, 2500.0, 900.0, 900.0, 900.0, 1e6, 1e4],
            jnp.float64))
        return EkfState(x=x0, p=p0, init=jnp.bool_(True))

    can_init = (ls_pos is not None and ls_ok is not None)
    just_init = jnp.bool_(False)
    if can_init:
        just_init = jnp.logical_and(~state.init, ls_ok)
        state = jax.lax.cond(just_init, do_init, lambda _: state, None)

    # --- predict (skipped at the init epoch: the seed already reflects
    # --- THIS epoch's measurements; a predict would double-propagate) --------
    f = _transition(t_step)
    q = _wna_q(t_step, q_accel, q_clock, q_bias)
    x = jnp.where(just_init, state.x, f @ state.x)
    p = jnp.where(just_init, state.p, f @ state.p @ f.T + q)

    # --- measurement geometry at the predicted position ----------------------
    rho0 = jnp.linalg.norm(sat_pos - x[:3], axis=-1)
    rot_x = e_r_corr(rho0 / SPEED_OF_LIGHT, sat_pos)   # Sagnac
    diff = rot_x - x[:3]
    rho = jnp.linalg.norm(diff, axis=-1)
    e_los = diff / jnp.maximum(rho, 1.0)[:, None]
    az, el, _ = topocent(x[:3], diff)
    if use_trop:
        atm = tropo(jnp.sin(jnp.deg2rad(el)))
    else:
        atm = jnp.zeros(s_count)
    if iono_tow is not None:
        from softgnss_tpu.nav.geodesy import cart2geo
        from softgnss_tpu.nav.iono import klobuchar

        iono8, tow = iono_tow
        lat, lon, _h = cart2geo(x[0], x[1], x[2], 4)
        atm = atm + SPEED_OF_LIGHT * klobuchar(iono8, lat, lon, az, el, tow)

    # --- sequential scalar updates -------------------------------------------
    use_any = state.init
    used = jnp.int32(0)
    for i in range(s_count):
        # pseudorange: z = rho + cdt + atm.  Inactive channels carry inf
        # pseudoranges (nav.solve fills travel=inf outside the active
        # set): the innovation must be zeroed, not just gain-masked —
        # 0 * inf = NaN would poison the whole state vector.
        h_pr = jnp.concatenate([-e_los[i], jnp.zeros(3),
                                jnp.ones(1), jnp.zeros(1)])
        innov = pr_obs[i] - (rho[i] + x[6] + atm[i])
        fin = jnp.isfinite(innov)
        innov = jnp.where(fin, innov, 0.0)
        s_pr = h_pr @ (p @ h_pr) + r_pr * r_pr
        ok = use_any & mask[i] & fin & (innov * innov < gate * gate * s_pr)
        x, p = _scalar_update(x, p, h_pr, innov, r_pr * r_pr, ok)
        used = used + ok.astype(jnp.int32)
        # range rate: z = e.(v_sat - v) + cddt
        h_rr = jnp.concatenate([jnp.zeros(3), -e_los[i],
                                jnp.zeros(1), jnp.ones(1)])
        z_pred = e_los[i] @ sat_vel[i] - e_los[i] @ x[3:6] + x[7]
        innov_r = rr_obs[i] - z_pred
        finite = jnp.isfinite(innov_r)
        s_rr = h_rr @ (p @ h_rr) + r_rr * r_rr
        ok_r = (use_any & mask[i] & finite
                & (innov_r * innov_r < gate * gate * s_rr))
        x, p = _scalar_update(x, p, h_rr,
                              jnp.where(finite, innov_r, 0.0),
                              r_rr * r_rr, ok_r)

    new_state = EkfState(x=jnp.where(state.init, x, state.x),
                         p=jnp.where(state.init, p, state.p),
                         init=state.init)
    nan = jnp.float64(jnp.nan)
    pos_out = jnp.where(state.init, new_state.x[0:3], nan)
    vel_out = jnp.where(state.init, new_state.x[3:6], nan)
    cdt = jnp.where(state.init, new_state.x[6], nan)
    cddt = jnp.where(state.init, new_state.x[7], nan)
    return new_state, (pos_out, vel_out, cdt, cddt, used)
