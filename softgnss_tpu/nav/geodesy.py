"""Geodetic / topocentric coordinate library (jnp, float64, jit-friendly).

Capability parity with reference geoFunctions/__init__.py: cart2geo,
geo2cart, togeod, topocent, cart2utm (with clsin/clksin Clenshaw series),
find_utm_zone, e_r_corr, deg2dms, dms2mat.  All iterative solvers use
*fixed* iteration counts chosen to exceed the reference's tolerances
(1e-12 in cart2geo, 1e-4 m in cart2utm, 1e-10 in togeod) — data-dependent
``while`` exits don't exist inside jitted programs, and these fixed-point
iterations converge quadratically, so a fixed cap is both faster and exact
to f64 roundoff.

Functions accept scalars or batched arrays (last-axis vectors where noted);
everything is differentiable and vmappable.

Documented divergence: the reference's dms2mat is dead code with a
list-assignment crash and a string-repetition bug ('%2.10f' % x * 100,
geoFunctions:457-480); ours implements the documented contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

#: reference ellipsoids: semi-major axis a (m), flattening f
#: 0: International 1924, 1: International 1967, 2: WGS-72, 3: GRS-80,
#: 4: WGS-84 (reference: geoFunctions:26-28; the reference calls cart2geo
#: with i=4 == GRS-80 in its 0-based table -- postNavigation.py:254)
ELLIPSOIDS_A = (6378388.0, 6378160.0, 6378135.0, 6378137.0, 6378137.0)
ELLIPSOIDS_F = (1 / 297.0, 1 / 298.247, 1 / 298.26, 1 / 298.257222101,
                1 / 298.257223563)

_OMEGA_E_DOT_ROT = 7.292115147e-5  # e_r_corr's constant (geoFunctions:509)


def cart2geo(x, y, z, ellipsoid: int = 4):
    """ECEF -> geodetic (lat deg, lon deg, height m) on a selected ellipsoid.

    Fixed 30 iterations of the reference's height/latitude fixed point
    (tolerance 1e-12, reference: geoFunctions:7-77).
    """
    a = ELLIPSOIDS_A[ellipsoid]
    f = ELLIPSOIDS_F[ellipsoid]
    x, y, z = (jnp.asarray(v, jnp.float64) for v in (x, y, z))

    lam = jnp.arctan2(y, x)
    ex2 = (2 - f) * f / (1 - f) ** 2
    c = a * jnp.sqrt(1 + ex2)
    p = jnp.sqrt(x**2 + y**2)
    # the reference's (buggy-looking but harmless) initial guess
    # phi = atan(z / (p * (1-(2-f)) * f)) is just a starting point; use the
    # standard spherical first guess, which the fixed point also corrects
    phi = jnp.arctan2(z, p * (1 - (2 - f) * f))

    def body(_, carry):
        phi, h = carry
        n = c / jnp.sqrt(1 + ex2 * jnp.cos(phi) ** 2)
        phi = jnp.arctan(z / (p * (1 - (2 - f) * f * n / (n + h))))
        return phi, p / jnp.cos(phi) - n

    phi, h = jax.lax.fori_loop(0, 30, body, (phi, jnp.full_like(phi, 0.1)))
    return jnp.rad2deg(phi), jnp.rad2deg(lam), h


def geo2cart(phi_dms, lam_dms, h, ellipsoid: int = 4):
    """Geodetic ([deg, min, sec] each) -> ECEF (reference: geoFunctions:578-632)."""
    phi_dms = jnp.asarray(phi_dms, jnp.float64)
    lam_dms = jnp.asarray(lam_dms, jnp.float64)
    b = jnp.deg2rad(phi_dms[0] + phi_dms[1] / 60.0 + phi_dms[2] / 3600.0)
    l = jnp.deg2rad(lam_dms[0] + lam_dms[1] / 60.0 + lam_dms[2] / 3600.0)
    a = ELLIPSOIDS_A[ellipsoid]
    f = ELLIPSOIDS_F[ellipsoid]
    ex2 = (2 - f) * f / (1 - f) ** 2
    c = a * jnp.sqrt(1 + ex2)
    n = c / jnp.sqrt(1 + ex2 * jnp.cos(b) ** 2)
    return ((n + h) * jnp.cos(b) * jnp.cos(l),
            (n + h) * jnp.cos(b) * jnp.sin(l),
            ((1 - f) ** 2 * n + h) * jnp.sin(b))


def togeod(a, finv, x, y, z):
    """ECEF -> geodetic (lat deg, lon deg in [0,360), height) for arbitrary
    ellipsoid (a, 1/f) — Goad's iteration, fixed 10 steps (the reference's
    cap, geoFunctions:892-997)."""
    x, y, z = (jnp.asarray(v, jnp.float64) for v in (x, y, z))
    esq = jnp.where(finv < 1e-20, 0.0, (2 - 1 / finv) / finv)
    oneesq = 1 - esq
    p = jnp.sqrt(x**2 + y**2)
    lon = jnp.where(p > 1e-20, jnp.rad2deg(jnp.arctan2(y, x)), 0.0)
    lon = jnp.where(lon < 0, lon + 360.0, lon)
    r = jnp.sqrt(p**2 + z**2)
    sinphi = jnp.where(r > 1e-20, z / jnp.maximum(r, 1e-300), 0.0)
    phi = jnp.arcsin(sinphi)
    h = r - a * (1 - sinphi * sinphi / finv)

    def body(_, carry):
        phi, h = carry
        s, cphi = jnp.sin(phi), jnp.cos(phi)
        n_phi = a / jnp.sqrt(1 - esq * s * s)
        dp = p - (n_phi + h) * cphi
        dz = z - (n_phi * oneesq + h) * s
        return phi + (cphi * dz - s * dp) / (n_phi + h), h + s * dz + cphi * dp

    phi, h = jax.lax.fori_loop(0, 10, body, (phi, h))
    return jnp.rad2deg(phi), lon, h


def topocent(origin_ecef, dx):
    """ECEF delta-vector -> (azimuth deg, elevation deg, distance) at origin.

    ``origin_ecef``/``dx``: (..., 3).  WGS-84 ENU rotation, math per
    reference geoFunctions:1003-1062.
    """
    origin_ecef = jnp.asarray(origin_ecef, jnp.float64)
    dx = jnp.asarray(dx, jnp.float64)
    phi, lam, _ = togeod(6378137.0, 298.257223563,
                         origin_ecef[..., 0], origin_ecef[..., 1], origin_ecef[..., 2])
    cl, sl = jnp.cos(jnp.deg2rad(lam)), jnp.sin(jnp.deg2rad(lam))
    cb, sb = jnp.cos(jnp.deg2rad(phi)), jnp.sin(jnp.deg2rad(phi))
    e = -sl * dx[..., 0] + cl * dx[..., 1]
    n = -sb * cl * dx[..., 0] - sb * sl * dx[..., 1] + cb * dx[..., 2]
    u = cb * cl * dx[..., 0] + cb * sl * dx[..., 1] + sb * dx[..., 2]
    hor = jnp.sqrt(e**2 + n**2)
    az = jnp.where(hor < 1e-20, 0.0, jnp.rad2deg(jnp.arctan2(e, n)))
    el = jnp.where(hor < 1e-20, 90.0, jnp.rad2deg(jnp.arctan2(u, hor)))
    az = jnp.where(az < 0, az + 360.0, az)
    return az, el, jnp.linalg.norm(dx, axis=-1)


def e_r_corr(travel_time, x_sat):
    """Earth-rotation (Sagnac) correction of satellite ECEF during signal
    flight (reference: geoFunctions:491-521).  ``x_sat``: (..., 3)."""
    x_sat = jnp.asarray(x_sat, jnp.float64)
    w = _OMEGA_E_DOT_ROT * jnp.asarray(travel_time, jnp.float64)
    cw, sw = jnp.cos(w), jnp.sin(w)
    return jnp.stack([cw * x_sat[..., 0] + sw * x_sat[..., 1],
                      -sw * x_sat[..., 0] + cw * x_sat[..., 1],
                      x_sat[..., 2]], axis=-1)


# --- UTM (transverse Mercator on International 1924 / ED50) -----------------

def clsin(coeffs, argument):
    """Clenshaw summation sum_k coeffs[k-1] sin(k*argument)
    (reference: geoFunctions:84-111)."""
    cos_arg = 2 * jnp.cos(argument)
    hr1 = jnp.zeros_like(cos_arg)
    hr = jnp.zeros_like(cos_arg)
    for t in range(len(coeffs), 0, -1):
        hr2 = hr1
        hr1 = hr
        hr = coeffs[t - 1] + cos_arg * hr1 - hr2
    return hr * jnp.sin(argument)


def clksin(coeffs, arg_real, arg_imag):
    """Clenshaw summation of sin with complex argument; returns (re, im)
    (reference: geoFunctions:118-172)."""
    sr, cr = jnp.sin(arg_real), jnp.cos(arg_real)
    shi, chi = jnp.sinh(arg_imag), jnp.cosh(arg_imag)
    r = 2 * cr * chi
    i = -2 * sr * shi
    hr1 = hr = hi1 = hi = jnp.zeros_like(r)
    for t in range(len(coeffs), 0, -1):
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        hr = coeffs[t - 1] + r * hr1 - i * hi - hr2
        hi = i * hr1 + r * hi1 - hi2
    rr = sr * chi
    ii = cr * shi
    return rr * hr - ii * hi, rr * hi + ii * hr


#: trig-series coefficients for f = 1/297 (reference: geoFunctions:319-325)
_UTM_GTU = (0.000841275991, 7.67306686e-07, 1.2129123e-09, 2.48508228e-12)
_UTM_BG = (-0.00337077907, 4.73444769e-06, -8.2991457e-09, 1.5878533e-11)


def cart2utm(x, y, z, zone):
    """ITRF ECEF -> (E, N, U) in UTM ``zone`` on ED50/International 1924,
    including the reference's 7-parameter-ish datum shift
    (reference: geoFunctions:176-372)."""
    a = 6378388.0
    f = 1.0 / 297.0
    ex2 = (2 - f) * f / (1 - f) ** 2
    c = a * jnp.sqrt(1 + ex2)

    x, y, z = (jnp.asarray(v, jnp.float64) for v in (x, y, z))
    # ITRF96 -> ED50-ish datum: Z shift, tiny rotation, scale, translation
    vx = x - 7.56e-7 * y
    vy = 7.56e-7 * x + y
    vz = z - 4.5
    scale = 0.9999988
    v = jnp.stack([scale * vx + 89.5, scale * vy + 93.8, scale * vz + 127.6])

    lon = jnp.arctan2(v[1], v[0])
    p = jnp.sqrt(v[0] ** 2 + v[1] ** 2)
    n1 = 6395000.0
    lat = jnp.arctan2(v[2] / ((1 - f) ** 2 * n1), p / n1)

    def body(_, carry):
        lat, u = carry
        n1 = c / jnp.sqrt(1 + ex2 * jnp.cos(lat) ** 2)
        lat = jnp.arctan2(v[2] / ((1 - f) ** 2 * n1 + u), p / (n1 + u))
        return lat, p / jnp.cos(lat) - n1

    lat, u = jax.lax.fori_loop(0, 30, body, (lat, jnp.full_like(lat, 0.1)))

    # normalized meridian quadrant (KW p.50)
    m0 = 4e-4
    n = f / (2 - f)
    m = n**2 * (0.25 + n**2 / 64)
    q_n = a + (a * (-n - m0 + m * (1 - m0))) / (1 + n)

    e0 = 500000.0
    lon0 = jnp.deg2rad((zone - 30) * 6 - 3.0)

    neg = lat < 0
    bg_r = jnp.abs(lat) + clsin(_UTM_BG, 2 * jnp.abs(lat))
    lg_r = lon - lon0
    cos_bn = jnp.cos(bg_r)
    np_ = jnp.arctan2(jnp.sin(bg_r), jnp.cos(lg_r) * cos_bn)
    ep = jnp.arctanh(jnp.sin(lg_r) * cos_bn)
    dn, de = clksin(_UTM_GTU, 2 * np_, 2 * ep)
    np_, ep = np_ + dn, ep + de
    northing = q_n * np_
    easting = q_n * ep + e0
    northing = jnp.where(neg, -northing + 20000000.0, northing)
    return easting, northing, u


def find_utm_zone(latitude: float, longitude: float) -> int:
    """UTM zone for lat/lon in decimal degrees, with the Norway/Svalbard
    exceptions (reference: geoFunctions:529-574).  Host-side scalar."""
    if longitude > 180 or longitude < -180:
        raise ValueError("Longitude value exceeds limits (-180:180).")
    if latitude > 84 or latitude < -80:
        raise ValueError("Latitude value exceeds limits (-80:84).")
    zone = int(np.fix((180 + longitude) / 6)) + 1
    if latitude > 72:
        if 0 <= longitude < 9:
            zone = 31
        elif 9 <= longitude < 21:
            zone = 33
        elif 21 <= longitude < 33:
            zone = 35
        elif 33 <= longitude < 42:
            zone = 37
    elif 56 <= latitude < 64 and 3 <= longitude < 12:
        zone = 32
    return zone


def deg2dms(deg: float) -> float:
    """Decimal degrees -> dd*100 + mm + ss/100 packed form
    (reference: geoFunctions:379-426)."""
    sign = -1.0 if deg < 0 else 1.0
    deg = abs(deg)
    d = np.floor(deg)
    minutes_part = (deg - d) * 60
    m = np.floor(minutes_part)
    s = (minutes_part - m) * 60
    if s >= 60.0 - 1e-12:
        m += 1
        s = 0.0
    if m >= 60.0:
        d += 1
        m = 0.0
    return sign * (d * 100 + m + s / 100)


def dms2mat(dms: float, n: int = -3) -> tuple[float, float, float]:
    """Split dd*100 + mm + ss/100 into (dd, mm, ss rounded to 10^n).

    The reference's version (geoFunctions:433-482) is dead code that
    crashes (empty-list assignment) and repeats a format string instead of
    multiplying; this implements its documented contract.
    """
    sign = -1.0 if dms < 0 else 1.0
    dms = abs(dms)
    d = np.floor(dms / 100)
    m = np.floor(dms - 100 * d)
    s = round((dms - 100 * d - m) * 100, -n)
    if s >= 60.0:
        m += 1
        s = 0.0
    if m >= 60.0:
        d += 1
        m = 0.0
    return sign * d, m, s
