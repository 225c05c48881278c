"""Klobuchar ionospheric delay model (IS-GPS-200 20.3.3.5.2.5).

The reference applies only a tropospheric correction
(geoFunctions tropo, postNavigation.py:238-247) and ignores the
broadcast ionospheric coefficients entirely — at L1 the iono delay is
typically 2-15 m of pseudorange, the largest uncorrected error source
after satellite geometry.  Here the alpha/beta coefficients broadcast in
subframe 4 page 18 (decoded by nav.message.decode_iono, or injected)
drive the standard single-frequency correction, applied inside the PVT
iterations next to the troposphere (nav.pvt.solve_epoch).

Pure jnp f64 (composable under jit/scan like the rest of the PVT math).
"""

from __future__ import annotations

import jax.numpy as jnp

#: seconds per GPS day
_DAY = 86400.0


def klobuchar(iono, lat_deg, lon_deg, az_deg, el_deg, gps_tow):
    """Slant ionospheric delay in SECONDS at L1.

    ``iono``: (8,) [alpha0..alpha3, beta0..beta3] broadcast coefficients;
    ``lat_deg``/``lon_deg``: receiver geodetic coordinates (scalars);
    ``az_deg``/``el_deg``: satellite azimuth/elevation, degrees (any
    broadcastable shape); ``gps_tow``: GPS time of week, s.  Algorithm
    and magic constants per IS-GPS-200 figure 20-4 (semicircle units
    internally).
    """
    iono = jnp.asarray(iono, jnp.float64)
    a, b = iono[:4], iono[4:]
    el = jnp.maximum(jnp.asarray(el_deg, jnp.float64), 0.0) / 180.0  # semicircles
    az = jnp.deg2rad(jnp.asarray(az_deg, jnp.float64))

    psi = 0.0137 / (el + 0.11) - 0.022                 # earth-centred angle
    phi_i = jnp.clip(lat_deg / 180.0 + psi * jnp.cos(az), -0.416, 0.416)
    lam_i = lon_deg / 180.0 + psi * jnp.sin(az) / jnp.cos(phi_i * jnp.pi)
    phi_m = phi_i + 0.064 * jnp.cos((lam_i - 1.617) * jnp.pi)  # geomagnetic

    t = jnp.mod(_DAY / 2.0 * lam_i + gps_tow, _DAY)    # local time, s
    f = 1.0 + 16.0 * (0.53 - el) ** 3                  # slant factor

    powers = jnp.stack([jnp.ones_like(phi_m), phi_m, phi_m**2, phi_m**3])
    per = jnp.maximum(jnp.tensordot(b, powers, axes=1), 72000.0)
    amp = jnp.maximum(jnp.tensordot(a, powers, axes=1), 0.0)

    x = 2.0 * jnp.pi * (t - 50400.0) / per
    day = 5e-9 + amp * (1.0 - x**2 / 2.0 + x**4 / 24.0)
    return f * jnp.where(jnp.abs(x) < 1.57, day, 5e-9)
