"""Nav-message codec: parity, subframe encode/decode round trips."""

import numpy as np
import pytest

from softgnss_tpu.nav.message import (
    Ephemeris,
    GPS_PI,
    PREAMBLE_BITS,
    build_nav_stream,
    decode_ephemeris,
)
from softgnss_tpu.nav.parity import encode_stream, encode_word, nav_parity_check


def reference_parity_check(ndat):
    """Direct transcription of the reference's scalar +/-1 parity flowchart
    (postNavigation.py:474-521), used as the oracle for our vectorized one."""
    ndat = np.array(ndat, np.int64)
    if ndat[1] != 1:
        ndat[2:26] *= -1
    m = ndat
    parity = [
        m[0] * m[2] * m[3] * m[4] * m[6] * m[7] * m[11] * m[12] * m[13] * m[14] * m[15] * m[18] * m[19] * m[21] * m[24],
        m[1] * m[3] * m[4] * m[5] * m[7] * m[8] * m[12] * m[13] * m[14] * m[15] * m[16] * m[19] * m[20] * m[22] * m[25],
        m[0] * m[2] * m[4] * m[5] * m[6] * m[8] * m[9] * m[13] * m[14] * m[15] * m[16] * m[17] * m[20] * m[21] * m[23],
        m[1] * m[3] * m[5] * m[6] * m[7] * m[9] * m[10] * m[14] * m[15] * m[16] * m[17] * m[18] * m[21] * m[22] * m[24],
        m[1] * m[2] * m[4] * m[6] * m[7] * m[8] * m[10] * m[11] * m[15] * m[16] * m[17] * m[18] * m[19] * m[22] * m[23] * m[25],
        m[0] * m[4] * m[6] * m[7] * m[9] * m[10] * m[11] * m[12] * m[14] * m[16] * m[20] * m[23] * m[24] * m[25],
    ]
    if (np.asarray(parity) == ndat[26:32]).sum() == 6:
        return -1 * ndat[1]
    return 0


def _stream_to_ndat(tx01, w):
    """ndat (+/-1, 32) for word w of a transmitted 0/1 stream."""
    bits = 2 * tx01.astype(np.int64) - 1
    if w == 0:
        stars = np.array([-1, -1])  # encoder default D29*=D30*=0
    else:
        stars = bits[w * 30 - 2: w * 30]
    return np.concatenate([stars, bits[w * 30:(w + 1) * 30]])


class TestParity:
    def test_encoded_words_pass_both_checkers(self, rng):
        words = rng.integers(0, 2, size=(20, 24)).astype(np.int8)
        tx = encode_stream(words)
        ndats = np.stack([_stream_to_ndat(tx, w) for w in range(20)])
        ours = nav_parity_check(ndats)
        assert np.all(ours != 0)
        for nd, expect in zip(ndats, ours):
            assert reference_parity_check(nd) == expect

    def test_global_inversion_invariance(self, rng):
        words = rng.integers(0, 2, size=(8, 24)).astype(np.int8)
        tx = encode_stream(words)
        ndats = np.stack([_stream_to_ndat(tx, w) for w in range(1, 8)])
        assert np.all(nav_parity_check(ndats) != 0)
        assert np.all(nav_parity_check(-ndats) != 0)

    def test_corrupted_bit_fails(self, rng):
        words = rng.integers(0, 2, size=(4, 24)).astype(np.int8)
        tx = encode_stream(words)
        nd = _stream_to_ndat(tx, 2)
        for flip in (2, 10, 27, 31):
            bad = nd.copy()
            bad[flip] *= -1
            assert nav_parity_check(bad) == 0
            assert reference_parity_check(bad) == 0

    def test_vectorized_matches_reference_on_random_words(self, rng):
        ndats = rng.choice([-1, 1], size=(200, 32))
        ours = nav_parity_check(ndats)
        ref = np.asarray([reference_parity_check(nd) for nd in ndats])
        np.testing.assert_array_equal(ours, ref)

    def test_decoder_polarity_recovery(self, rng):
        source = rng.integers(0, 2, size=24).astype(np.int8)
        word = encode_word(source, d29star=1, d30star=1)
        # receiver-side: data bits XOR D30* recovers the source
        np.testing.assert_array_equal(word[:24] ^ 1, source)


class TestMessageCodec:
    def make_eph(self):
        return Ephemeris(
            week_number=1776, accuracy=0, health=0,
            t_gd=-1.2107193470001221e-08, iodc=234,
            t_oc=396000.0, a_f2=0.0, a_f1=-3.751665644813329e-12,
            a_f0=-0.00033314324915409088,
            iode_sf2=91, c_rs=-22.21875, delta_n=4.3e-9,
            m_0=-1.2345678, c_uc=-1.1343508958816528e-06, e=0.0074844,
            c_us=8.252263069152832e-06, sqrt_a=5153.65576171875, t_oe=396000.0,
            c_ic=-7.450580596923828e-08, omega_0=2.2889, c_is=1.080334e-07,
            i_0=0.9604, c_rc=221.875, omega=-1.7657, omega_dot=-8.0257e-09,
            iode_sf3=91, i_dot=-4.8e-10,
        )

    def test_round_trip(self):
        eph = self.make_eph()
        tow_count = 70000          # multiple of 5 -> subframe IDs 1..5
        stream = build_nav_stream(eph, tow_count, 5)
        assert stream.shape == (1500,)
        assert set(np.unique(stream)) <= {-1, 1}
        dec, tow = decode_ephemeris(stream, -1)
        assert tow == tow_count * 6
        scales = {
            "t_gd": 2.0**-31, "t_oc": 16.0, "a_f2": 2.0**-55, "a_f1": 2.0**-43,
            "a_f0": 2.0**-31, "c_rs": 2.0**-5, "delta_n": 2.0**-43 * GPS_PI,
            "m_0": 2.0**-31 * GPS_PI, "c_uc": 2.0**-29, "e": 2.0**-33,
            "c_us": 2.0**-29, "sqrt_a": 2.0**-19, "t_oe": 16.0,
            "c_ic": 2.0**-29, "omega_0": 2.0**-31 * GPS_PI, "c_is": 2.0**-29,
            "i_0": 2.0**-31 * GPS_PI, "c_rc": 2.0**-5,
            "omega": 2.0**-31 * GPS_PI, "omega_dot": 2.0**-43 * GPS_PI,
            "iode_sf3": 1, "i_dot": 2.0**-43 * GPS_PI,
        }
        for name in ("week_number", "accuracy", "health", "iodc", "iode_sf2", "iode_sf3"):
            assert getattr(dec, name) == getattr(eph, name), name
        for name, scale in scales.items():
            if name in ("iode_sf3",):
                continue
            got, want = getattr(dec, name), getattr(eph, name)
            assert abs(got - want) <= scale, f"{name}: {got} vs {want}"
        assert dec.complete

    def test_round_trip_with_frame_offset(self):
        """Starting mid-frame (first subframe ID != 1) still decodes 1-2-3."""
        eph = self.make_eph()
        tow_count = 70003          # first subframe has ID 4
        stream = build_nav_stream(eph, tow_count, 5)
        dec, tow = decode_ephemeris(stream, -1)
        assert tow == tow_count * 6
        assert dec.complete
        assert dec.sqrt_a == pytest.approx(eph.sqrt_a, abs=2.0**-19)

    def test_inverted_stream_decodes(self):
        eph = self.make_eph()
        stream = build_nav_stream(eph, 70000, 5)
        dec, tow = decode_ephemeris(-stream, 1)
        assert dec.complete
        assert tow == 70000 * 6
        assert dec.iodc == eph.iodc

    def test_preamble_present_in_source_bits(self):
        eph = self.make_eph()
        stream01 = (build_nav_stream(eph, 70000, 5) + 1) // 2
        # first word: D30* chain starts at 0, so transmitted == source
        np.testing.assert_array_equal(stream01[:8], PREAMBLE_BITS)

    def test_angle_at_positive_pi_edge_wraps(self):
        """An angle within half an LSB below +pi must encode as the -pi code
        point (semicircle wrap), not overflow the signed field."""
        eph = self.make_eph()
        eph.m_0 = GPS_PI * (1.0 - 2.0**-33)
        eph.omega_0 = -GPS_PI
        stream = build_nav_stream(eph, 70000, 5)
        dec, _ = decode_ephemeris(stream, -1)
        # +pi and -pi are the same angle; decoded value is -pi
        assert abs(abs(dec.m_0) - GPS_PI) < 2.0**-30
        assert dec.omega_0 == pytest.approx(-GPS_PI, abs=2.0**-30)

    def test_incomplete_frame_rejected(self):
        with pytest.raises(ValueError):
            decode_ephemeris(np.ones(1000), 1)
