"""Observability geometry and coordinate parsing tests."""
import numpy as np
import pytest

from rajepy_tpu.ops import astronomy as astro


class TestCoordinateParsing:
    def test_ra_formats(self):
        assert astro.parse_ra("06:00:00") == pytest.approx(90.0)
        assert astro.parse_ra("04:31:34.07736") == pytest.approx(
            (4 + 31 / 60 + 34.07736 / 3600) * 15, rel=1e-12)
        assert astro.parse_ra("12h30m00s") == pytest.approx(187.5)

    def test_dec_formats(self):
        assert astro.parse_dec("+18:08:04.9020") == pytest.approx(
            18 + 8 / 60 + 4.902 / 3600, rel=1e-12)
        assert astro.parse_dec("-30:30:00") == pytest.approx(-30.5)
        assert astro.parse_dec("45d15m00s") == pytest.approx(45.25)

    def test_hmsdms_roundtrip(self):
        ra, dec = 67.891906, 18.134695
        s = astro.format_hmsdms(ra, dec)
        r, d = s.split()
        assert astro.parse_ra(r.replace('h', ':').replace('m', ':')
                              .rstrip('s')) == pytest.approx(ra, abs=1e-6)
        assert astro.parse_dec(d.replace('d', ':').replace('m', ':')
                               .rstrip('s')) == pytest.approx(dec, abs=1e-6)


class TestFK4FK5:
    """FK4 (B1950) <-> FK5 (J2000) conversion (ops.astronomy.fk4_to_fk5;
    the reference delegates to astropy SkyCoord, classes.py:3195-3200).

    Anchors are published conversions: the textbook B1950 origin
    (Explanatory Supplement: 00h02m33.77s +00d16'42.1") and 3C 273
    (B1950 12h26m33.246s +02d19'43.31" vs its ICRS position
    187.2779154, +2.0523883 deg).  Both hold to ~0.1 arcsec here — the
    quoted anchors themselves carry ~0.05" of rounding.
    """

    def test_b1950_origin(self):
        ra, dec = astro.fk4_to_fk5(0.0, 0.0)
        exp_ra = (2 * 60 + 33.77) / 3600 * 15
        exp_dec = (16 * 60 + 42.1) / 3600
        assert abs(ra - exp_ra) * 3600 < 0.1
        assert abs(dec - exp_dec) * 3600 < 0.1

    def test_3c273(self):
        rb = astro.parse_ra("12h26m33.246s")
        db = astro.parse_dec("+02d19m43.31s")
        ra, dec = astro.fk4_to_fk5(rb, db)
        assert abs(ra - 187.2779154) * 3600 < 0.15
        assert abs(dec - 2.0523883) * 3600 < 0.15

    def test_round_trip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            ra = float(rng.uniform(0, 360))
            dec = float(rng.uniform(-89, 89))
            rb, db = astro.fk5_to_fk4(ra, dec)
            r2, d2 = astro.fk4_to_fk5(rb, db)
            assert abs(r2 - ra) * 3600 < 1e-6
            assert abs(d2 - dec) * 3600 < 1e-6

    def test_magnitude_of_precession(self):
        # B1950->J2000 moves equatorial coordinates by ~0.7 deg -- the
        # error the conversion exists to remove
        ra, dec = astro.fk4_to_fk5(187.0, 2.0)
        sep = np.hypot((ra - 187.0) * np.cos(np.radians(2.0)), dec - 2.0)
        assert 0.5 < sep < 1.0

    def test_pointing_b1950_coord_is_j2000(self):
        from rajepy_tpu import Pointing
        p = Pointing(0.0, '12:26:33.246', '+02:19:43.31', 60.0,
                     epoch='B1950')
        # native values are the parsed B1950 ones (what ra/dec render)
        assert p.coord_native[0] == pytest.approx(
            astro.parse_ra('12:26:33.246'), rel=1e-12)
        # coord is frame-correct J2000
        assert abs(p.coord[0] - 187.2779154) * 3600 < 0.15
        assert abs(p.coord[1] - 2.0523883) * 3600 < 0.15
        # J2000 pointings: coord == coord_native
        q = Pointing(0.0, '12:26:33.246', '+02:19:43.31', 60.0)
        assert q.coord == q.coord_native


class TestElevation:
    def test_transit_elevation(self):
        # at transit (lst = ra), elevation = 90 - |lat - dec|
        lat, dec = 34.0, 20.0
        ra_deg = 90.0
        el = astro.elevation(ra_deg, dec, lat, ra_deg / 15.0)
        assert el == pytest.approx(90.0 - abs(lat - dec), rel=1e-9)

    def test_pole_star_constant(self):
        # a source at the pole sits at elevation = latitude for any LST
        lat = 51.0
        for lst in (0.0, 6.0, 13.7, 23.9):
            assert astro.elevation(0.0, 90.0, lat, lst) == \
                pytest.approx(lat, rel=1e-9)

    def test_elevation_against_reference(self):
        from .reference_oracle import get_reference
        if get_reference() is None:
            pytest.skip("reference tree unavailable")
        # the reference's astropy-based elevation is stubbed out here, so
        # validate the closed form against a hand-built rotation instead
        rng = np.random.default_rng(0)
        for _ in range(50):
            lat = rng.uniform(-85, 85)
            dec = rng.uniform(-85, 85)
            ra = rng.uniform(0, 360)
            lst = rng.uniform(0, 24)
            el = astro.elevation(ra, dec, lat, lst)
            # unit-vector formulation
            h = np.radians(lst * 15 - ra)
            v = np.array([np.cos(np.radians(dec)) * np.cos(h),
                          -np.cos(np.radians(dec)) * np.sin(h),
                          np.sin(np.radians(dec))])
            zenith = np.array([np.cos(np.radians(lat)), 0,
                               np.sin(np.radians(lat))])
            el_ref = 90.0 - np.degrees(np.arccos(np.clip(v @ zenith, -1,
                                                         1)))
            assert el == pytest.approx(el_ref, abs=1e-9)

    def test_ha_inverts_elevation(self):
        # the hour angle at which elevation crosses el0, fed back through
        # elevation(), returns el0
        ra, dec, lat, el0 = 120.0, 15.0, 34.0, 25.0
        ha = astro.ha(ra, dec, lat, el0)
        lst = (ra / 15.0 + ha) % 24.0
        assert astro.elevation(ra, dec, lat, lst) == pytest.approx(
            el0, abs=1e-9)

    def test_validation_errors(self):
        with pytest.raises(ValueError):
            astro.elevation(0.0, 0.0, 34.0, 25.0)  # lst out of range
        with pytest.raises(ValueError):
            astro.elevation(0.0, 0.0, 100.0, 12.0)  # lat out of range
        with pytest.raises(ValueError):
            astro.ha(0.0, 0.0, 34.0, 95.0)  # elev out of range
