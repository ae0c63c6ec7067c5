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
