"""2-D elliptical-Gaussian source fitting — the CASA ``imfit`` replacement.

The reference shells out to CASA's imfit task with an estimates file
(classes.py:2790-2808) and parses the text summary back
(classes.py:2817-2840).  Here the fit is a direct Gauss-Newton least
squares (scipy) on the restored image, and the summary file uses the same
'# units / # headers / values' layout so
``rajepy_tpu.utils.misc.casa_imfit_file_to_dict`` (and the reference's own
parser) read it unchanged.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.optimize import least_squares


def _gauss2d(params, xx, yy):
    peak, x0, y0, smaj, smin, th = params
    ct, st = np.cos(th), np.sin(th)
    xr = (xx - x0) * ct + (yy - y0) * st
    yr = -(xx - x0) * st + (yy - y0) * ct
    return peak * np.exp(-0.5 * ((xr / smaj) ** 2 + (yr / smin) ** 2))


def fit_gaussian(image: np.ndarray,
                 estimates: Optional[Dict[str, float]] = None
                 ) -> Optional[Dict[str, float]]:
    """Fit one elliptical Gaussian to ``image`` (2-D, Jy/beam).

    ``estimates``: optional dict with peak, x, y, maj_pix, min_pix, pa_deg
    (the role of the reference's imfit estimates file,
    classes.py:2793-2804).  Returns fitted parameters in pixel units, or
    None if the fit fails (the reference logs imfit failures and stores
    None, classes.py:2833-2840).
    """
    image = np.asarray(image, dtype=float)
    ny, nx = image.shape
    yy, xx = np.mgrid[0:ny, 0:nx]

    if not np.isfinite(image).any():
        # a fully-blanked plane is a failed fit, not a crash
        # (nanmax/nanargmax raise on all-NaN slices)
        return None

    if estimates is None:
        peak0 = float(np.nanmax(image))
        iy, ix = np.unravel_index(np.nanargmax(image), image.shape)
        estimates = {'peak': peak0, 'x': float(ix), 'y': float(iy),
                     'maj_pix': max(nx / 20.0, 2.0),
                     'min_pix': max(nx / 30.0, 2.0), 'pa_deg': 0.0}

    fwhm = 2.0 * np.sqrt(2.0 * np.log(2.0))
    p0 = np.array([estimates['peak'], estimates['x'], estimates['y'],
                   max(estimates['maj_pix'] / fwhm, 0.5),
                   max(estimates['min_pix'] / fwhm, 0.5),
                   np.radians(estimates['pa_deg'])])

    img = np.nan_to_num(image, nan=0.0)

    def resid(p):
        return (_gauss2d(p, xx, yy) - img).ravel()

    try:
        sol = least_squares(resid, p0, method='lm', max_nfev=2000)
    except Exception:
        return None
    if not np.isfinite(sol.x).all() or sol.x[0] <= 0:
        return None

    peak, x0, y0, smaj, smin, th = sol.x
    smaj, smin = abs(smaj), abs(smin)
    if smin > smaj:
        smaj, smin = smin, smaj
        th += np.pi / 2
    total_flux = 2.0 * np.pi * peak * smaj * smin
    return {'peak': float(peak), 'x': float(x0), 'y': float(y0),
            'maj_pix': float(smaj * fwhm), 'min_pix': float(smin * fwhm),
            'pa_deg': float(np.degrees(th) % 180.0),
            'flux_pixsum': float(total_flux)}


def write_imfit_summary(filename: str, fit: Dict[str, float],
                        cell_arcsec: float, beam_area_pix: float):
    """Write a CASA-imfit-style summary (units line, header line, values) —
    parseable by utils.misc.casa_imfit_file_to_dict and by the reference's
    own parser (classes.py:2821-2832)."""
    flux_jy = fit['flux_pixsum'] / max(beam_area_pix, 1e-30)
    # CASA's summary format: the units line has one fewer token than the
    # header line (the leading count column is unitless) — both the
    # reference's parser (classes.py:2821-2832) and
    # utils.misc.casa_imfit_file_to_dict compensate with a leading ''.
    units = ['Jy/beam', 'Jy', 'pix', 'pix', 'arcsec', 'arcsec', 'deg']
    headers = ['N', 'Peak', 'Flux', 'X', 'Y', 'Maj', 'Min', 'PA']
    values = [0, fit['peak'], flux_jy, fit['x'], fit['y'],
              fit['maj_pix'] * cell_arcsec, fit['min_pix'] * cell_arcsec,
              fit['pa_deg']]
    with open(filename, 'wt') as f:
        f.write('# ' + '  '.join(units) + '\n')
        f.write('# ' + '  '.join(headers) + '\n')
        f.write('  '.join(f'{v:.8g}' for v in values) + '\n')
