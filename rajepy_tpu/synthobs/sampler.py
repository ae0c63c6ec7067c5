"""Visibility sampling: FFT the sky model and sample it on uv tracks.

This replaces the CASA ``simobserve`` measurement-set machinery
(casa/tasks.py:176-213 + the subprocess at casa/_interface.py:63-81) with an
on-device forward model: one taper-corrected 2-D FFT per channel plus a
Kaiser-Bessel convolutional degrid at the uv points, entirely in HBM
(worst-case ~2e-6 of total flux vs the exact DFT; w-stacking engages for
non-coplanar wide fields).  Thermal noise
follows the radiometer equation (standing in for simobserve's 'tsys-atm'
mode, tasks.py:205 — equivalence is statistical, not bitwise).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import i0 as _jax_i0

_PAD = 4  # zero-padding (= gridder oversampling) factor before the
#           forward FFT
_KB_W = 6  # Kaiser-Bessel degrid kernel support [uv cells]: at 4x
#           oversampling the worst-case (field-edge source) degrid error
#           is ~2e-6 of total flux (W=4: 1.7e-4; bilinear: up to 5%)


@partial(jax.jit, static_argnames=('pad',))
def sky_fft(image, pad: int = _PAD):
    """Centred 2-D FFT of a sky image (image[dec, ra] in Jy/pixel).

    Returns the complex visibility grid with DC at the centre, shape
    (pad*ny, pad*nx).
    """
    ny, nx = image.shape
    padded = jnp.zeros((ny * pad, nx * pad), dtype=image.dtype)
    # the image centre pixel (index n//2) must land on the padded grid's
    # DC index (n_big//2) — (n_big - n)//2 gets that wrong by one pixel
    # for odd n (a one-pixel phase ramp on every visibility)
    y0 = ny * pad // 2 - ny // 2
    x0 = nx * pad // 2 - nx // 2
    padded = padded.at[y0:y0 + ny, x0:x0 + nx].set(image)
    return jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(padded)))


def _centre_shift(n: int, centre: str) -> float:
    """Pixel offset of the requested phase centre from the FFT DC pixel
    ``n // 2``.

    ``'pixel'`` (default): the phase centre IS the DC pixel — the
    convention of :func:`imaging.grid_and_image` and CLEAN component
    images.  ``'fits'``: the centre sits at 0-based ``(n - 1) / 2``,
    where the model FITS header's CRPIX ``n/2 + 0.5`` puts CRVAL
    (between pixels for even n) — sampling a sky model with 'pixel'
    references every visibility phase half a model cell away from the
    header's CRVAL (review r4)."""
    if centre == 'pixel':
        return 0.0
    if centre != 'fits':
        raise ValueError(f"unknown centre convention {centre!r}")
    return (n - 1) / 2.0 - n // 2          # -0.5 for even n, 0 for odd


def _fits_centre_ramp(vis, cell_rad, u_wav, v_wav, nx: int, ny: int,
                      centre: str):
    """Re-reference degridded visibility phases from the DC pixel to the
    requested centre: V_new = V * e^{+2 pi i (u l_c + v m_c)} with
    (l_c, m_c) the centre's offset in the pixel convention."""
    sx = _centre_shift(nx, centre)
    sy = _centre_shift(ny, centre)
    if sx == 0.0 and sy == 0.0:
        return vis
    ph = (2.0 * jnp.pi) * cell_rad * (sx * u_wav + sy * v_wav)
    return vis * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def _kb_beta(width: int, sigma: int) -> float:
    """Beatty et al. (2005) optimal Kaiser-Bessel shape parameter for a
    kernel of support ``width`` cells at oversampling ``sigma``."""
    return float(np.pi * np.sqrt((width / sigma) ** 2 *
                                 (sigma - 0.5) ** 2 - 0.8))


def _kb_kernel_1d(x, width: int, beta: float):
    """KB kernel I0(beta sqrt(1-(2x/W)^2)) / I0(beta), zero outside
    |x| <= W/2 (x in uv cells)."""
    t = 1.0 - (2.0 * x / width) ** 2
    val = _jax_i0(beta * jnp.sqrt(jnp.maximum(t, 0.0)))
    return jnp.where(t > 0, val, 0.0) * jnp.asarray(1.0 / np.i0(beta),
                                                    x.dtype)


def _kb_taper_axis(n: int, n_big: int, width: int, beta: float,
                   dtype) -> jnp.ndarray:
    """Continuous Fourier transform of the KB kernel sampled at the image
    pixels (length-n axis of an n_big-point padded grid):
    khat(nu) = W sinh(g)/g / I0(beta), g = sqrt(beta^2 - (pi W nu)^2).
    Dividing the image by the outer product of these tapers before the
    FFT makes KB convolutional degridding an (aliasing-bounded) exact
    DFT — the standard NUFFT identity, and what CASA's gridder does with
    its prolate-spheroidal taper."""
    p = np.arange(n) - n // 2
    nu = p / n_big
    g = np.sqrt(np.maximum(beta ** 2 - (np.pi * width * nu) ** 2, 1e-30))
    return jnp.asarray(width * np.sinh(g) / g / np.i0(beta), dtype)


def _kb_correct(image, pad: int, width: int):
    """Divide the sky image by the KB taper (both axes) so degridding off
    its padded FFT reproduces the exact DFT."""
    ny, nx = image.shape
    beta = _kb_beta(width, pad)
    ty = _kb_taper_axis(ny, ny * pad, width, beta, image.dtype)
    tx = _kb_taper_axis(nx, nx * pad, width, beta, image.dtype)
    return image / (ty[:, None] * tx[None, :])


def _kb_degrid(vis_grid, cell_rad, u_wav, v_wav, width: int, beta: float):
    """Convolutional degrid: V(u,v) = sum_{ab} kx_a ky_b G[yb, xa] over a
    width x width neighbourhood, as ONE flattened (n_vis, W^2) gather
    plus a weighted row-sum — W^2 separate advanced-indexing ops compile
    to W^2 serialised gathers on TPU."""
    n_big = vis_grid.shape
    rdt = u_wav.dtype
    du_v = 1.0 / (n_big[0] * cell_rad)
    du_u = 1.0 / (n_big[1] * cell_rad)
    fx = u_wav / du_u + n_big[1] // 2
    fy = v_wav / du_v + n_big[0] // 2
    xf = jnp.floor(fx).astype(jnp.int32)
    yf = jnp.floor(fy).astype(jnp.int32)
    offs = jnp.arange(width, dtype=jnp.int32) - width // 2 + 1
    xi = jnp.clip(xf[:, None] + offs[None, :], 0, n_big[1] - 1)
    yi = jnp.clip(yf[:, None] + offs[None, :], 0, n_big[0] - 1)
    kx = _kb_kernel_1d(fx[:, None] - (xf[:, None] +
                                      offs[None, :]).astype(rdt),
                       width, beta)
    ky = _kb_kernel_1d(fy[:, None] - (yf[:, None] +
                                      offs[None, :]).astype(rdt),
                       width, beta)
    nv = u_wav.shape[0]
    idx = (yi[:, :, None] * n_big[1] + xi[:, None, :]).reshape(
        nv, width * width)
    wgt = (ky[:, :, None] * kx[:, None, :]).reshape(nv, width * width)
    vals = jnp.take(vis_grid.reshape(-1), idx)
    out = jnp.sum(wgt * vals, axis=1)
    # beyond the model grid's Nyquist (|u| > 1/(2 cell)) the clip above
    # would silently return the grid-edge value at full kernel weight;
    # the pixelated model carries no information there — return 0
    # (simulate_observation warns when any baseline lands out here)
    in_rng = ((fx >= 0) & (fx <= n_big[1] - 1) &
              (fy >= 0) & (fy <= n_big[0] - 1))
    return jnp.where(in_rng, out, jnp.zeros_like(out))


def _bilerp_uv(vis_grid, cell_rad, u_wav, v_wav):
    """Bilinear interpolation of a centred uv grid at (u, v) [wavelengths]."""
    n_big = vis_grid.shape
    du_v = 1.0 / (n_big[0] * cell_rad)   # v axis (dec)
    du_u = 1.0 / (n_big[1] * cell_rad)   # u axis (ra)

    fx = u_wav / du_u + n_big[1] // 2
    fy = v_wav / du_v + n_big[0] // 2
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, n_big[1] - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, n_big[0] - 2)
    tx = jnp.clip(fx - x0, 0.0, 1.0)
    ty = jnp.clip(fy - y0, 0.0, 1.0)

    v00 = vis_grid[y0, x0]
    v01 = vis_grid[y0, x0 + 1]
    v10 = vis_grid[y0 + 1, x0]
    v11 = vis_grid[y0 + 1, x0 + 1]
    out = ((1 - ty) * ((1 - tx) * v00 + tx * v01) +
           ty * ((1 - tx) * v10 + tx * v11))
    # out-of-Nyquist points: zero, not the clamped grid-edge value
    in_rng = ((fx >= 0) & (fx <= n_big[1] - 1) &
              (fy >= 0) & (fy <= n_big[0] - 1))
    return jnp.where(in_rng, out, jnp.zeros_like(out))


@partial(jax.jit, static_argnames=('pad', 'degrid', 'centre'))
def sample_vis(image, cell_rad: float, u_wav, v_wav, pad: int = _PAD,
               degrid: str = 'kb', centre: str = 'pixel'):
    """Sample the sky model's Fourier transform at (u, v) [wavelengths].

    u is the east-west spatial frequency conjugate to RA offset, v conjugate
    to Dec offset.  ``degrid='kb'`` (default) taper-corrects the image and
    degrids with a Kaiser-Bessel convolution kernel — worst-case error
    ~2e-6 of total flux vs the exact DFT, the on-device analogue of
    CASA's prolate-spheroidal gridder; ``'bilinear'`` is the cheaper
    4-gather interpolation (up to ~5% for field-edge sources).  RA runs
    along -x in the FITS image (CDELT1 < 0), handled by the caller's sign
    convention.  Returns complex visibilities [Jy].
    """
    # pin every operand to the image's precision: under x64 a python-float
    # cell size would promote the chain to f64/c128, which TPU rejects
    rdt = image.dtype
    ny, nx = image.shape
    cell_rad = jnp.asarray(cell_rad, rdt)
    u_wav = jnp.asarray(u_wav, rdt)
    v_wav = jnp.asarray(v_wav, rdt)
    if degrid == 'kb':
        grid = sky_fft(_kb_correct(image, pad, _KB_W), pad=pad)
        vis = _kb_degrid(grid, cell_rad, u_wav, v_wav, _KB_W,
                         _kb_beta(_KB_W, pad))
    elif degrid != 'bilinear':
        raise ValueError(f"unknown degrid mode {degrid!r}")
    else:
        vis_grid = sky_fft(image, pad=pad)
        vis = _bilerp_uv(vis_grid, cell_rad, u_wav, v_wav)
    return _fits_centre_ramp(vis, cell_rad, u_wav, v_wav, nx, ny, centre)


@partial(jax.jit, static_argnames=('n_wplanes', 'pad', 'degrid', 'centre'))
def sample_vis_wstack(image, cell_rad: float, u_wav, v_wav, w_wav,
                      n_wplanes: int = 8, pad: int = _PAD,
                      degrid: str = 'kb', centre: str = 'pixel'):
    """Wide-field visibility sampling by w-stacking.

    Handles the non-coplanar measurement equation the plain FFT path drops
    (see :func:`sample_vis_dft_w`): the sky (with its 1/n Jacobian) is
    multiplied by the w phase screen ``e^{-2 pi i w_p (n - 1)}`` on each of
    ``n_wplanes`` planes spanning [min w, max w], each screened sky is
    FFT'd, and every visibility linearly interpolates between its two
    bracketing planes (hat weights) after (u, v) degridding.  The
    per-plane FFTs run as a ``lax.scan`` so only one padded grid is live
    at a time.  Residual amplitude error ~ (pi dw (1-cos theta))^2 / 8 per
    plane spacing dw — :func:`n_wplanes_for` picks the plane count for a
    target tolerance.  CASA handles w inside simobserve (the reference's
    delegation at casa/tasks.py:215-277); this is the TPU-native
    equivalent, batched FFTs instead of per-visibility convolution.

    With ``n_wplanes=1`` this degenerates to a single screen at the mean w
    (the "w-shift" approximation) — still including the 1/n Jacobian, so
    it differs from :func:`sample_vis` even at w=0 for wide fields.
    """
    ny, nx = image.shape
    rdt = image.dtype
    cell_rad = jnp.asarray(cell_rad, rdt)
    u_wav = jnp.asarray(u_wav, rdt)
    v_wav = jnp.asarray(v_wav, rdt)
    w_wav = jnp.asarray(w_wav, rdt)

    l_ax = (jnp.arange(nx, dtype=rdt) - nx // 2) * cell_rad
    m_ax = (jnp.arange(ny, dtype=rdt) - ny // 2) * cell_rad
    ll, mm = jnp.meshgrid(l_ax, m_ax)
    nn = jnp.sqrt(jnp.maximum(1.0 - ll ** 2 - mm ** 2,
                              jnp.asarray(1e-12, rdt)))
    base = image / nn
    if degrid == 'kb':
        base = _kb_correct(base, pad, _KB_W)
        kb_beta = _kb_beta(_KB_W, pad)
    elif degrid != 'bilinear':
        raise ValueError(f"unknown degrid mode {degrid!r}")
    n1 = nn - 1.0

    if n_wplanes == 1:
        planes = 0.5 * (jnp.min(w_wav) + jnp.max(w_wav))[None]
        frac_idx = jnp.zeros_like(w_wav)  # hat == 1 everywhere
    else:
        w_lo = jnp.min(w_wav)
        dw = (jnp.max(w_wav) - w_lo) / (n_wplanes - 1)
        planes = w_lo + dw * jnp.arange(n_wplanes, dtype=rdt)
        # hat weights are computed in PLANE-INDEX space: with coincident
        # planes (all w equal -> dw == 0) every visibility maps to
        # fractional index 0, so only plane 0 carries weight instead of
        # every duplicate plane overcounting (a w-value-space guard fails
        # here: no representable epsilon separates planes at |w| ~ 1e8)
        dw_safe = jnp.maximum(dw, jnp.asarray(1e-30, rdt))
        frac_idx = (w_wav - w_lo) / dw_safe

    def one_plane(acc, plane):
        w_p, p_idx = plane
        ph = (-2.0 * jnp.pi) * w_p * n1
        img_c = jax.lax.complex(base * jnp.cos(ph), base * jnp.sin(ph))
        grid = sky_fft(img_c, pad=pad)
        if degrid == 'kb':
            vis_p = _kb_degrid(grid, cell_rad, u_wav, v_wav, _KB_W,
                               kb_beta)
        else:
            vis_p = _bilerp_uv(grid, cell_rad, u_wav, v_wav)
        hat = jnp.clip(1.0 - jnp.abs(frac_idx - p_idx), 0.0, 1.0)
        return acc + hat * vis_p, None

    acc0 = jnp.zeros(u_wav.shape,
                     dtype=jax.lax.complex(jnp.zeros((), rdt),
                                           jnp.zeros((), rdt)).dtype)
    acc, _ = jax.lax.scan(one_plane, acc0,
                          (planes, jnp.arange(n_wplanes, dtype=rdt)))
    # the w-screens' n(l, m) is evaluated on the pixel grid either way —
    # the half-cell centre shift's effect on n is second order; the
    # (u, v) phase reference is what the ramp corrects
    return _fits_centre_ramp(acc, cell_rad, u_wav, v_wav, nx, ny, centre)


def n_wplanes_for(uvw_m, freq_hz: float, field_radius_rad: float,
                  tol: float = 1e-3, max_planes: int = 128) -> int:
    """Plane count for :func:`sample_vis_wstack` such that the linear
    w-interpolation's amplitude error stays below ``tol`` (per unit flux
    at the field edge): the phase step between adjacent planes is
    ``dphi = 2 pi dw (1 - cos theta)`` and the hat-interpolation error of
    ``e^{i phi}`` is ``<= dphi^2 / 8``, so we need
    ``dphi <= sqrt(8 tol)``.  Returns 1 when even the full w range is
    within tolerance (a single mean-w screen suffices)."""
    ws = np.asarray(uvw_m)[:, 2] if np.asarray(uvw_m).shape[1] > 2 else \
        np.zeros(1)
    lam = 299792458.0 / float(freq_hz)
    w_span = float(np.max(ws) - np.min(ws)) / lam
    span_phase = 2.0 * np.pi * w_span * (1.0 - np.cos(field_radius_rad))
    dphi_max = np.sqrt(8.0 * tol)
    if span_phase <= dphi_max:
        return 1
    return int(min(np.ceil(span_phase / dphi_max) + 1, max_planes))


@partial(jax.jit, static_argnames=('centre',))
def sample_vis_dft(image, cell_rad: float, u_wav, v_wav,
                   centre: str = 'pixel'):
    """Exact direct-Fourier-transform visibilities.

    V(u, v) = sum_lm I[m, l] exp(-2 pi i (u l + v m)) over the image pixels
    with offsets (l, m) from the image centre in radians.  On TPU the two
    real matmuls (cos/sin factor against the pixel list) run on the MXU —
    this is the speed-of-light forward model for compact sky models, and
    the accuracy oracle for the FFT+degrid path.  ``centre``: see
    :func:`_centre_shift`.
    """
    ny, nx = image.shape
    rdt = image.dtype
    cell_rad = jnp.asarray(cell_rad, rdt)
    u_wav = jnp.asarray(u_wav, rdt)
    v_wav = jnp.asarray(v_wav, rdt)
    cx = nx // 2 + _centre_shift(nx, centre)
    cy = ny // 2 + _centre_shift(ny, centre)
    l_ax = (jnp.arange(nx, dtype=rdt) - cx) * cell_rad
    m_ax = (jnp.arange(ny, dtype=rdt) - cy) * cell_rad
    # flatten image; phase = -2 pi (u l + v m)
    ll, mm = jnp.meshgrid(l_ax, m_ax)
    flat_i = image.reshape(-1)
    flat_l = ll.reshape(-1)
    flat_m = mm.reshape(-1)
    phase = -2.0 * jnp.pi * (u_wav[:, None] * flat_l[None, :] +
                             v_wav[:, None] * flat_m[None, :])
    re = jnp.cos(phase) @ flat_i
    im = jnp.sin(phase) @ flat_i
    return jax.lax.complex(re, im)


@partial(jax.jit, static_argnames=('centre',))
def sample_vis_dft_w(image, cell_rad: float, u_wav, v_wav, w_wav,
                     centre: str = 'pixel'):
    """Exact non-coplanar (w-term) direct-Fourier-transform visibilities:

        V(u,v,w) = sum_lm I[m,l] e^{-2 pi i (u l + v m + w (n - 1))} / n,
        n = sqrt(1 - l^2 - m^2)

    — the full measurement equation the 2-D FFT path approximates by
    dropping the ``w (n - 1)`` phase (and the 1/n Jacobian).  This is the
    accuracy oracle for the small-field approximation; CASA handles w
    internally (reference delegation at casa/tasks.py:215-277).  See
    :func:`w_term_max_phase_error` for the a-priori bound and the
    warning ``simulate_observation`` emits when it is exceeded.
    """
    ny, nx = image.shape
    rdt = image.dtype
    cell_rad = jnp.asarray(cell_rad, rdt)
    u_wav = jnp.asarray(u_wav, rdt)
    v_wav = jnp.asarray(v_wav, rdt)
    w_wav = jnp.asarray(w_wav, rdt)
    cx = nx // 2 + _centre_shift(nx, centre)
    cy = ny // 2 + _centre_shift(ny, centre)
    l_ax = (jnp.arange(nx, dtype=rdt) - cx) * cell_rad
    m_ax = (jnp.arange(ny, dtype=rdt) - cy) * cell_rad
    ll, mm = jnp.meshgrid(l_ax, m_ax)
    nn = jnp.sqrt(jnp.maximum(1.0 - ll ** 2 - mm ** 2, 1e-12))
    flat_i = (image / nn).reshape(-1)
    flat_l = ll.reshape(-1)
    flat_m = mm.reshape(-1)
    flat_n1 = (nn - 1.0).reshape(-1)
    phase = -2.0 * jnp.pi * (
        u_wav[:, None] * flat_l[None, :] +
        v_wav[:, None] * flat_m[None, :] +
        w_wav[:, None] * flat_n1[None, :])
    re = jnp.cos(phase) @ flat_i
    im = jnp.sin(phase) @ flat_i
    return jax.lax.complex(re, im)


def w_term_max_phase_error(uvw_m, freq_hz: float,
                           field_radius_rad: float) -> float:
    """A-priori bound on the phase error [rad] of the coplanar (no-w)
    approximation: ``2 pi max|w_wav| (1 - cos theta) ~ pi w theta^2`` at
    the field edge.  Below ~0.1 rad the 2-D FFT sampler is
    indistinguishable from the full measurement equation (amplitude
    error <~ 1 - cos(phi) ~ 0.5%); the bound is validated against
    :func:`sample_vis_dft_w` in tests/test_synthobs.py."""
    w_max_m = float(np.max(np.abs(np.asarray(uvw_m)[:, 2]))) \
        if np.asarray(uvw_m).shape[1] > 2 else 0.0
    lam = 299792458.0 / float(freq_hz)
    theta = float(field_radius_rad)
    return 2.0 * np.pi * (w_max_m / lam) * (1.0 - np.cos(theta))


@partial(jax.jit, static_argnames=('pad', 'apply_pb', 'batch_size',
                                   'w_planes', 'degrid', 'pb_model',
                                   'pb_blockage_m', 'centre'))
def sample_vis_cube(sky, cell_rad, uvw, freqs, apply_pb: bool = False,
                    dish_diameter_m: float = 25.0, pad: int = _PAD,
                    batch_size: int = 4, w_planes: int = 0,
                    degrid: str = 'kb', pb_model: str = 'gaussian',
                    pb_blockage_m: float = 0.0, centre: str = 'pixel'):
    """Channel-batched visibility sampling: (n_chan, n_vis) complex.

    The scalable replacement for looping :func:`sample_vis` per channel in
    host Python (one compiled program, channels iterated on device — the
    1,000-channel RRL default of data/example-pipeline-params.py runs
    without 1,000 dispatches).  Each channel FFTs ITS OWN sky plane,
    applies the Gaussian primary beam at its own frequency in-device, and
    samples at uvw metres scaled to its own wavelength; ``batch_size``
    channels are vmapped per step to fill the chip.

    ``w_planes=0`` (default) is the coplanar small-field path;
    ``w_planes>=1`` routes through :func:`sample_vis_wstack` for
    long-baseline/wide-field configurations (``simulate_observation``
    selects this automatically via :func:`n_wplanes_for` when the
    :func:`w_term_max_phase_error` bound exceeds 0.1 rad).

    Args:
      sky:   (n_chan, ny, nx) sky cube [Jy/pixel]
      uvw:   (n_vis, >=2 — >=3 when w_planes >= 1) baseline coords [m]
      freqs: (n_chan,) channel frequencies [Hz]
    """
    sky = jnp.asarray(sky)
    rdt = sky.dtype
    ny, nx = sky.shape[-2:]
    c = 299792458.0
    cell_r = jnp.asarray(cell_rad, rdt)
    cy = ny // 2 + _centre_shift(ny, centre)
    cx = nx // 2 + _centre_shift(nx, centre)
    yy = (jnp.arange(ny, dtype=rdt) - cy) * cell_r
    xx = (jnp.arange(nx, dtype=rdt) - cx) * cell_r
    r2 = yy[:, None] ** 2 + xx[None, :] ** 2
    uvw = jnp.asarray(uvw, rdt)
    freqs = jnp.asarray(freqs, rdt)

    def one_channel(args):
        img, freq = args
        lam = c / freq
        if apply_pb:
            if pb_model == 'airy':
                img = img * airy_power(jnp.sqrt(r2), freq,
                                       dish_diameter_m, pb_blockage_m)
            else:
                fwhm = 1.2 * lam / dish_diameter_m
                img = img * jnp.exp(-4.0 * jnp.log(2.0) * r2 / fwhm ** 2)
        if w_planes >= 1:
            return sample_vis_wstack(
                img, cell_r, uvw[:, 0] / lam, uvw[:, 1] / lam,
                uvw[:, 2] / lam, n_wplanes=w_planes, pad=pad,
                degrid=degrid, centre=centre)
        return sample_vis(img, cell_r, uvw[:, 0] / lam, uvw[:, 1] / lam,
                          pad=pad, degrid=degrid, centre=centre)

    return jax.lax.map(one_channel, (sky, freqs),
                       batch_size=min(batch_size, sky.shape[0]))


@partial(jax.jit, static_argnames=('pad', 'apply_pb', 'batch_size',
                                   'w_planes', 'degrid', 'pb_model',
                                   'pb_blockage_m', 'centre'))
def _sample_vis_chunk(sky, cell_rad, uvw, freqs, key, sigma,
                      apply_pb: bool = False,
                      dish_diameter_m: float = 25.0,
                      pad: int = _PAD, batch_size: int = 4,
                      w_planes: int = 0, degrid: str = 'kb',
                      pb_model: str = 'gaussian',
                      pb_blockage_m: float = 0.0,
                      centre: str = 'pixel'):
    """One compiled sampling+noise dispatch over a channel slice —
    complex values exist only inside the program (the axon TPU runtime
    cannot transfer or eagerly operate on complex64/128)."""
    vis = sample_vis_cube(sky, cell_rad, uvw, freqs, apply_pb=apply_pb,
                          dish_diameter_m=dish_diameter_m, pad=pad,
                          batch_size=batch_size, w_planes=w_planes,
                          degrid=degrid, pb_model=pb_model,
                          pb_blockage_m=pb_blockage_m, centre=centre)
    noisy = add_noise(key, vis, sigma)
    return vis.real, vis.imag, noisy.real, noisy.imag


def sample_vis_cube_with_noise(sky, cell_rad, uvw, freqs, key, sigma,
                               apply_pb: bool = False,
                               dish_diameter_m: float = 25.0,
                               pad: int = _PAD, batch_size: int = 4,
                               w_planes: int = 0, degrid: str = 'kb',
                               pb_model: str = 'gaussian',
                               pb_blockage_m: float = 0.0,
                               chan_chunk: int = 256,
                               centre: str = 'pixel'):
    """Channel-batched sampling + thermal noise, returning real/imag
    pairs: ``(re_clean, im_clean, re_noisy, im_noisy)``.

    The channel axis runs in <= ``chan_chunk`` compiled dispatches: one
    device program spanning a 1,000-channel lax.map is long enough to
    crash the axon TPU worker (the same limit that chunks
    imaging.clean_cube; hit reproducibly on the bundled RRL pipeline's
    sampling stage in r4).  Chunks share one compiled program (the tail
    re-spans the last full chunk and slices the overlap off); <= one
    chunk reproduces the previous single-dispatch behaviour exactly,
    noise included.
    """
    n_chan = int(np.shape(freqs)[0])
    chunk = max(1, min(int(chan_chunk), n_chan))
    kw = dict(apply_pb=apply_pb, dish_diameter_m=dish_diameter_m,
              pad=pad, batch_size=batch_size, w_planes=w_planes,
              degrid=degrid, pb_model=pb_model,
              pb_blockage_m=pb_blockage_m, centre=centre)
    if n_chan <= chunk:
        return _sample_vis_chunk(sky, cell_rad, uvw, freqs, key, sigma,
                                 **kw)
    sky = jnp.asarray(sky)
    freqs = jnp.asarray(freqs)
    # per-channel noise (the tsys-atm model) must be sliced alongside
    # its channels; scalars pass through
    sig = jnp.asarray(sigma)
    per_chan = sig.ndim >= 1 and sig.shape[0] == n_chan
    parts = []
    for lo in range(0, n_chan, chunk):
        n_want = min(lo + chunk, n_chan) - lo
        # keep ONE compiled shape: the tail chunk re-spans the last
        # `chunk` channels (the overlap is recomputed and sliced off)
        start = lo if n_want == chunk else n_chan - chunk
        key, sub = jax.random.split(key)
        out = _sample_vis_chunk(
            sky[start:start + chunk], cell_rad, uvw,
            freqs[start:start + chunk], sub,
            sig[start:start + chunk] if per_chan else sigma, **kw)
        parts.append(tuple(o[chunk - n_want:] for o in out))
    return tuple(jnp.concatenate([p[i] for p in parts])
                 for i in range(4))


def _j1_over_x(x):
    """J1(x)/x for x >= 0 (Abramowitz & Stegun 9.4.4/9.4.6 rational
    approximations, |err| <~ 1e-7 absolute — jit/TPU-safe, no scipy).
    Continuous through x = 0 (value 1/2)."""
    x = jnp.abs(x)
    # |x| < 3: polynomial for J1(x)/x directly (A&S 9.4.4)
    t = (x / 3.0) ** 2
    small = (0.5 + t * (-0.56249985 + t * (0.21093573 + t * (
        -0.03954289 + t * (0.00443319 + t * (-0.00031761 +
                                             t * 0.00001109))))))
    # x >= 3: J1(x) = f1 cos(theta1)/sqrt(x) (A&S 9.4.6)
    xs = jnp.maximum(x, 3.0)
    u = 3.0 / xs
    f1 = (0.79788456 + u * (0.00000156 + u * (0.01659667 + u * (
        0.00017105 + u * (-0.00249511 + u * (0.00113653 -
                                             u * 0.00020033))))))
    th1 = (xs - 2.35619449 + u * (0.12499612 + u * (0.00005650 + u * (
        -0.00637879 + u * (0.00074348 + u * (0.00079824 -
                                             u * 0.00029166))))))
    large = f1 * jnp.cos(th1) / (xs * jnp.sqrt(xs))
    return jnp.where(x < 3.0, small, large)


def airy_power(theta_rad, freq_hz, dish_diameter_m: float,
               blockage_m: float = 0.0):
    """Airy power pattern |2 J1(x)/x|^2 of a circular aperture at offset
    ``theta_rad`` from boresight (x = pi D theta / lambda), optionally
    with a central blockage of diameter ``blockage_m`` — the
    voltage-pattern family CASA's vpmanager assigns to real dishes
    (VLA/ALMA), as opposed to the Gaussian the reference registers for
    e-MERLIN."""
    lam = 299792458.0 / freq_hz
    x = jnp.pi * dish_diameter_m * theta_rad / lam
    b = blockage_m / dish_diameter_m
    # branchless (b may be traced): at b = 0 the correction term is
    # exactly 0 and the normalisation 1
    v = (2.0 * _j1_over_x(x) - b * b * 2.0 * _j1_over_x(b * x)) / \
        (1.0 - b * b)
    return v * v


def primary_beam(n_y: int, n_x: int, cell_rad: float, freq_hz: float,
                 dish_diameter_m: float, model: str = 'gaussian',
                 blockage_m: float = 0.0) -> np.ndarray:
    """Primary-beam attenuation pattern over the sky-model grid.

    ``model='gaussian'``: FWHM = 1.2 lambda / D (the Gaussian-PB model
    the reference registers with CASA's vpmanager for e-MERLIN,
    casa/_interface.py:17-27 / tasks.py:479-502).
    ``model='airy'``: blocked-aperture Airy power pattern (the pattern
    CASA's simobserve applies for VLA/ALMA-class dishes)."""
    lam = 299792458.0 / freq_hz
    yy, xx = np.mgrid[0:n_y, 0:n_x]
    r2 = (((xx - n_x // 2) * cell_rad) ** 2 +
          ((yy - n_y // 2) * cell_rad) ** 2)
    if model == 'airy':
        return np.asarray(airy_power(np.sqrt(r2), freq_hz,
                                     dish_diameter_m, blockage_m))
    if model != 'gaussian':
        raise ValueError(f"unknown primary-beam model {model!r} "
                         "(gaussian/airy)")
    fwhm = 1.2 * lam / dish_diameter_m
    return np.exp(-4.0 * np.log(2.0) * r2 / fwhm ** 2)


def thermal_noise_sigma(sefd: float, chan_width: float, t_int: float,
                        eta: float = 0.88) -> float:
    """Per-visibility per-polarisation noise RMS [Jy] from the radiometer
    equation: sigma = SEFD / (eta sqrt(2 dnu tau))."""
    return sefd / (eta * np.sqrt(2.0 * chan_width * t_int))


def add_noise(key, vis, sigma):
    """Complex Gaussian thermal noise (sigma per real/imag part).  Noise
    dtype follows the visibilities' (complex128 is unsupported on TPU, so
    the TPU path runs complex64 throughout).  ``sigma`` may be a scalar
    or per-channel (n_chan,) — e.g. from the 'tsys-atm' noise model
    (synthobs.atmosphere) where Tsys varies across the band."""
    rdt = jnp.real(vis).dtype
    kr, ki = jax.random.split(key)
    # lax.complex, not 1j*…: an eager python-1j materialises a complex128
    # scalar under x64, which the TPU backend rejects outright
    noise = jax.lax.complex(jax.random.normal(kr, vis.shape, dtype=rdt),
                            jax.random.normal(ki, vis.shape, dtype=rdt))
    sig = jnp.asarray(sigma, rdt)
    if sig.ndim == 1:
        if vis.ndim != 2:
            raise ValueError(
                "per-channel sigma requires (n_chan, n_vis) visibilities; "
                f"got vis.ndim={vis.ndim}")
        sig = sig[:, None]  # per-channel over (n_chan, n_vis)
    return vis + sig * noise
