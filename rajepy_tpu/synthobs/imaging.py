"""Interferometric imaging: gridding, weighting, dirty images, Hogbom
CLEAN, beam fitting and restoration — all on device.

Replaces the reference's CASA ``tclean`` invocation (casa/tasks.py:215-277,
defaults briggs robust=0.5, niter=500, nsigma=3.0 set at
classes.py:2771-2782) with JAX kernels: scatter-add gridding, FFT dirty
images, a `lax.while_loop` Hogbom minor cycle, and an analytic Gaussian
restoring beam fitted to the PSF core.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('n_pix',))
def grid_weights(u_wav, v_wav, weights, n_pix: int, cell_rad: float):
    """Scatter weights onto the uv grid (conjugate-symmetrised); returns the
    (n_pix, n_pix) weight-density grid used for uniform/briggs weighting."""
    cell_rad = jnp.asarray(cell_rad, weights.dtype)  # no x64 promotion
    du = 1.0 / (n_pix * cell_rad)
    gu = jnp.round(u_wav / du).astype(jnp.int32) + n_pix // 2
    gv = jnp.round(v_wav / du).astype(jnp.int32) + n_pix // 2
    ok = ((gu >= 0) & (gu < n_pix) & (gv >= 0) & (gv < n_pix))
    w = jnp.where(ok, weights, 0.0)
    grid = jnp.zeros((n_pix, n_pix), dtype=weights.dtype)
    grid = grid.at[gv, gu].add(w)
    # conjugate points
    gu2 = n_pix - gu
    gv2 = n_pix - gv
    ok2 = ((gu2 >= 0) & (gu2 < n_pix) & (gv2 >= 0) & (gv2 < n_pix))
    grid = grid.at[jnp.where(ok2, gv2, 0),
                   jnp.where(ok2, gu2, 0)].add(jnp.where(ok2, w, 0.0))
    return grid


def briggs_weights(u_wav, v_wav, weights, n_pix: int, cell_rad: float,
                   robust: float = 0.5):
    """Briggs (1995) robust weighting: w_i / (1 + W_k f^2) with
    f^2 = (5 * 10^-robust)^2 / (sum W_k^2 / sum w_i).  robust=+2 ~ natural,
    -2 ~ uniform; tclean's default robust=0.5 (casa/tasks.py:242)."""
    dens = grid_weights(u_wav, v_wav, weights, n_pix, cell_rad)
    cell_rad = jnp.asarray(cell_rad, weights.dtype)
    du = 1.0 / (n_pix * cell_rad)
    gu = jnp.round(u_wav / du).astype(jnp.int32) + n_pix // 2
    gv = jnp.round(v_wav / du).astype(jnp.int32) + n_pix // 2
    gu = jnp.clip(gu, 0, n_pix - 1)
    gv = jnp.clip(gv, 0, n_pix - 1)
    w_k = dens[gv, gu]
    # sum W_k^2 over uv CELLS == sum_i w_i * W_cell(i) over visibilities
    # (W_cell = sum of weights in the cell); summing W_k^2 per visibility
    # instead would weight each cell by its occupancy a second time and
    # make the effective robust drift with track length.  The conjugate
    # symmetrisation in grid_weights scales every W_k by the same factor,
    # which cancels exactly in the W_k * f^2 product.
    f2 = (5.0 * 10.0 ** -robust) ** 2 / (jnp.sum(weights * w_k) /
                                         jnp.maximum(jnp.sum(weights), 1e-30))
    return weights / (1.0 + w_k * f2)


_GRID_MATMUL_MAX = 32_000_000   # max n_vis * n_pix for the matmul grid
_GRID_SIGMA = 0.65  # gridding-kernel width in uv cells


@partial(jax.jit, static_argnames=('n_pix', 'support'))
def grid_and_image(u_wav, v_wav, vis, weights, n_pix: int, cell_rad: float,
                   support: int = 2):
    """Grid weighted visibilities and FFT to the sky plane.

    Convolutional gridding with a Gaussian kernel of ``support`` cells
    half-width (5x5 footprint by default; 2.5e-4 off-centre amplitude
    error vs 2.4e-2 at 3x3) followed by grid correction
    (division by the kernel's image-plane transform) — the standard
    anti-aliasing treatment (CASA uses a prolate spheroidal; a Gaussian
    keeps the correction closed-form).  Returns (dirty_image, dirty_beam),
    both (n_pix, n_pix), beam peak normalised to 1 and the image in
    Jy/dirty-beam.
    """
    cell_rad = jnp.asarray(cell_rad, jnp.real(vis).dtype)
    u_wav = jnp.asarray(u_wav, cell_rad.dtype)
    v_wav = jnp.asarray(v_wav, cell_rad.dtype)
    weights = jnp.asarray(weights, cell_rad.dtype)
    du = 1.0 / (n_pix * cell_rad)
    fu = u_wav / du + n_pix // 2
    fv = v_wav / du + n_pix // 2
    iu = jnp.round(fu).astype(jnp.int32)
    iv = jnp.round(fv).astype(jnp.int32)
    ok = ((iu >= support) & (iu < n_pix - support) &
          (iv >= support) & (iv < n_pix - support))
    w = jnp.where(ok, weights, 0.0)
    iu_s = jnp.where(ok, iu, n_pix // 2)
    iv_s = jnp.where(ok, iv, n_pix // 2)

    cdtype = (jnp.complex64 if jnp.result_type(vis) == jnp.complex64
              else jnp.complex128)
    rdtype = jnp.float32 if cdtype == jnp.complex64 else jnp.float64
    inv2s2 = 1.0 / (2.0 * _GRID_SIGMA ** 2)
    n_vis = int(u_wav.shape[0])
    if n_vis * n_pix <= _GRID_MATMUL_MAX:
        # matmul gridding: the Gaussian kernel is separable, so the
        # whole convolution is two dense matmuls on the MXU —
        # grid[j, i] = sum_k Av[k, j] Au[k, i] x_k — instead of
        # (2 support + 1)^2 x 2 scatter-adds (TPU scatters serialise;
        # the scatter form cost 8.6 s per 256-channel chunk, the matmul
        # form milliseconds).  Falls back to the scatter loop for very
        # large point counts where the (n_vis, n_pix) factors would not
        # fit (the multi-frequency-synthesis path).
        p = jnp.arange(n_pix, dtype=rdtype)
        du = p[None, :] - fu[:, None]
        au = jnp.exp(-du * du * inv2s2) * \
            (jnp.abs(p[None, :] - iu_s[:, None].astype(rdtype))
             <= support)
        dv = p[None, :] - fv[:, None]
        av = jnp.exp(-dv * dv * inv2s2) * \
            (jnp.abs(p[None, :] - iv_s[:, None].astype(rdtype))
             <= support)
        av_w = av * w[:, None]
        wgt_grid = av_w.T @ au
        vr = (av_w * jnp.real(vis)[:, None]).T @ au
        vi = (av_w * jnp.imag(vis)[:, None]).T @ au

        def herm(g, sign):
            # conj contributions land at (n - v, n - u); index-0 targets
            # map to n (out of range) and are dropped, matching the
            # scatter form's bounds check
            gf = jnp.roll(g[::-1, ::-1], (1, 1), (0, 1))
            gf = gf.at[0, :].set(0.0).at[:, 0].set(0.0)
            return g + sign * gf

        wgt_grid = herm(wgt_grid, 1.0)
        vis_grid = jax.lax.complex(herm(vr, 1.0),
                                   herm(vi, -1.0)).astype(cdtype)
    else:
        vis_grid = jnp.zeros((n_pix, n_pix), dtype=cdtype)
        wgt_grid = jnp.zeros((n_pix, n_pix), dtype=rdtype)
        for dj in range(-support, support + 1):
            for di in range(-support, support + 1):
                gw = w * jnp.exp(-((iu_s + di - fu) ** 2 +
                                   (iv_s + dj - fv) ** 2) * inv2s2)
                gwv = gw * vis
                vis_grid = vis_grid.at[iv_s + dj, iu_s + di].add(gwv)
                wgt_grid = wgt_grid.at[iv_s + dj, iu_s + di].add(gw)
                # Hermitian conjugate points
                cu = n_pix - (iu_s + di)
                cv = n_pix - (iv_s + dj)
                okc = (cu >= 0) & (cu < n_pix) & (cv >= 0) & (cv < n_pix)
                vis_grid = vis_grid.at[jnp.where(okc, cv, 0),
                                       jnp.where(okc, cu, 0)].add(
                    jnp.where(okc, jnp.conj(gwv), 0.0))
                wgt_grid = wgt_grid.at[jnp.where(okc, cv, 0),
                                       jnp.where(okc, cu, 0)].add(
                    jnp.where(okc, gw, 0.0))

    norm = jnp.maximum(jnp.sum(wgt_grid), 1e-30)
    img = jnp.fft.fftshift(jnp.fft.ifft2(jnp.fft.ifftshift(vis_grid))).real
    psf = jnp.fft.fftshift(jnp.fft.ifft2(jnp.fft.ifftshift(
        wgt_grid.astype(cdtype)))).real

    # grid correction: FT of the (cell-sampled) Gaussian kernel
    p = jnp.arange(n_pix, dtype=rdtype) - n_pix // 2
    corr_1d = jnp.exp(-2.0 * jnp.pi ** 2 * _GRID_SIGMA ** 2 *
                      (p / n_pix) ** 2)
    corr = jnp.outer(corr_1d, corr_1d)
    scale = n_pix * n_pix / norm
    return img * scale / corr, psf * scale / corr


@partial(jax.jit, static_argnames=('niter',))
def hogbom_clean(dirty, psf, mask, gain: float = 0.1, niter: int = 500,
                 threshold: float = 0.0):
    """Hogbom CLEAN minor cycle as a bounded `lax.while_loop`.

    ``psf`` must be the same shape as ``dirty`` with its peak at the centre
    pixel; ``mask`` restricts component placement (the reference builds a
    clean box from the model's bounding box, classes.py:2748-2751).

    Returns (model, residual, n_iterations).
    """
    n = dirty.shape[0]
    centre = n // 2
    gain = jnp.asarray(gain, dirty.dtype)
    threshold = jnp.asarray(threshold, dirty.dtype)
    # pad psf so any shift keeps full support
    psf_pad = jnp.pad(psf, ((n // 2, n // 2), (n // 2, n // 2)))

    def cond(state):
        model, res, it = state
        peak = jnp.max(jnp.abs(res * mask))
        return (it < niter) & (peak > threshold)

    def body(state):
        model, res, it = state
        masked = jnp.abs(res * mask)
        idx = jnp.argmax(masked)
        py, px = idx // n, idx % n
        val = res[py, px] * gain
        model = model.at[py, px].add(val)
        shifted = jax.lax.dynamic_slice(
            psf_pad, (centre + n // 2 - py, centre + n // 2 - px), (n, n))
        res = res - val * shifted
        return model, res, it + 1

    model0 = jnp.zeros_like(dirty)
    model, residual, its = jax.lax.while_loop(
        cond, body, (model0, dirty, jnp.asarray(0, jnp.int32)))
    return model, residual, its


@partial(jax.jit, static_argnames=('niter',))
def hogbom_clean_batched(dirty, psf, mask, thresholds, gain: float = 0.1,
                         niter: int = 500):
    """Hogbom CLEAN with the channel axis batched INSIDE the minor-cycle
    loop: every iteration peak-finds and subtracts on all still-active
    channels at once.

    The serial per-channel loop (:func:`hogbom_clean` under ``lax.map``)
    is latency-bound on TPU — one n_pix^2 image per step cannot fill the
    VPU, and the loop-carried dependency chain costs ~100 us/iteration;
    batching ~256 channels turns the same steps bandwidth-bound (~10x on
    the 1,000-channel cube, BASELINE.md stage table).  Per-channel maths
    is IDENTICAL to the serial kernel — a channel whose masked peak
    drops below its threshold contributes zero-valued updates while the
    rest finish — so results match :func:`hogbom_clean` exactly
    (pinned in tests/test_synthobs.py).

    Args:
      dirty: (n_chan, n, n); psf: (n_chan, n, n) centre-peaked;
      mask: (n, n); thresholds: (n_chan,) per-channel stop levels.
    Returns (model, residual, n_iterations) with the channel axis kept.
    """
    nc, n, _ = dirty.shape
    centre = n // 2
    gain = jnp.asarray(gain, dirty.dtype)
    thr = jnp.asarray(thresholds, dirty.dtype).reshape(nc)
    psf_pad = jnp.pad(psf, ((0, 0), (n // 2, n // 2), (n // 2, n // 2)))
    ch = jnp.arange(nc)

    def peaks_of(res):
        flat = jnp.abs(res * mask[None]).reshape(nc, -1)
        return jnp.max(flat, axis=1), jnp.argmax(flat, axis=1)

    def cond(state):
        _model, _res, it, peaks, _idx = state
        return (it < niter) & jnp.any(peaks > thr)

    def body(state):
        model, res, it, peaks, idx = state
        py, px = idx // n, idx % n
        active = peaks > thr
        val = jnp.where(active, res[ch, py, px] * gain,
                        jnp.zeros((), res.dtype))
        model = model.at[ch, py, px].add(val)
        shifted = jax.vmap(
            lambda p, y, x: jax.lax.dynamic_slice(
                p, (centre + n // 2 - y, centre + n // 2 - x),
                (n, n)))(psf_pad, py, px)
        res = res - val[:, None, None] * shifted
        peaks, idx = peaks_of(res)
        return model, res, it + 1, peaks, idx

    model0 = jnp.zeros_like(dirty)
    p0, i0 = peaks_of(dirty)
    model, residual, its, _, _ = jax.lax.while_loop(
        cond, body, (model0, dirty, jnp.asarray(0, jnp.int32), p0, i0))
    return model, residual, its


@partial(jax.jit, static_argnames=('niter', 'cycleniter', 'psf_patch'))
def clark_clean(dirty, psf, mask, gain: float = 0.1, niter: int = 500,
                threshold: float = 0.0, cycleniter: int = 100,
                cyclefactor: float = 1.0, minpsffraction: float = 0.05,
                maxpsffraction: float = 0.8, psf_patch: int = 0):
    """Clark (1980) CLEAN: patch minor cycles + exact FFT major cycles.

    The deconvolver behind tclean's DEFAULT ``deconvolver='clark'``
    (the reference's wrapper default, casa/tasks.py:243): minor cycles
    subtract only the central ``psf_patch``-pixel patch of the PSF —
    a (p, p) ``dynamic_update_slice`` instead of Hogbom's full (n, n)
    subtraction — and every major cycle recomputes the residual exactly
    as ``dirty - model * psf`` by FFT, erasing the accumulated
    patch-truncation error.  The minor cycle stops at
    ``peak * clip(cyclefactor * sidelobe, minpsffraction,
    maxpsffraction)`` where ``sidelobe`` is the largest |PSF| value
    outside the patch (the scale of the error a patch-only subtraction
    can commit) — tclean's cyclefactor/minpsffraction/maxpsffraction
    semantics.

    Converges to the same model as :func:`hogbom_clean` (same greedy
    component selection; the major cycles keep the residual honest) at
    a fraction of the per-iteration work for ``psf_patch << n``.

    Returns (model, residual, n_minor_iterations); ``residual`` is the
    exact ``dirty - model * psf``.
    """
    n = dirty.shape[0]
    c = n // 2
    if psf_patch <= 0:
        psf_patch = max(32, n // 4)
    p = min(int(psf_patch), n)
    p -= p % 2
    q = p // 2
    rdt = dirty.dtype
    gain = jnp.asarray(gain, rdt)
    threshold = jnp.asarray(threshold, rdt)
    patch = jax.lax.slice(psf, (c - q, c - q), (c + q, c + q))
    box = jnp.zeros_like(psf).at[c - q:c + q, c - q:c + q].set(1.0)
    ext = jnp.max(jnp.abs(psf) * (1.0 - box))
    frac = jnp.clip(jnp.asarray(cyclefactor, rdt) * ext,
                    minpsffraction, maxpsffraction).astype(rdt)
    mask_pad = jnp.pad(jnp.asarray(mask, rdt), q)
    npad = n + p
    fpsf = jnp.fft.rfft2(jnp.fft.ifftshift(psf))

    def masked_peak(res_pad):
        a = jnp.abs(res_pad * mask_pad).reshape(-1)
        return jnp.max(a), jnp.argmax(a)

    def exact_residual(model):
        return dirty - jnp.fft.irfft2(jnp.fft.rfft2(model) * fpsf,
                                      s=(n, n))

    def minor_cond(s):
        _m, _r, j, tot, peak, _i, stop = s
        return (j < cycleniter) & (tot + j < niter) & (peak > stop)

    def minor_body(s):
        model, res_pad, j, tot, peak, idx, stop = s
        pyp, pxp = idx // npad, idx % npad
        val = res_pad[pyp, pxp] * gain
        model = model.at[pyp - q, pxp - q].add(val)
        win = jax.lax.dynamic_slice(res_pad, (pyp - q, pxp - q), (p, p))
        res_pad = jax.lax.dynamic_update_slice(
            res_pad, win - val * patch, (pyp - q, pxp - q))
        peak, idx = masked_peak(res_pad)
        return model, res_pad, j + 1, tot, peak, idx, stop

    def outer_cond(s):
        _m, _r, tot, peak = s
        return (tot < niter) & (peak > threshold)

    def outer_body(s):
        model, res_pad, tot, peak = s
        stop = jnp.maximum(frac * peak, threshold)
        p0, i0 = masked_peak(res_pad)
        model, res_pad, j, _, _, _, _ = jax.lax.while_loop(
            minor_cond, minor_body,
            (model, res_pad, jnp.asarray(0, jnp.int32), tot, p0, i0,
             stop))
        res_pad = jnp.pad(exact_residual(model), q)
        peak, _ = masked_peak(res_pad)
        return model, res_pad, tot + j, peak

    model0 = jnp.zeros_like(dirty)
    res_pad0 = jnp.pad(dirty, q)
    peak0, _ = masked_peak(res_pad0)
    model, res_pad, tot, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (model0, res_pad0, jnp.asarray(0, jnp.int32), peak0))
    residual = jax.lax.slice(res_pad, (q, q), (q + n, q + n))
    return model, residual, tot


def _centred_conv2(*fields):
    """Circular convolution of centre-origin fields via FFT (all centred
    at n//2; result centred).  Accepts 2+ factors."""
    acc = None
    for f in fields:
        g = jnp.fft.fft2(jnp.fft.ifftshift(f))
        acc = g if acc is None else acc * g
    return jnp.fft.fftshift(jnp.fft.ifft2(acc)).real


def _ms_scale_kernel(n: int, scale_pix: float, dtype):
    """Multiscale component shape: a delta for scale 0, else a unit-sum
    Gaussian of FWHM ``scale_pix`` pixels, centred at n//2."""
    if scale_pix <= 0:
        return jnp.zeros((n, n), dtype).at[n // 2, n // 2].set(1.0)
    sig = scale_pix / 2.3548200450309493
    ax = jnp.arange(n, dtype=dtype) - n // 2
    g = jnp.exp(-0.5 * (ax / sig) ** 2)
    k = g[:, None] * g[None, :]
    return (k / jnp.sum(k)).astype(dtype)


@partial(jax.jit, static_argnames=('scales', 'niter'))
def multiscale_clean(dirty, psf, mask, scales=(0, 3, 10),
                     gain: float = 0.1, niter: int = 500,
                     threshold: float = 0.0,
                     smallscalebias: float = 0.0):
    """Multiscale CLEAN (Cornwell 2008) as a bounded ``lax.while_loop``.

    The deconvolver behind tclean's ``deconvolver='multiscale'`` /
    ``scales`` / ``smallscalebias`` parameters (the reference's typed
    wrapper exposes them at casa/tasks.py:242-244): each minor cycle
    peak-finds jointly over per-scale residuals ``D_s = dirty * k_s``
    (``k_s`` a delta at scale 0, else a Gaussian of FWHM ``scales[s]``
    pixels) and subtracts the matching cross-scale beam
    ``P_st = psf * k_s * k_t`` from every scale's residual, so extended
    jet lobes are absorbed by few large components instead of thousands
    of deltas.  All scale convolutions are precomputed FFTs; the
    per-iteration work is one (S, n, n) argmax plus S shifted-beam
    subtractions (``dynamic_slice`` on the padded cross-beams, as in
    :func:`hogbom_clean`).

    ``smallscalebias`` (CASA meaning, default 0.0 = unbiased): peak
    selection weights scale s by ``1 - smallscalebias * scale_s /
    max(scales)``.

    Returns ``(model_image, residual, n_iterations)`` — the model is a
    sky image (components already shaped), residual is computed exactly
    as ``dirty - model * psf``.
    """
    if scales[0] != 0:
        raise ValueError("scales[0] must be 0 (the stop threshold is "
                         "evaluated on the full-resolution residual)")
    n = dirty.shape[0]
    centre = n // 2
    rdt = dirty.dtype
    S = len(scales)
    gain = jnp.asarray(gain, rdt)
    threshold = jnp.asarray(threshold, rdt)

    ks = jnp.stack([_ms_scale_kernel(n, float(s), rdt) for s in scales])
    fks = jnp.fft.fft2(jnp.fft.ifftshift(ks, axes=(-2, -1)))
    fpsf = jnp.fft.fft2(jnp.fft.ifftshift(psf))
    fdirty = jnp.fft.fft2(jnp.fft.ifftshift(dirty))

    def _ifft_c(f):
        return jnp.fft.fftshift(jnp.fft.ifft2(f), axes=(-2, -1)).real

    d_stack = _ifft_c(fks * fdirty[None])                     # (S, n, n)
    p_cross = _ifft_c(fks[:, None] * fks[None, :] *
                      fpsf[None, None])                       # (S, S, n, n)
    pss_centre = p_cross[jnp.arange(S), jnp.arange(S), centre, centre]
    p_pad = jnp.pad(p_cross,
                    ((0, 0), (0, 0), (n // 2, n // 2), (n // 2, n // 2)))

    max_scale = max(float(s) for s in scales) or 1.0
    bias = jnp.asarray([1.0 - smallscalebias * float(s) / max_scale
                        for s in scales], rdt)
    # scale selection maximises the chi^2 reduction of the greedy step:
    # subtracting amp*k_s (amp = D_s[p]/P_ss(0)) reduces the residual
    # power by D_s[p]^2 / P_ss(0) — so weight each scale's residual by
    # 1/sqrt(P_ss(0)).  Comparing raw smoothed peaks instead always
    # picks scale 0 (smoothing can only lower a peak).
    sel_w = bias / jnp.sqrt(pss_centre)

    def peaks_of(d):
        # stop criterion on the full-resolution (scale-0) residual peak,
        # the quantity `threshold` is expressed in [Jy/dirty-beam]
        stop_peak = jnp.max(jnp.abs(d[0] * mask))
        flat = (jnp.abs(d * mask[None]) *
                sel_w[:, None, None]).reshape(-1)
        return stop_peak, jnp.argmax(flat)

    def cond(state):
        _m, _d, it, peak, _idx = state
        return (it < niter) & (peak > threshold)

    def body(state):
        m, d, it, peak, idx = state
        s = idx // (n * n)
        py = (idx // n) % n
        px = idx % n
        amp = d[s, py, px] / pss_centre[s] * gain
        m = m.at[s, py, px].add(amp)
        shifted = jax.vmap(
            lambda p: jax.lax.dynamic_slice(
                p, (centre + n // 2 - py, centre + n // 2 - px),
                (n, n)))(p_pad[s])
        d = d - amp * shifted
        peak, idx = peaks_of(d)
        return m, d, it + 1, peak, idx

    m0 = jnp.zeros((S, n, n), rdt)
    p0, i0 = peaks_of(d_stack)
    m, d, its, _, _ = jax.lax.while_loop(
        cond, body, (m0, d_stack, jnp.asarray(0, jnp.int32), p0, i0))

    fmod = jnp.sum(jnp.fft.fft2(jnp.fft.ifftshift(m, axes=(-2, -1))) *
                   fks, axis=0)
    model = jnp.fft.fftshift(jnp.fft.ifft2(fmod)).real
    residual = dirty - _centred_conv2(model, psf)
    return model, residual, its


@partial(jax.jit, static_argnames=('nterms',))
def taylor_stacks(dirty_c, psf_c, freqs, ref_freq, nterms: int = 2):
    """Taylor-weighted image/PSF moment stacks for multi-term MFS.

    Rau & Cornwell (2011, A&A 532, A71) wideband imaging: with
    ``w_c = (nu_c - nu_ref) / nu_ref``, the Taylor dirty images are
    ``I_t = (1/N) sum_c w_c^t D_c`` (t < nterms) and the PSF moment
    stack ``P_s = (1/N) sum_c w_c^s B_c`` for s < 2*nterms - 1 — the
    Hessian blocks ``H_tq = P_{t+q}`` depend only on t + q.  Inputs are
    per-channel dirty images and peak-normalised PSFs on a common grid.

    Returns (dirty_t (nterms, n, n), psf_m (2*nterms - 1, n, n)).
    """
    freqs = jnp.asarray(freqs, dirty_c.dtype)
    w = (freqs - ref_freq) / ref_freq
    n_chan = freqs.shape[0]
    wt = jnp.stack([w ** t for t in range(2 * nterms - 1)])
    psf_m = jnp.einsum('sc,cij->sij', wt, psf_c) / n_chan
    dirty_t = jnp.einsum('tc,cij->tij', wt[:nterms], dirty_c) / n_chan
    return dirty_t, psf_m


@partial(jax.jit, static_argnames=('niter',))
def mtmfs_clean(dirty_t, psf_m, mask, gain: float = 0.1, niter: int = 500,
                threshold: float = 0.0):
    """Multi-term (Taylor-polynomial) multi-frequency-synthesis CLEAN.

    The deconvolver behind tclean's ``deconvolver='mtmfs'`` /
    ``nterms`` (exposed by the reference's wrapper, casa/tasks.py:246):
    each minor cycle peak-finds on the order-0 residual, solves the
    (nterms, nterms) Hessian system ``H a = r`` at the peak for the
    Taylor-coefficient amplitudes jointly (H_tq = psf_m[t+q] at zero
    lag), and subtracts ``sum_q a_q P_{t+q}`` from every order's
    residual — so a source with a spectral slope is absorbed into
    (I_0, I_1, ...) components instead of leaving per-channel
    sidelobe-scaled errors.  ``alpha = I_1 / I_0`` is the in-band
    spectral index map (Rau & Cornwell 2011 eq. 2).

    Args:
      dirty_t: (nterms, n, n) Taylor dirty images (:func:`taylor_stacks`)
      psf_m:   (2*nterms - 1, n, n) PSF moment stack, psf_m[0] peak 1
      mask:    (n, n) CLEAN box

    Returns (model_t, residual_t, n_iterations), both (nterms, n, n);
    the stop criterion is the masked order-0 residual peak vs
    ``threshold``.
    """
    nterms, n, _ = dirty_t.shape
    c = n // 2
    rdt = dirty_t.dtype
    gain = jnp.asarray(gain, rdt)
    threshold = jnp.asarray(threshold, rdt)
    mask = jnp.asarray(mask, rdt)
    ti = jnp.arange(nterms)
    tq = ti[:, None] + ti[None, :]                     # (nterms, nterms)
    hess = psf_m[tq, c, c]
    inv_h = jnp.linalg.inv(hess)
    psf_pad = jnp.pad(psf_m, ((0, 0), (n // 2, n // 2),
                              (n // 2, n // 2)))

    def peak_of(res_t):
        a = jnp.abs(res_t[0] * mask).reshape(-1)
        return jnp.max(a), jnp.argmax(a)

    def cond(s):
        _m, _r, it, peak, _i = s
        return (it < niter) & (peak > threshold)

    def body(s):
        model, res_t, it, peak, idx = s
        py, px = idx // n, idx % n
        r = res_t[:, py, px]
        a = gain * (inv_h @ r)
        model = model.at[:, py, px].add(a)
        shifted = jax.vmap(
            lambda pm: jax.lax.dynamic_slice(
                pm, (c + n // 2 - py, c + n // 2 - px), (n, n)))(psf_pad)
        res_t = res_t - jnp.einsum('q,tqij->tij', a, shifted[tq])
        peak, idx = peak_of(res_t)
        return model, res_t, it + 1, peak, idx

    m0 = jnp.zeros_like(dirty_t)
    p0, i0 = peak_of(dirty_t)
    model, res_t, its, _, _ = jax.lax.while_loop(
        cond, body, (m0, dirty_t, jnp.asarray(0, jnp.int32), p0, i0))
    return model, res_t, its


@partial(jax.jit, static_argnames=('n_pix', 'support'))
def grid_and_image_parts(u_wav, v_wav, vis_re, vis_im, weights, n_pix: int,
                         cell_rad: float, support: int = 2):
    """:func:`grid_and_image` with the visibilities as (re, im) float
    pairs — complex arrays cannot cross the host<->device boundary on the
    axon TPU backend."""
    return grid_and_image(u_wav, v_wav, jax.lax.complex(vis_re, vis_im),
                          weights, n_pix, cell_rad, support=support)


def clean_cube(uvw_m, freqs, vis_re, vis_im, weights, n_pix: int,
               cell_rad: float, mask, beam_kernel,
               weighting: str = 'briggs', robust: float = 0.5,
               gain: float = 0.1, niter: int = 500, nsigma: float = 3.0,
               chan_chunk: int = 256):
    """Per-channel imaging of a visibility cube as ONE compiled program.

    The scalable replacement for tclean's ``specmode='cube'``
    (classes.py:2771-2782): for every channel — weighting, convolutional
    gridding, FFT dirty image/PSF, an nsigma threshold from the dirty
    image's out-of-mask RMS, Hogbom CLEAN and Gaussian restoration — runs
    inside a device-side ``lax.map`` over the channel axis, so a
    1,000-channel RRL cube is one dispatch, not 1,000 host iterations.
    The per-channel uv wavelengths are derived in-device from the shared
    uvw metres (no (n_chan, n_vis) coordinate cube in host memory).

    Args:
      uvw_m:  (n_vis, >=2) baseline coordinates [m]
      freqs:  (n_chan,) channel frequencies [Hz]
      vis_re: (n_chan, n_vis) visibility real parts [Jy]
      vis_im: (n_chan, n_vis) visibility imaginary parts [Jy]
      weights:(n_vis,) base (natural) visibility weights
      mask:   (n_pix, n_pix) CLEAN box
      beam_kernel: (n_pix, n_pix) unit-peak restoring beam (common beam)

    Returns (restored, dirty): both (n_chan, n_pix, n_pix) [Jy/beam].
    (Visibilities enter as float pairs: complex arrays cannot cross the
    host<->device boundary on the axon TPU backend.)

    The channel axis is processed in ``chan_chunk``-sized dispatches: a
    single device program scanning ~1,000 channels with stacked
    image-cube outputs crashes the remote TPU worker (observed on axon
    with the bundled 1,000-channel RRL configuration; <=256-channel
    programs are fine), and chunking also bounds peak HBM.  The last
    chunk is zero-padded to the chunk size so every dispatch reuses ONE
    compiled program.
    """
    freqs = jnp.asarray(freqs)
    n_chan = int(freqs.shape[0])
    if n_chan > chan_chunk:
        vis_re = jnp.asarray(vis_re)
        vis_im = jnp.asarray(vis_im)
        # dispatch every chunk first (async), then drain restored chunks
        # to the host in order: on remote backends (axon tunnel,
        # ~20 MB/s device->host) the copy of chunk k overlaps the device
        # still CLEANing chunks k+1.., hiding most of the gigabyte-scale
        # cube transfer behind compute.  The host drain is only legal
        # eagerly: under a trace, refuse loudly — silently building one
        # program over all channels would reproduce the documented
        # >256-channel TPU worker crash far from its cause.
        import jax.core as _core
        if isinstance(freqs, _core.Tracer):
            raise ValueError(
                f"clean_cube with {n_chan} > chan_chunk={chan_chunk} "
                "channels chunks on the HOST and cannot run inside a "
                "traced context (jit/shard_map). Chunk the channel axis "
                "outside the trace, or raise chan_chunk only if the "
                "backend tolerates programs that long.")
        pend = []
        for s in range(0, n_chan, chan_chunk):
            e = min(s + chan_chunk, n_chan)
            pad = chan_chunk - (e - s)
            fr = freqs[s:e]
            vr = vis_re[s:e]
            vi = vis_im[s:e]
            if pad:
                fr = jnp.concatenate([fr, jnp.broadcast_to(fr[-1:],
                                                           (pad,))])
                zpad = jnp.zeros((pad,) + vr.shape[1:], vr.dtype)
                vr = jnp.concatenate([vr, zpad])
                vi = jnp.concatenate([vi, zpad])
            r, d = clean_cube(uvw_m, fr, vr, vi, weights, n_pix,
                              cell_rad, mask, beam_kernel,
                              weighting=weighting, robust=robust,
                              gain=gain, niter=niter, nsigma=nsigma,
                              chan_chunk=chan_chunk)
            pend.append((e - s, r, d))
        outs_r = [np.asarray(r[:n]) for n, r, _ in pend]
        restored = np.concatenate(outs_r)
        # dirty images stay on device (lazy — callers rarely fetch them)
        dirty = jnp.concatenate([d[:n] for n, _, d in pend])
        return restored, dirty

    return _clean_cube_chunk(uvw_m, freqs, vis_re, vis_im, weights,
                             n_pix, cell_rad, mask, beam_kernel,
                             weighting, robust, gain, niter, nsigma)


@partial(jax.jit, static_argnames=('n_pix', 'weighting', 'niter'))
def _clean_cube_chunk(uvw_m, freqs, vis_re, vis_im, weights, n_pix: int,
                      cell_rad: float, mask, beam_kernel,
                      weighting: str = 'briggs', robust: float = 0.5,
                      gain: float = 0.1, niter: int = 500,
                      nsigma: float = 3.0):
    c = 299792458.0
    rdt = jnp.asarray(vis_re).dtype
    cell_rad = jnp.asarray(cell_rad, rdt)
    uvw_m = jnp.asarray(uvw_m, rdt)
    weights = jnp.asarray(weights, rdt)
    mask = jnp.asarray(mask, rdt)
    inv_mask = 1.0 - mask
    n_out = jnp.maximum(jnp.sum(inv_mask), 1.0)
    fkern = jnp.fft.rfft2(jnp.fft.ifftshift(jnp.asarray(beam_kernel, rdt)))

    def prep_channel(args):
        # weighting + gridding + FFT dirty/psf + noise threshold, one
        # channel at a time (cheap; the expensive part is CLEAN below)
        freq, v_re, v_im = args
        vv = jax.lax.complex(v_re, v_im)
        lam = c / freq
        u_wav = uvw_m[:, 0] / lam
        v_wav = uvw_m[:, 1] / lam
        if weighting == 'briggs':
            wb = briggs_weights(u_wav, v_wav, weights, n_pix, cell_rad,
                                robust=robust)
        elif weighting == 'uniform':
            wb = briggs_weights(u_wav, v_wav, weights, n_pix, cell_rad,
                                robust=-2.0)
        else:  # natural
            wb = weights
        dirty, psf = grid_and_image(u_wav, v_wav, vv, wb, n_pix, cell_rad)
        mean_out = jnp.sum(dirty * inv_mask) / n_out
        rms = jnp.sqrt(jnp.sum(((dirty - mean_out) * inv_mask) ** 2) /
                       n_out)
        return dirty, psf, nsigma * rms

    n_chan_l = int(jnp.asarray(freqs).shape[0])
    dirty_c, psf_c, thr_c = jax.lax.map(
        prep_channel, (jnp.asarray(freqs, rdt), jnp.asarray(vis_re),
                       jnp.asarray(vis_im, rdt)),
        batch_size=min(8, n_chan_l))
    # the minor cycles run channel-batched: one while_loop peak-finds and
    # subtracts on every channel per iteration (identical per-channel
    # maths; ~10x the serial per-channel loop on TPU)
    mdl_c, resid_c, _ = hogbom_clean_batched(dirty_c, psf_c, mask, thr_c,
                                             gain=gain, niter=niter)
    conv = jnp.fft.irfft2(jnp.fft.rfft2(mdl_c) * fkern[None],
                          s=(n_pix, n_pix))
    return conv + resid_c, dirty_c


def fit_psf_beam(psf, cell_rad: float) -> Tuple[float, float, float]:
    """Fit an elliptical Gaussian to the PSF main lobe.

    Returns (bmaj_rad, bmin_rad, bpa_deg) — FWHM axes.  Second-moment fit
    over the positive core (pixels above half maximum), the standard
    approximation used to define the CLEAN restoring beam.
    """
    psf = np.asarray(psf)
    n = psf.shape[0]
    yy, xx = np.mgrid[0:n, 0:n]
    core = psf * (psf > 0.5 * psf.max())
    # keep only the central connected-ish blob: within n//8 of centre
    r2 = (yy - n // 2) ** 2 + (xx - n // 2) ** 2
    core = np.where(r2 < (n // 8) ** 2, core, 0.0)
    s = core.sum()
    cx = (core * xx).sum() / s
    cy = (core * yy).sum() / s
    mxx = (core * (xx - cx) ** 2).sum() / s
    myy = (core * (yy - cy) ** 2).sum() / s
    mxy = (core * (xx - cx) * (yy - cy)).sum() / s
    t = mxx + myy
    d = np.sqrt((mxx - myy) ** 2 + 4 * mxy ** 2)
    lam1 = (t + d) / 2.0
    lam2 = (t - d) / 2.0
    # For a 2-D Gaussian truncated at half maximum the per-axis second
    # moment is sigma^2 (1 - ln 2); undo that bias.
    calib = 1.0 / (1.0 - np.log(2.0))
    sig1 = np.sqrt(max(lam1, 1e-12) * calib)
    sig2 = np.sqrt(max(lam2, 1e-12) * calib)
    fwhm = 2.0 * np.sqrt(2.0 * np.log(2.0))
    bmaj = sig1 * fwhm * cell_rad
    bmin = sig2 * fwhm * cell_rad
    theta = 0.5 * np.degrees(np.arctan2(2 * mxy, mxx - myy))
    # position angle east of north (FITS/CASA BPA): the image basis is
    # x = West (CDELT1 < 0), y = North, so an image-frame angle theta
    # (from +x toward +y) maps to PA = theta - 90 — NOT 90 - theta,
    # which mirrors the beam about north (review r4)
    bpa = theta % 180.0 - 90.0
    return float(bmaj), float(bmin), float(bpa)


def gaussian_beam_kernel(n: int, cell_rad: float, bmaj_rad: float,
                         bmin_rad: float, bpa_deg: float) -> np.ndarray:
    """Unit-peak elliptical Gaussian restoring beam image (n, n)."""
    yy, xx = np.mgrid[0:n, 0:n]
    x = (xx - n // 2) * cell_rad
    y = (yy - n // 2) * cell_rad
    # inverse of fit_psf_beam's convention: PA east of north -> image
    # angle theta = PA + 90 on the x=West/y=North basis
    th = np.radians(bpa_deg + 90.0)
    xr = x * np.cos(th) + y * np.sin(th)
    yr = -x * np.sin(th) + y * np.cos(th)
    c = 4.0 * np.log(2.0)
    return np.exp(-c * ((xr / bmaj_rad) ** 2 + (yr / bmin_rad) ** 2))


def restore(model, residual, beam_kernel):
    """Convolve the CLEAN model with the restoring beam and add residuals
    (Jy/beam)."""
    model = jnp.asarray(model)
    kern = jnp.asarray(beam_kernel, model.dtype)
    n = model.shape[0]
    fk = jnp.fft.rfft2(jnp.fft.ifftshift(kern))
    fm = jnp.fft.rfft2(model)
    conv = jnp.fft.irfft2(fm * fk, s=(n, n))
    return conv + jnp.asarray(residual)
