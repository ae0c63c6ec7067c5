"""Run-level device fan-out for the pipeline's RT stage.

The reference's per-run loop is strictly sequential (classes.py:2358) and
its own README lists "parallelise ... different synthetic observations and
model calculations" as future work (README.md:379).  Runs in the pipeline
matrix (epochs x frequencies for the continuum, epochs x lines for RRLs)
are embarrassingly parallel: only the epoch time ``t`` (through the burst
factor chi) and the channel frequencies differ between them, while every
expensive static (field cubes, the factorised free-free base cube, the
LOS-mean temperature) is shared.

``continuum_runs_fanout`` / ``rrl_runs_fanout`` evaluate a whole group of
runs in ONE jitted ``shard_map`` program over a 1-D ('run',) device mesh:
the run axis is sharded, static fields are replicated, and each device
computes complete RT products (EM map, per-channel opacity maps, flux
maps) for its share of the run matrix with zero communication.  The host
then writes each run's FITS products exactly as the sequential path does
(`Pipeline.execute` consults the fanned cache before calling the
single-device model methods).

The per-run maths is the model's exact XLA formulation (the non-fused
branch of ``JetModel._epoch_base_map`` / ``_rrl_kernel``), so fanned
products are bit-compatible with the sequential CPU path and match the
fused single-chip TPU path to float32 tolerance.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import constants as cnsts
from ..models import ejection as ej
from ..ops import radtrans as rt


def run_mesh(mesh: Optional[Mesh] = None) -> Mesh:
    """A 1-D ('run',) mesh over all devices (or the given mesh's)."""
    devices = mesh.devices.ravel() if mesh is not None else \
        np.array(jax.devices())
    return Mesh(devices.reshape(-1), axis_names=('run',))


def _pad_runs(times_s, freqs_mat, n_dev: int, dtype
              ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad the run axis to a device multiple (edge runs repeat — their
    results are sliced off)."""
    times = np.atleast_1d(np.asarray(times_s, dtype=float))
    freqs = np.atleast_2d(np.asarray(freqs_mat, dtype=float))
    n = len(times)
    pad = (-n) % n_dev
    if pad:
        times = np.pad(times, (0, pad), mode='edge')
        freqs = np.pad(freqs, ((0, pad), (0, 0)), mode='edge')
    return jnp.asarray(times, dtype), jnp.asarray(freqs, dtype), n


def _chi2_fn(model):
    """Traced per-epoch squared burst factor (the model's _chi2)."""
    spec_r, spec_b = model._spec_r, model._spec_b
    has_bursts = model._has_bursts
    dtype = model._dtype

    def chi2(f, t):
        if has_bursts:
            chi = ej.chi_field(f.red, t - f.ts, spec_r, spec_b)
            return chi * chi
        return jnp.asarray(1.0, dtype)

    return chi2


def continuum_runs_fanout(model, years, freqs_mat,
                          mesh: Optional[Mesh] = None):
    """All continuum runs of one channel count in one sharded program.

    ``years``: (n_runs,) epoch times [yr]; ``freqs_mat``: (n_runs, n_chan)
    channel frequencies [Hz].  Returns numpy ``(em, taus, fluxes)`` of
    shapes (n_runs, nx, nz) / (n_runs, n_chan, nx, nz) x2 — identical to
    per-run ``emission_measure`` / ``optical_depth_ff`` / ``flux_ff``
    (classes.py:2397-2423 per-run products).
    """
    f = model._ensure_fields()
    st = model._rt_static()
    t_0, reyn, csize, dist = model._rt_constants()
    chi2_of = _chi2_fn(model)

    m = run_mesh(mesh)
    n_dev = int(m.devices.size)
    times, freqs, n = _pad_runs(
        np.asarray(years, dtype=float) * cnsts.YEAR, freqs_mat, n_dev,
        model._dtype)

    @partial(jax.shard_map, mesh=m,
             in_specs=(P('run'), P('run', None), P(), P()),
             out_specs=(P('run'), P('run'), P('run')),
             check_vma=False)
    def fan(times_l, freqs_l, f, st):
        def per_run(args):
            t, fr = args
            chi2 = chi2_of(f, t)
            em = jnp.sum(st.em_base * chi2, axis=rt.LOS_AXIS)
            base_map = jnp.sum(st.a * chi2, axis=rt.LOS_AXIS)
            scale = rt.tau_ff_channel_scale(fr, t_0, reyn)
            taus = scale[:, None, None] * base_map[None]
            fluxes = rt.flux_ff_maps(fr, taus, st.tbar, st.any_in, csize,
                                     dist)
            return em, taus, fluxes
        return jax.lax.map(per_run, (times_l, freqs_l))

    em, taus, fluxes = jax.jit(fan)(times, freqs, f, st)
    return (np.asarray(em)[:n], np.asarray(taus)[:n],
            np.asarray(fluxes)[:n])


def rrl_runs_fanout(model, line: str, years, freqs_mat,
                    mesh: Optional[Mesh] = None, contsub: bool = False):
    """All epochs of one RRL line in one sharded program.

    Returns numpy ``(em, tau_l, fluxes)`` — per-run EM maps, line
    opacity maps and line(+continuum when ``contsub=False``) flux maps,
    matching ``optical_depth_rrl`` / ``flux_rrl`` (classes.py:2437-2450
    per-run products).
    """
    f = model._ensure_fields()
    st = model._rt_static()
    t_0, reyn, csize, dist = model._rt_constants()
    coeffs = rt.RRLCoeffs(line)
    fscale = float(rt.flux_scale_jy(csize, dist))
    spec_r, spec_b = model._spec_r, model._spec_b
    has_bursts = model._has_bursts

    m = run_mesh(mesh)
    n_dev = int(m.devices.size)
    times, freqs, n = _pad_runs(
        np.asarray(years, dtype=float) * cnsts.YEAR, freqs_mat, n_dev,
        model._dtype)

    @partial(jax.shard_map, mesh=m,
             in_specs=(P('run'), P('run', None), P(), P()),
             out_specs=(P('run'), P('run'), P('run')),
             check_vma=False)
    def fan(times_l, freqs_l, f, st):
        def per_run(args):
            t, fr = args
            if has_bursts:
                chi = ej.chi_field(f.red, t - f.ts, spec_r, spec_b)
                chi2 = chi * chi
                n_es = f.nd * chi * f.xi
            else:
                chi2 = jnp.asarray(1.0, times_l.dtype)
                n_es = f.nd * f.xi
            em = jnp.sum(st.em_base * chi2, axis=rt.LOS_AXIS)
            ds = rt.path_length_cm(f.ff, f.area, csize)
            tau_l = rt.tau_rrl_maps(coeffs, fr, f.temp, n_es, f.vy, ds,
                                    f.inside)
            scale = rt.tau_ff_channel_scale(fr, t_0, reyn)
            tau_c = scale[:, None, None] * \
                jnp.sum(st.a * chi2, axis=rt.LOS_AXIS)[None]
            ints = rt.intensity_rrl_maps(fr, st.tbar, tau_c, tau_l,
                                         st.any_in)
            fluxes = ints * fscale
            if not contsub:
                fluxes = fluxes + rt.flux_ff_maps(fr, tau_c, st.tbar,
                                                  st.any_in, csize, dist)
            return em, tau_l, fluxes
        return jax.lax.map(per_run, (times_l, freqs_l))

    em, tau_l, fluxes = jax.jit(fan)(times, freqs, f, st)
    return (np.asarray(em)[:n], np.asarray(tau_l)[:n],
            np.asarray(fluxes)[:n])
