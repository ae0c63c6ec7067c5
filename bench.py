#!/usr/bin/env python3
"""Headline benchmark: free-free radiative-transfer throughput at 512^3.

Measures the fused continuum RT step (per-cell opacity + masked LOS
reduction + brightness-temperature flux maps, all channels) on the default
JAX device and reports RT cells/sec, compared against a float64 numpy
oracle implementing the reference's per-channel full-grid algorithm
(classes.py:1384-1400 + 1449-1541) on this host's CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def numpy_baseline_cells_per_sec(n=128, nchan=4):
    """Reference-style numpy float64 continuum RT (per-channel full-grid
    elementwise algebra + nansum), cells/sec."""
    rng = np.random.default_rng(0)
    shape = (n, n, n)
    inside = rng.random(shape) < 0.1
    temp = np.where(inside, 1e4, np.nan)
    n_es = np.where(inside, 1e7 * rng.random(shape), np.nan)
    ds = np.where(inside, 7.5e12, np.nan)
    freqs = np.linspace(1e9, 5e10, nchan)
    csize_arctan2 = np.arctan(0.5 * 1.496e11 / (120 * 3.086e16)) ** 2

    t0 = time.perf_counter()
    for nu in freqs:
        gff = 11.95 * temp ** 0.15 * nu ** -0.1
        tau = 0.018 * temp ** -1.5 * nu ** -2.0 * n_es ** 2 * ds * gff
        tau_map = np.nansum(tau, axis=1)
        tbar = np.nanmean(temp, axis=1)
        t_b = tbar * (1.0 - np.exp(-tau_map))
        i_nu = 2.0 * nu ** 2 * 1.380649e-23 * t_b / 299792458.0 ** 2
        _ = i_nu * csize_arctan2 / 1e-26
    dt = time.perf_counter() - t0
    return n ** 3 * nchan / dt


def jax_cells_per_sec(n=512, nchan=8, dtype_name="float32"):
    import jax
    import jax.numpy as jnp
    from rajepy_tpu.ops import radtrans as rt

    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    shape = (n, n, n)
    inside = jax.random.uniform(k1, shape, dtype) < 0.1
    temp = jnp.where(inside, jnp.asarray(1e4, dtype), 1.0)
    n_es = jnp.where(inside,
                     1e7 * jax.random.uniform(k2, shape, dtype), 0.0)
    ds = jnp.where(inside, jnp.asarray(7.5e12, dtype), 0.0)
    freqs = jnp.linspace(1e9, 5e10, nchan, dtype=dtype)

    def one_step(freqs, temp, n_es, ds, inside):
        taus = rt.tau_ff_maps(freqs, temp, n_es, ds, inside, 1e4,
                              reynolds_gaunt=True)
        tbar, any_in = rt.mean_temperature_map(temp, inside)
        return rt.flux_ff_maps(freqs, taus, tbar, any_in, 0.5, 120.0)

    n_rep = 20

    @jax.jit
    def bench_loop(freqs, temp, n_es, ds, inside):
        # Repeat the full step on device, perturbing the input each
        # iteration so XLA cannot hoist or CSE the work out of the loop.
        # Amortises the host<->device sync latency (a ~30 ms floor through
        # remote device tunnels) over n_rep real executions.
        def body(i, acc):
            scale = 1.0 + 1e-9 * i.astype(dtype)
            fluxes = one_step(freqs, temp, n_es * scale, ds, inside)
            return acc + jnp.sum(fluxes)
        return jax.lax.fori_loop(0, n_rep, body,
                                 jnp.asarray(0.0, dtype))

    def sync(x):
        # host transfer: the only reliable barrier through remote tunnels
        return float(x)

    sync(bench_loop(freqs, temp, n_es, ds, inside))   # compile + warm-up
    t0 = time.perf_counter()
    sync(bench_loop(freqs, temp, n_es, ds, inside))
    dt = (time.perf_counter() - t0) / n_rep
    return n ** 3 * nchan / dt, dt


def main():
    import rajepy_tpu  # noqa: F401 — x64 config etc.
    import jax

    n = 512
    nchan = 8
    try:
        ours, dt = jax_cells_per_sec(n=n, nchan=nchan)
    except Exception as exc:  # OOM etc. — fall back to a smaller cube
        print(f"# 512^3 failed ({type(exc).__name__}); retrying at 256^3",
              file=sys.stderr)
        n = 256
        ours, dt = jax_cells_per_sec(n=n, nchan=nchan)

    baseline = numpy_baseline_cells_per_sec()
    print(json.dumps({
        "metric": f"freefree_rt_cells_per_sec_{n}cube_{nchan}chan",
        "value": round(ours, 1),
        "unit": "cells/s",
        "vs_baseline": round(ours / baseline, 2),
    }))
    print(f"# device={jax.devices()[0].device_kind} "
          f"wall_per_{nchan}chan_image={dt:.4f}s "
          f"numpy_baseline={baseline:.3e} cells/s", file=sys.stderr)


if __name__ == "__main__":
    main()
