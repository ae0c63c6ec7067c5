"""Adversarial UVFITS interchange tests.

The reference's interchange products were CASA measurement sets written
and read by a battle-tested external package (casa/_interface.py:79-81);
our UVFITS surface must survive the same scrutiny without it.  Three
attack directions:

1. **Byte-level golden layout** against the AIPS memo 117 / FITS 4.0
   random-groups definition, checked by an INDEPENDENT minimal parser
   written here (struct/slicing only — never ``read_uvfits``).
2. **Foreign-layout variants** real archives produce (multi-Stokes
   correlation pairs, multi-IF + FQ tables, single-DATE, PZERO'd
   baseline coordinates, permuted axes, ANTENNA1/2 params, the
   >255-antenna BASELINE extension, NOSTA gaps), built from scratch by
   a generator independent of ``write_uvfits``; each must parse
   correctly or be rejected with a clear error — never silently
   mis-read.
3. **fit_uvfits failure modes**: flagged rows, conjugate-convention
   mismatch, wrong-axis files.

The supported-format matrix lives at the top of synthobs/uvfits.py's
reader section.
"""
import copy
import struct

import numpy as np
import pytest

from rajepy_tpu.synthobs import uvfits

BLOCK = 2880


# --------------------------------------------------------------------- #
# independent minimal FITS primitives (deliberately NOT io.fits/_card)   #
# --------------------------------------------------------------------- #

def card(key, value=None, comment=''):
    if key in ('END', 'HISTORY', 'COMMENT'):
        return f"{key:<80}"[:80]
    if isinstance(value, bool):
        v = f"{'T' if value else 'F':>20}"
    elif isinstance(value, str):
        v = f"'{value:<8}'"
        v = f"{v:<20}"
    elif isinstance(value, int):
        v = f"{value:>20d}"
    else:
        v = f"{value:>20.12G}"
    text = f"{key:<8}= {v}"
    if comment:
        text += f" / {comment}"
    return text[:80].ljust(80)


def header_bytes(cards):
    text = ''.join(cards).encode('ascii')
    return text + b' ' * (-len(text) % BLOCK)


def scan_cards(raw, pos=0):
    """All (key, raw_value_text) cards of the header at ``pos``, plus the
    data offset."""
    out = []
    while True:
        block = raw[pos:pos + BLOCK]
        assert len(block) == BLOCK, "header runs off the end of the file"
        pos += BLOCK
        for i in range(0, BLOCK, 80):
            c = block[i:i + 80].decode('ascii')
            key = c[:8].strip()
            if key == 'END':
                return out, pos
            out.append((key, c[10:].split('/')[0].strip()
                        if c[8:10] == '= ' else c[8:].strip()))


def build_group_file(path, *, axes, pars, par_vals, data, extra_cards=(),
                     extensions=b'', bitpix=-32, groups=True):
    """From-scratch random-groups writer (the adversarial generator).

    axes: [(ctype, n, crval, crpix, cdelt)] for NAXIS2.. in order.
    pars: [(ptype, pscal, pzero)].
    par_vals: (g, pcount) float values stored raw (pscal/pzero NOT
        applied — caller supplies stored values).
    data: (g,) + tuple(reversed(axis lengths)) C-ordered array.
    """
    g = par_vals.shape[0]
    cards = [card('SIMPLE', True), card('BITPIX', bitpix),
             card('NAXIS', len(axes) + 1), card('NAXIS1', 0)]
    for i, (ctype, n, *_rest) in enumerate(axes, start=2):
        cards.append(card(f'NAXIS{i}', int(n)))
    cards += [card('GROUPS', groups), card('PCOUNT', len(pars)),
              card('GCOUNT', int(g))]
    for i, (ctype, n, crval, crpix, cdelt) in enumerate(axes, start=2):
        cards += [card(f'CTYPE{i}', ctype), card(f'CRVAL{i}', crval),
                  card(f'CRPIX{i}', crpix), card(f'CDELT{i}', cdelt)]
    for i, (ptype, pscal, pzero) in enumerate(pars, start=1):
        cards += [card(f'PTYPE{i}', ptype), card(f'PSCAL{i}', pscal),
                  card(f'PZERO{i}', pzero)]
    cards += list(extra_cards) + [card('END')]
    payload = np.concatenate(
        [par_vals.reshape(g, -1), data.reshape(g, -1)],
        axis=1).astype('>f4').tobytes()
    with open(path, 'wb') as f:
        f.write(header_bytes(cards))
        f.write(payload)
        f.write(b'\x00' * (-len(payload) % BLOCK))
        f.write(extensions)
    return str(path)


def build_fq_table(n_if, if_freq, ch_width, sideband, frqsel=(1,),
                   with_frqsel_col=True):
    """AIPS FQ binary table bytes.  ``if_freq``/``ch_width``/``sideband``
    may be (n_rows, n_if) for a multi-setup table keyed by ``frqsel``."""
    if_freq = np.atleast_2d(if_freq)
    ch_width = np.atleast_2d(ch_width)
    sideband = np.atleast_2d(sideband)
    n_rows = if_freq.shape[0]
    row = (4 if with_frqsel_col else 0) + 8 * n_if + 4 * n_if + \
        4 * n_if + 4 * n_if
    fields = []
    if with_frqsel_col:
        fields += [('FRQSEL', '1J')]
    fields += [('IF FREQ', f'{n_if}D'), ('CH WIDTH', f'{n_if}E'),
               ('TOTAL BANDWIDTH', f'{n_if}E'), ('SIDEBAND', f'{n_if}J')]
    cards = [card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
             card('NAXIS', 2), card('NAXIS1', row), card('NAXIS2', n_rows),
             card('PCOUNT', 0), card('GCOUNT', 1),
             card('TFIELDS', len(fields)), card('EXTNAME', 'AIPS FQ')]
    for i, (ttype, tform) in enumerate(fields, start=1):
        cards += [card(f'TTYPE{i}', ttype), card(f'TFORM{i}', tform)]
    cards += [card('NO_IF', n_if), card('END')]
    rows = b''
    for k in range(n_rows):
        if with_frqsel_col:
            rows += struct.pack('>i', int(frqsel[k]))
        rows += np.asarray(if_freq[k], '>f8').tobytes()
        rows += np.asarray(ch_width[k], '>f4').tobytes()
        rows += np.asarray(np.abs(ch_width[k]) * 4, '>f4').tobytes()
        rows += np.asarray(sideband[k], '>i4').tobytes()
    assert len(rows) == row * n_rows
    return header_bytes(cards) + rows + b'\x00' * (-len(rows) % BLOCK)


def simple_vis(n_chan=3, n_vis=8, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n_chan, n_vis)),
            rng.normal(size=(n_chan, n_vis)))


STD_AXES = [('COMPLEX', 3, 1.0, 1.0, 1.0), ('STOKES', 1, 1.0, 1.0, 1.0),
            ('FREQ', 3, 1.0e9, 1.0, 1.0e6), ('RA', 1, 10.0, 1.0, 1.0),
            ('DEC', 1, 5.0, 1.0, 1.0)]


def std_pars():
    return [('UU---SIN', 1.0, 0.0), ('VV---SIN', 1.0, 0.0),
            ('WW---SIN', 1.0, 0.0), ('BASELINE', 1.0, 0.0),
            ('DATE', 1.0, 2451544.5), ('DATE', 1.0, 0.0)]


def std_par_vals(n_vis, n_ant=4):
    i, j = np.triu_indices(n_ant, k=1)
    nb = i.size
    rep = int(np.ceil(n_vis / nb))
    a1 = np.tile(i, rep)[:n_vis]
    a2 = np.tile(j, rep)[:n_vis]
    pv = np.zeros((n_vis, 6))
    pv[:, 0] = np.linspace(-3e-6, 3e-6, n_vis)
    pv[:, 1] = np.linspace(2e-6, -2e-6, n_vis)
    pv[:, 2] = 1e-7
    pv[:, 3] = 256 * (a1 + 1) + (a2 + 1)
    pv[:, 4] = 0.25
    pv[:, 5] = np.arange(n_vis) * 1e-5
    return pv, a1, a2


def pack_data(re, im, wt, axes):
    """(n_chan, n_vis) parts -> the C-ordered data block for ``axes``
    (each must be COMPLEX=3/STOKES=1/FREQ=n plus degenerate axes in any
    order)."""
    n_chan, n_vis = re.shape
    cube = np.stack([re.T, im.T, wt.T], axis=-1)   # (g, chan, 3)
    # C-order target: (g,) + reversed(axis lengths); place FREQ and
    # COMPLEX where they belong, all other axes are length 1
    lens = [a[1] for a in axes]
    names = [a[0] for a in axes]
    shape = tuple(reversed(lens))
    dat = np.zeros((n_vis,) + shape)
    nax = len(lens)
    c_freq = nax - names.index('FREQ')       # 1-based within shape: C axis
    c_cplx = nax - names.index('COMPLEX')
    dat_moved = np.moveaxis(dat, (c_freq, c_cplx), (-2, -1))
    dat_moved[..., :, :] = cube.reshape(
        (n_vis,) + (1,) * (nax - 2) + (n_chan, 3))
    return dat


# --------------------------------------------------------------------- #
# 1. byte-level golden layout (independent parser)                       #
# --------------------------------------------------------------------- #

class TestMemo117GoldenBytes:
    def _write(self, tmp_path, n_ant=3, n_chan=2, n_vis=6, sigma=0.5):
        rng = np.random.default_rng(3)
        i, j = np.triu_indices(n_ant, k=1)
        rep = int(np.ceil(n_vis / i.size))
        s = dict(
            uvw=rng.normal(scale=2e4, size=(n_vis, 3)),
            vis_re=rng.normal(size=(n_chan, n_vis)),
            vis_im=rng.normal(size=(n_chan, n_vis)),
            freqs=5e9 + np.arange(n_chan) * 1e7,
            ant_xyz=rng.normal(scale=1e3, size=(n_ant, 3)),
            ant1=np.tile(i, rep)[:n_vis], ant2=np.tile(j, rep)[:n_vis],
            time_s=np.arange(n_vis) * 10.0)
        fn = uvfits.write_uvfits(
            str(tmp_path / 'g.uvfits'), s['uvw'], s['vis_re'],
            s['vis_im'], s['freqs'], s['ant_xyz'], s['ant1'], s['ant2'],
            s['time_s'], ra_deg=15.0, dec_deg=-30.0, sigma=sigma,
            telescope='TESTARR')
        return fn, s

    def test_mandatory_card_order_and_values(self, tmp_path):
        """FITS 4.0 3.3.2 random-groups structure: SIMPLE, BITPIX,
        NAXIS, NAXIS1=0, NAXIS2..n, then GROUPS/PCOUNT/GCOUNT
        immediately after the last NAXISn."""
        fn, s = self._write(tmp_path)
        raw = open(fn, 'rb').read()
        assert len(raw) % BLOCK == 0
        # the first card must be exactly 'SIMPLE  =                    T'
        assert raw[:30] == b'SIMPLE  =                    T'
        cards, dpos = scan_cards(raw)
        keys = [k for k, _ in cards]
        assert keys[:3] == ['SIMPLE', 'BITPIX', 'NAXIS']
        naxis = int(dict(cards)['NAXIS'])
        assert keys[3:3 + naxis] == [f'NAXIS{i}'
                                     for i in range(1, naxis + 1)]
        assert keys[3 + naxis:6 + naxis] == ['GROUPS', 'PCOUNT', 'GCOUNT']
        d = dict(cards)
        assert d['NAXIS1'] == '0' and d['GROUPS'] == 'T'
        assert int(d['BITPIX']) == -32
        assert int(d['GCOUNT']) == 6 and int(d['PCOUNT']) == 6
        # random-parameter definitions for the classic parameter set
        ptypes = [d[f'PTYPE{i}'].strip("'").strip()
                  for i in range(1, 7)]
        assert ptypes == ['UU---SIN', 'VV---SIN', 'WW---SIN', 'BASELINE',
                          'DATE', 'DATE']
        assert float(d['PZERO5']) == 2451544.5

    def test_group_record_bytes(self, tmp_path):
        """Each group = PCOUNT big-endian f32 parameters then the
        COMPLEX-fastest data cube, re/im/weight interleaved per channel
        — byte-compared against struct.pack of the definition."""
        fn, s = self._write(tmp_path, sigma=0.5)
        raw = open(fn, 'rb').read()
        _, dpos = scan_cards(raw)
        n_chan, n_vis = s['vis_re'].shape
        rec = 4 * (6 + 3 * n_chan)
        c = 299792458.0
        for k in (0, 3, n_vis - 1):
            expect = b''
            f32 = lambda x: struct.pack('>f', np.float32(x))
            expect += f32(s['uvw'][k, 0] / c) + f32(s['uvw'][k, 1] / c) \
                + f32(s['uvw'][k, 2] / c)
            expect += f32(256 * (s['ant1'][k] + 1) + s['ant2'][k] + 1)
            day = s['time_s'][k] / 86400.0
            expect += f32(np.floor(day)) + f32(day - np.floor(day))
            for ch in range(n_chan):
                expect += f32(s['vis_re'][ch, k]) + \
                    f32(s['vis_im'][ch, k]) + f32(1.0 / 0.5 ** 2)
            assert raw[dpos + k * rec: dpos + (k + 1) * rec] == expect

    def test_an_table_bytes(self, tmp_path):
        """AIPS AN rows: ANNAME 8A @0, STABXYZ 3D @8, NOSTA 1J @32,
        MNTSTA 1J @36 — parsed independently at computed offsets."""
        fn, s = self._write(tmp_path)
        raw = open(fn, 'rb').read()
        _, dpos = scan_cards(raw)
        n_chan, n_vis = s['vis_re'].shape
        gbytes = n_vis * 4 * (6 + 3 * n_chan)
        ext = dpos + gbytes + (-gbytes % BLOCK)
        assert raw[ext:ext + 10] == b"XTENSION= "
        cards, rows_pos = scan_cards(raw, ext)
        d = dict(cards)
        assert d['EXTNAME'].strip("'").strip() == 'AIPS AN'
        row = int(d['NAXIS1'])
        assert int(d['NAXIS2']) == 3
        # column order fixed by the AN definition
        assert d['TTYPE1'].strip("'").strip() == 'ANNAME'
        assert d['TFORM2'].strip("'").strip() == '3D'
        for k in range(3):
            base = rows_pos + k * row
            assert raw[base:base + 8].decode() == f'ANT{k + 1:03d}'.ljust(8)
            xyz = struct.unpack('>3d', raw[base + 8:base + 32])
            np.testing.assert_allclose(xyz, s['ant_xyz'][k], rtol=0,
                                       atol=0)
            assert struct.unpack('>i', raw[base + 32:base + 36])[0] == k + 1


# --------------------------------------------------------------------- #
# 2. foreign layout variants                                             #
# --------------------------------------------------------------------- #

class TestForeignLayouts:
    def test_axis_order_permutation(self, tmp_path):
        """FREQ/STOKES/COMPLEX located by CTYPE, not position."""
        re, im = simple_vis()
        axes = [('FREQ', 3, 2.0e9, 2.0, 1.0e6),
                ('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('DEC', 1, 5.0, 1.0, 1.0),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('RA', 1, 10.0, 1.0, 1.0)]
        pv, a1, a2 = std_par_vals(8)
        fn = build_group_file(tmp_path / 'perm.uvfits', axes=axes,
                              pars=std_pars(), par_vals=pv,
                              data=pack_data(re, im, np.ones_like(re),
                                             axes))
        out = uvfits.read_uvfits(fn)
        np.testing.assert_allclose(out['vis_re'], re, rtol=0, atol=1e-6)
        np.testing.assert_allclose(out['vis_im'], im, rtol=0, atol=1e-6)
        np.testing.assert_array_equal(out['ant1'], a1)
        # CRPIX=2 on FREQ: first channel is crval - cdelt
        np.testing.assert_allclose(
            out['freqs'], 2.0e9 + (np.arange(3) - 1) * 1e6, rtol=0,
            atol=1e-3)

    def _stokes_file(self, tmp_path, codes, planes, weights, name):
        """planes/weights: lists of (n_chan, n_vis) per stokes code."""
        n_chan, n_vis = planes[0][0].shape
        n_st = len(codes)
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('STOKES', n_st, float(codes[0]), 1.0,
                 float(codes[1] - codes[0]) if n_st > 1 else 1.0),
                ('FREQ', n_chan, 1.0e9, 1.0, 1.0e6),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        # data C-order: (g, DEC, RA, FREQ, STOKES, COMPLEX)
        dat = np.zeros((n_vis, 1, 1, n_chan, n_st, 3))
        for si in range(n_st):
            dat[:, 0, 0, :, si, 0] = planes[si][0].T
            dat[:, 0, 0, :, si, 1] = planes[si][1].T
            dat[:, 0, 0, :, si, 2] = weights[si].T
        pv, a1, a2 = std_par_vals(n_vis)
        return build_group_file(tmp_path / name, axes=axes,
                                pars=std_pars(), par_vals=pv, data=dat)

    def test_rr_ll_weighted_average(self, tmp_path):
        rr_re, rr_im = simple_vis(seed=1)
        ll_re, ll_im = simple_vis(seed=2)
        w_rr = np.full_like(rr_re, 4.0)
        w_ll = np.full_like(ll_re, 2.0)
        fn = self._stokes_file(tmp_path, [-1, -2],
                               [(rr_re, rr_im), (ll_re, ll_im)],
                               [w_rr, w_ll], 'rrll.uvfits')
        out = uvfits.read_uvfits(fn)
        assert out['stokes'] == ['RR', 'LL']
        np.testing.assert_allclose(
            out['vis_re'], (4 * rr_re + 2 * ll_re) / 6, atol=1e-6)
        np.testing.assert_allclose(
            out['vis_im'], (4 * rr_im + 2 * ll_im) / 6, atol=1e-6)
        np.testing.assert_allclose(out['weights'], 6.0, atol=1e-6)

    def test_rr_ll_flagged_hand_drops_out(self, tmp_path):
        rr_re, rr_im = simple_vis(seed=1)
        ll_re, ll_im = simple_vis(seed=2)
        w_rr = np.full_like(rr_re, 4.0)
        w_ll = np.full_like(ll_re, 2.0)
        w_ll[:, 0] = -2.0          # LL flagged on the first baseline
        w_rr[:, 1] = 0.0
        w_ll[:, 1] = -1.0          # both flagged on the second
        fn = self._stokes_file(tmp_path, [-1, -2],
                               [(rr_re, rr_im), (ll_re, ll_im)],
                               [w_rr, w_ll], 'rrllf.uvfits')
        out = uvfits.read_uvfits(fn)
        np.testing.assert_allclose(out['vis_re'][:, 0], rr_re[:, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(out['weights'][:, 0], 4.0, atol=1e-6)
        assert np.all(out['weights'][:, 1] <= 0.0)   # stays flagged

    def test_xx_yy_pair(self, tmp_path):
        xx, yy = simple_vis(seed=3), simple_vis(seed=4)
        w = np.ones_like(xx[0])
        fn = self._stokes_file(tmp_path, [-5, -6], [xx, yy], [w, w],
                               'xxyy.uvfits')
        out = uvfits.read_uvfits(fn)
        np.testing.assert_allclose(out['vis_re'], (xx[0] + yy[0]) / 2,
                                   atol=1e-6)

    def test_single_rr_is_an_i_estimate(self, tmp_path):
        rr = simple_vis(seed=5)
        fn = self._stokes_file(tmp_path, [-1], [rr],
                               [np.ones_like(rr[0])], 'rr.uvfits')
        out = uvfits.read_uvfits(fn)
        assert out['stokes'] == ['RR']
        np.testing.assert_allclose(out['vis_re'], rr[0], atol=1e-6)

    def test_four_correlations_uses_parallel_hands(self, tmp_path):
        planes = [simple_vis(seed=s) for s in (1, 2, 3, 4)]  # RR LL RL LR
        w = np.ones_like(planes[0][0])
        fn = self._stokes_file(tmp_path, [-1, -2, -3, -4], planes,
                               [w, w, w, w], 'full.uvfits')
        out = uvfits.read_uvfits(fn)
        np.testing.assert_allclose(
            out['vis_re'], (planes[0][0] + planes[1][0]) / 2, atol=1e-6)

    def test_multi_if_with_fq_table(self, tmp_path):
        n_chan, n_if, n_vis = 2, 3, 8
        rng = np.random.default_rng(6)
        cube = rng.normal(size=(n_vis, 1, 1, n_if, 1, n_chan, 3))
        cube[..., 2] = 1.0
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        # C-order: (g, DEC, RA, IF, STOKES, FREQ, COMPLEX)
        if_freq = np.array([0.0, 1.0e8, 2.5e8])
        ch_w = np.array([1.0e6, 1.0e6, 2.0e6])
        sideband = np.array([1, 1, -1])
        pv, a1, a2 = std_par_vals(n_vis)
        fn = build_group_file(
            tmp_path / 'mif.uvfits', axes=axes, pars=std_pars(),
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband))
        out = uvfits.read_uvfits(fn)
        assert out['n_if'] == n_if
        assert out['freqs'].shape == (n_if * n_chan,)
        expect = np.concatenate([
            4.0e9 + if_freq[i] + np.arange(n_chan) * ch_w[i] * sideband[i]
            for i in range(n_if)])
        np.testing.assert_allclose(out['freqs'], expect, rtol=0, atol=1.0)
        # channel data stacks IF-major
        np.testing.assert_allclose(
            out['vis_re'][:n_chan], cube[:, 0, 0, 0, 0, :, 0].T,
            atol=1e-6)
        np.testing.assert_allclose(
            out['vis_re'][n_chan:2 * n_chan],
            cube[:, 0, 0, 1, 0, :, 0].T, atol=1e-6)

    def test_multi_setup_fq_constant_freqsel(self, tmp_path):
        """A multi-setup FQ table with a CONSTANT non-1 FREQSEL: the
        frequencies must come from the FRQSEL-matched row, not row 0."""
        n_chan, n_if, n_vis = 2, 2, 8
        rng = np.random.default_rng(16)
        cube = rng.normal(size=(n_vis, 1, 1, n_if, 1, n_chan, 3))
        cube[..., 2] = 1.0
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        if_freq = np.array([[0.0, 1.0e8],       # setup 1 (unused)
                            [5.0e7, 3.0e8]])    # setup 2 (selected)
        ch_w = np.array([[1.0e6, 1.0e6], [2.0e6, 2.0e6]])
        sideband = np.array([[1, 1], [1, -1]])
        pars = std_pars() + [('FREQSEL', 1.0, 0.0)]
        pv, a1, a2 = std_par_vals(n_vis)
        pv = np.concatenate([pv, np.full((n_vis, 1), 2.0)], axis=1)
        fn = build_group_file(
            tmp_path / 'mset.uvfits', axes=axes, pars=pars,
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband,
                                      frqsel=(1, 2)))
        out = uvfits.read_uvfits(fn)
        expect = np.concatenate([
            4.0e9 + if_freq[1, i] +
            np.arange(n_chan) * ch_w[1, i] * sideband[1, i]
            for i in range(n_if)])
        np.testing.assert_allclose(out['freqs'], expect, rtol=0, atol=1.0)

    def test_heap_and_image_extensions_skipped(self, tmp_path):
        """Extensions between the group data and the FQ table must be
        skipped by the FULL FITS data-unit size — a bintable with a
        PCOUNT heap and an IMAGE extension with BITPIX=-32 both occupy
        more blocks than a bare NAXIS1*NAXIS2 suggests."""
        n_chan, n_if, n_vis = 2, 3, 8
        rng = np.random.default_rng(17)
        cube = rng.normal(size=(n_vis, 1, 1, n_if, 1, n_chan, 3))
        cube[..., 2] = 1.0
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        # heap bintable: 16 data bytes + 3000 heap bytes = 2 blocks
        heap_ext = header_bytes(
            [card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
             card('NAXIS', 2), card('NAXIS1', 8), card('NAXIS2', 2),
             card('PCOUNT', 3000), card('GCOUNT', 1),
             card('TFIELDS', 1), card('EXTNAME', 'EXTRA'),
             card('TTYPE1', 'BLOB'), card('TFORM1', '1PB(8)'),
             card('END')]) + b'\x00' * BLOCK * 2
        # image extension: 30x30 f32 = 3600 bytes = 2 blocks
        img = np.zeros((30, 30), '>f4').tobytes()
        img_ext = header_bytes(
            [card('XTENSION', 'IMAGE'), card('BITPIX', -32),
             card('NAXIS', 2), card('NAXIS1', 30), card('NAXIS2', 30),
             card('PCOUNT', 0), card('GCOUNT', 1),
             card('EXTNAME', 'BEAM'), card('END')]) + \
            img + b'\x00' * (-len(img) % BLOCK)
        if_freq = np.array([0.0, 1.0e8, 2.5e8])
        ch_w = np.array([1.0e6, 1.0e6, 2.0e6])
        sideband = np.array([1, 1, -1])
        pv, *_ = std_par_vals(n_vis)
        fn = build_group_file(
            tmp_path / 'heap.uvfits', axes=axes, pars=std_pars(),
            par_vals=pv, data=cube,
            extensions=heap_ext + img_ext +
            build_fq_table(n_if, if_freq, ch_w, sideband))
        out = uvfits.read_uvfits(fn)
        expect = np.concatenate([
            4.0e9 + if_freq[i] + np.arange(n_chan) * ch_w[i] * sideband[i]
            for i in range(n_if)])
        np.testing.assert_allclose(out['freqs'], expect, rtol=0, atol=1.0)

    def test_bit_flag_column_offsets(self, tmp_path):
        """An nX bit column occupies ceil(n/8) bytes — columns after a
        16X flag column must be read at the right offsets."""
        re, im = simple_vis()
        names = [b'ALPHA   ', b'BRAVO   ', b'CHARLI  ']
        xyz = np.arange(9, dtype=float).reshape(3, 3) * 10.0
        # row: ANNAME 8A @0, FLAGS 16X @8 (2 bytes), STABXYZ 3D @10,
        # NOSTA 1J @34 -> row length 38
        row = 38
        cards = [card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
                 card('NAXIS', 2), card('NAXIS1', row), card('NAXIS2', 3),
                 card('PCOUNT', 0), card('GCOUNT', 1), card('TFIELDS', 4),
                 card('EXTNAME', 'AIPS AN'),
                 card('TTYPE1', 'ANNAME'), card('TFORM1', '8A'),
                 card('TTYPE2', 'FLAGS'), card('TFORM2', '16X'),
                 card('TTYPE3', 'STABXYZ'), card('TFORM3', '3D'),
                 card('TTYPE4', 'NOSTA'), card('TFORM4', '1J'),
                 card('END')]
        rows = b''
        for k in range(3):
            rows += names[k] + b'\xff\x00' + \
                np.asarray(xyz[k], '>f8').tobytes() + \
                struct.pack('>i', k + 1)
        assert len(rows) == row * 3
        an_ext = header_bytes(cards) + rows + \
            b'\x00' * (-len(rows) % BLOCK)
        pv, *_ = std_par_vals(8)
        fn = build_group_file(
            tmp_path / 'bitcol.uvfits', axes=STD_AXES, pars=std_pars(),
            par_vals=pv, data=pack_data(re, im, np.ones_like(re),
                                        STD_AXES),
            extensions=an_ext)
        out = uvfits.read_uvfits(fn)
        assert out['ant_names'][:3] == ['ALPHA', 'BRAVO', 'CHARLI']
        np.testing.assert_allclose(out['ant_xyz'][:3], xyz, atol=0)

    def test_variable_length_column_offsets(self, tmp_path):
        """A 1PB(8) variable-length descriptor column (8 bytes in-row,
        data on the heap) must not break the columns after it."""
        re, im = simple_vis()
        names = [b'ALPHA   ', b'BRAVO   ', b'CHARLI  ']
        xyz = np.arange(9, dtype=float).reshape(3, 3) * 10.0
        # row: ANNAME 8A @0, BLOB 1PB(8) @8 (8-byte descriptor),
        # STABXYZ 3D @16, NOSTA 1J @40 -> row length 44
        row = 44
        heap = b'\xab' * 24
        cards = [card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
                 card('NAXIS', 2), card('NAXIS1', row), card('NAXIS2', 3),
                 card('PCOUNT', len(heap)), card('GCOUNT', 1),
                 card('TFIELDS', 4), card('EXTNAME', 'AIPS AN'),
                 card('TTYPE1', 'ANNAME'), card('TFORM1', '8A'),
                 card('TTYPE2', 'BLOB'), card('TFORM2', '1PB(8)'),
                 card('TTYPE3', 'STABXYZ'), card('TFORM3', '3D'),
                 card('TTYPE4', 'NOSTA'), card('TFORM4', '1J'),
                 card('END')]
        rows = b''
        for k in range(3):
            rows += names[k] + struct.pack('>ii', 8, k * 8) + \
                np.asarray(xyz[k], '>f8').tobytes() + \
                struct.pack('>i', k + 1)
        assert len(rows) == row * 3
        an_ext = header_bytes(cards) + rows + heap + \
            b'\x00' * (-(len(rows) + len(heap)) % BLOCK)
        pv, *_ = std_par_vals(8)
        fn = build_group_file(
            tmp_path / 'varcol.uvfits', axes=STD_AXES, pars=std_pars(),
            par_vals=pv, data=pack_data(re, im, np.ones_like(re),
                                        STD_AXES),
            extensions=an_ext)
        out = uvfits.read_uvfits(fn)
        assert out['ant_names'][:3] == ['ALPHA', 'BRAVO', 'CHARLI']
        np.testing.assert_allclose(out['ant_xyz'][:3], xyz, atol=0)

    def test_single_if_multi_setup_fq(self, tmp_path):
        """FQ IF FREQ offsets apply to SINGLE-IF data too: a single-IF
        file with a multi-setup FQ table and FREQSEL=2 must get the
        setup-2 offset and sideband-signed CH WIDTH, not bare
        CRVAL + chan*CDELT."""
        n_chan, n_vis = 3, 8
        rng = np.random.default_rng(21)
        cube = rng.normal(size=(n_vis, 1, 1, 1, 1, n_chan, 3))
        cube[..., 2] = 1.0
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', 1, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        if_freq = np.array([[0.0], [5.0e7]])
        ch_w = np.array([[1.0e6], [2.0e6]])
        sideband = np.array([[1], [-1]])
        pars = std_pars() + [('FREQSEL', 1.0, 0.0)]
        pv, *_ = std_par_vals(n_vis)
        pv = np.concatenate([pv, np.full((n_vis, 1), 2.0)], axis=1)
        fn = build_group_file(
            tmp_path / 'if1fq.uvfits', axes=axes, pars=pars,
            par_vals=pv, data=cube,
            extensions=build_fq_table(1, if_freq, ch_w, sideband,
                                      frqsel=(1, 2)))
        out = uvfits.read_uvfits(fn)
        expect = 4.0e9 + 5.0e7 - np.arange(n_chan) * 2.0e6
        np.testing.assert_allclose(out['freqs'], expect, rtol=0, atol=1.0)

    def test_degenerate_if_axis_without_fq(self, tmp_path):
        re, im = simple_vis()
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('FREQ', 3, 1.0e9, 1.0, 1.0e6),
                ('IF', 1, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        pv, *_ = std_par_vals(8)
        fn = build_group_file(tmp_path / 'if1.uvfits', axes=axes,
                              pars=std_pars(), par_vals=pv,
                              data=pack_data(re, im, np.ones_like(re),
                                             axes))
        out = uvfits.read_uvfits(fn)
        assert out['n_if'] == 1
        np.testing.assert_allclose(out['vis_re'], re, atol=1e-6)

    def test_single_date_parameter(self, tmp_path):
        re, im = simple_vis()
        pars = std_pars()[:5]                     # one DATE only
        pv, *_ = std_par_vals(8)
        pv = pv[:, :5].copy()
        pv[:, 4] = 0.25 + np.arange(8) * 1e-5     # full day fraction
        fn = build_group_file(tmp_path / '1date.uvfits', axes=STD_AXES,
                              pars=pars, par_vals=pv,
                              data=pack_data(re, im, np.ones_like(re),
                                             STD_AXES))
        out = uvfits.read_uvfits(fn)
        np.testing.assert_allclose(
            out['jd'], 2451544.5 + np.float32(0.25 + np.arange(8) * 1e-5),
            rtol=1e-9)

    def test_pzero_pscal_on_baseline_coordinates(self, tmp_path):
        """Real archives sometimes carry PZERO/PSCAL on UU/VV/WW; stored
        value * PSCAL + PZERO must be applied."""
        re, im = simple_vis()
        pars = [('UU---SIN', 2.0, 1.0e-6), ('VV---SIN', 1.0, -5.0e-7),
                ('WW---SIN', 0.5, 0.0), ('BASELINE', 1.0, 0.0),
                ('DATE', 1.0, 2451544.5), ('DATE', 1.0, 0.0)]
        pv, *_ = std_par_vals(8)
        fn = build_group_file(tmp_path / 'pz.uvfits', axes=STD_AXES,
                              pars=pars, par_vals=pv,
                              data=pack_data(re, im, np.ones_like(re),
                                             STD_AXES))
        out = uvfits.read_uvfits(fn)
        c = 299792458.0
        np.testing.assert_allclose(
            out['uvw'][:, 0],
            (np.float32(pv[:, 0]) * 2.0 + 1.0e-6) * c, rtol=1e-6)
        np.testing.assert_allclose(
            out['uvw'][:, 1],
            (np.float32(pv[:, 1]) * 1.0 - 5.0e-7) * c, rtol=1e-6)
        np.testing.assert_allclose(
            out['uvw'][:, 2], np.float32(pv[:, 2]) * 0.5 * c, rtol=1e-6)

    def test_antenna1_antenna2_parameters(self, tmp_path):
        re, im = simple_vis()
        pars = [('UU---SIN', 1.0, 0.0), ('VV---SIN', 1.0, 0.0),
                ('WW---SIN', 1.0, 0.0), ('ANTENNA1', 1.0, 0.0),
                ('ANTENNA2', 1.0, 0.0), ('DATE', 1.0, 2451544.5)]
        pv, a1, a2 = std_par_vals(8)
        pv = pv.copy()
        pv[:, 3] = a1 + 1
        pv[:, 4] = a2 + 1
        pv[:, 5] = 0.25
        fn = build_group_file(tmp_path / 'a12.uvfits', axes=STD_AXES,
                              pars=pars[:6], par_vals=pv,
                              data=pack_data(re, im, np.ones_like(re),
                                             STD_AXES))
        out = uvfits.read_uvfits(fn)
        np.testing.assert_array_equal(out['ant1'], a1)
        np.testing.assert_array_equal(out['ant2'], a2)

    def test_extended_baseline_encoding(self, tmp_path):
        """BASELINE >= 65536: the 2048*a1 + a2 + 65536 extension for
        >255-antenna arrays."""
        re, im = simple_vis(n_vis=4)
        pv, *_ = std_par_vals(4)
        pv = pv.copy()
        a1 = np.array([1, 300, 500, 2])
        a2 = np.array([2, 301, 501, 400])
        pv[:, 3] = 2048 * a1 + a2 + 65536
        fn = build_group_file(tmp_path / 'ext.uvfits', axes=STD_AXES,
                              pars=std_pars(), par_vals=pv,
                              data=pack_data(re, im, np.ones_like(re),
                                             STD_AXES))
        out = uvfits.read_uvfits(fn)
        np.testing.assert_array_equal(out['ant1'], a1 - 1)
        np.testing.assert_array_equal(out['ant2'], a2 - 1)

    def test_complex_axis_of_two_gets_unit_weights(self, tmp_path):
        re, im = simple_vis()
        axes = [('COMPLEX', 2, 1.0, 1.0, 1.0)] + STD_AXES[1:]
        n_chan, n_vis = re.shape
        dat = np.zeros((n_vis, 1, 1, n_chan, 1, 2))
        dat[:, 0, 0, :, 0, 0] = re.T
        dat[:, 0, 0, :, 0, 1] = im.T
        pv, *_ = std_par_vals(8)
        fn = build_group_file(tmp_path / 'c2.uvfits', axes=axes,
                              pars=std_pars(), par_vals=pv, data=dat)
        out = uvfits.read_uvfits(fn)
        np.testing.assert_allclose(out['vis_re'], re, atol=1e-6)
        np.testing.assert_array_equal(out['weights'], 1.0)

    def test_an_table_nosta_gaps(self, tmp_path):
        """AN rows out of order / with gaps: ant_xyz indexes by NOSTA-1."""
        rng = np.random.default_rng(8)
        s_xyz = rng.normal(scale=1e3, size=(3, 3))
        fn0 = uvfits.write_uvfits(
            str(tmp_path / 'base.uvfits'), rng.normal(size=(3, 3)),
            np.ones((1, 3)), np.zeros((1, 3)), np.array([1e9]),
            s_xyz, np.array([0, 0, 1]), np.array([1, 2, 2]),
            np.zeros(3), ra_deg=0.0, dec_deg=0.0)
        raw = bytearray(open(fn0, 'rb').read())
        # find the AN rows and renumber NOSTA to (5, 2, 7) out of order
        _, dpos = scan_cards(bytes(raw))
        gbytes = 3 * 4 * (6 + 3)
        ext = dpos + gbytes + (-gbytes % BLOCK)
        cards, rows_pos = scan_cards(bytes(raw), ext)
        row = int(dict(cards)['NAXIS1'])
        for k, nosta in enumerate((5, 2, 7)):
            raw[rows_pos + k * row + 32:rows_pos + k * row + 36] = \
                struct.pack('>i', nosta)
        fn = tmp_path / 'gaps.uvfits'
        fn.write_bytes(bytes(raw))
        out = uvfits.read_uvfits(str(fn))
        assert len(out['ant_names']) == 7
        np.testing.assert_allclose(out['ant_xyz'][4], s_xyz[0], atol=0)
        np.testing.assert_allclose(out['ant_xyz'][1], s_xyz[1], atol=0)
        np.testing.assert_allclose(out['ant_xyz'][6], s_xyz[2], atol=0)
        assert out['ant_names'][1] == 'ANT002'
        assert np.isnan(out['ant_xyz'][0]).all()   # gap rows are NaN

    def test_an_table_zero_based_nosta_rejected(self, tmp_path):
        """NOSTA is 1-relative (AIPS memo 117): a 0-based writer must be
        rejected, not have station 0 scattered into the LAST slot via
        the -1 index (which silently shifts every antenna position)."""
        rng = np.random.default_rng(8)
        s_xyz = rng.normal(scale=1e3, size=(3, 3))
        fn0 = uvfits.write_uvfits(
            str(tmp_path / 'base0.uvfits'), rng.normal(size=(3, 3)),
            np.ones((1, 3)), np.zeros((1, 3)), np.array([1e9]),
            s_xyz, np.array([0, 0, 1]), np.array([1, 2, 2]),
            np.zeros(3), ra_deg=0.0, dec_deg=0.0)
        raw = bytearray(open(fn0, 'rb').read())
        _, dpos = scan_cards(bytes(raw))
        gbytes = 3 * 4 * (6 + 3)
        ext = dpos + gbytes + (-gbytes % BLOCK)
        cards, rows_pos = scan_cards(bytes(raw), ext)
        row = int(dict(cards)['NAXIS1'])
        for k, nosta in enumerate((0, 1, 2)):   # 0-based numbering
            raw[rows_pos + k * row + 32:rows_pos + k * row + 36] = \
                struct.pack('>i', nosta)
        fn = tmp_path / 'zerobased.uvfits'
        fn.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match='NOSTA'):
            uvfits.read_uvfits(str(fn))

    def test_fq_zero_ch_width_falls_back_to_unsigned_cdelt(self,
                                                           tmp_path):
        """A zero CH WIDTH falls back to the header CDELT — but the
        SIDEBAND column signs the step, so a HEADER-signed (LSB) CDELT
        must contribute only its magnitude: applying both signs would
        flip the channel ordering back to USB."""
        n_chan, n_if, n_vis = 3, 2, 8
        rng = np.random.default_rng(23)
        cube = rng.normal(size=(n_vis, 1, 1, n_if, 1, n_chan, 3))
        cube[..., 2] = 1.0
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, -1.0e6),   # signed LSB CDELT
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        if_freq = np.array([0.0, 2.0e8])
        ch_w = np.zeros(n_if)                   # force the fallback
        sideband = np.array([-1, -1])
        pv, a1, a2 = std_par_vals(n_vis)
        fn = build_group_file(
            tmp_path / 'lsb.uvfits', axes=axes, pars=std_pars(),
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband))
        out = uvfits.read_uvfits(fn)
        expect = np.concatenate([
            4.0e9 + if_freq[i] + np.arange(n_chan) * (-1.0e6)
            for i in range(n_if)])
        np.testing.assert_allclose(out['freqs'], expect, rtol=0, atol=1.0)

    def test_fq_column_length_mismatch_rejected(self, tmp_path):
        """An FQ table whose CH WIDTH repeat count disagrees with the
        data's IF count must raise a clear ValueError, not die in a raw
        numpy broadcast."""
        n_chan, n_if, n_vis = 2, 3, 8
        rng = np.random.default_rng(24)
        cube = rng.normal(size=(n_vis, 1, 1, n_if, 1, n_chan, 3))
        cube[..., 2] = 1.0
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        # hand-build an FQ table: IF FREQ says 3 IFs, CH WIDTH only 2
        short = n_if - 1
        fields = [('FRQSEL', '1J'), ('IF FREQ', f'{n_if}D'),
                  ('CH WIDTH', f'{short}E'),
                  ('TOTAL BANDWIDTH', f'{n_if}E'),
                  ('SIDEBAND', f'{n_if}J')]
        row = 4 + 8 * n_if + 4 * short + 4 * n_if + 4 * n_if
        cards = [card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
                 card('NAXIS', 2), card('NAXIS1', row),
                 card('NAXIS2', 1), card('PCOUNT', 0), card('GCOUNT', 1),
                 card('TFIELDS', len(fields)),
                 card('EXTNAME', 'AIPS FQ')]
        for i, (ttype, tform) in enumerate(fields, start=1):
            cards += [card(f'TTYPE{i}', ttype), card(f'TFORM{i}', tform)]
        cards += [card('NO_IF', n_if), card('END')]
        rows = struct.pack('>i', 1)
        rows += np.asarray([0.0, 1e8, 2e8], '>f8').tobytes()
        rows += np.asarray([1e6] * short, '>f4').tobytes()
        rows += np.asarray([4e6] * n_if, '>f4').tobytes()
        rows += np.asarray([1] * n_if, '>i4').tobytes()
        assert len(rows) == row
        fq = header_bytes(cards) + rows + b'\x00' * (-len(rows) % BLOCK)
        pv, a1, a2 = std_par_vals(n_vis)
        fn = build_group_file(
            tmp_path / 'mismatch.uvfits', axes=axes, pars=std_pars(),
            par_vals=pv, data=cube, extensions=fq)
        with pytest.raises(ValueError, match='CH WIDTH'):
            uvfits.read_uvfits(fn)

    def test_arrayx_offset_applied(self, tmp_path):
        """STABXYZ is relative to ARRAYX/Y/Z in real AN tables."""
        rng = np.random.default_rng(9)
        s_xyz = rng.normal(scale=1e3, size=(3, 3))
        fn0 = uvfits.write_uvfits(
            str(tmp_path / 'arr.uvfits'), rng.normal(size=(3, 3)),
            np.ones((1, 3)), np.zeros((1, 3)), np.array([1e9]),
            s_xyz, np.array([0, 0, 1]), np.array([1, 2, 2]),
            np.zeros(3), ra_deg=0.0, dec_deg=0.0)
        raw = bytearray(open(fn0, 'rb').read())
        # patch ARRAYX from 0 to 100.0 in the AN header
        idx = raw.find(b'ARRAYX  = ')
        assert idx > 0
        raw[idx:idx + 80] = card('ARRAYX', 100.0).encode('ascii')
        fn = tmp_path / 'arr2.uvfits'
        fn.write_bytes(bytes(raw))
        out = uvfits.read_uvfits(str(fn))
        np.testing.assert_allclose(out['ant_xyz'][:, 0],
                                   s_xyz[:, 0] + 100.0, atol=1e-9)


# --------------------------------------------------------------------- #
# 3. clear rejections                                                    #
# --------------------------------------------------------------------- #

class TestClearRejections:
    def _base(self, tmp_path, name='x.uvfits', **over):
        re, im = simple_vis()
        kw = dict(axes=STD_AXES, pars=std_pars(),
                  par_vals=std_par_vals(8)[0],
                  data=pack_data(re, im, np.ones_like(re), STD_AXES))
        kw.update(over)
        return build_group_file(tmp_path / name, **kw)

    def test_not_random_groups(self, tmp_path):
        fn = self._base(tmp_path, groups=False)
        with pytest.raises(ValueError, match="random-groups"):
            uvfits.read_uvfits(fn)

    def test_wrong_bitpix(self, tmp_path):
        fn = self._base(tmp_path, bitpix=-64)
        with pytest.raises(ValueError, match="BITPIX"):
            uvfits.read_uvfits(fn)

    def test_no_freq_axis(self, tmp_path):
        axes = [a for a in STD_AXES if a[0] != 'FREQ']
        re, im = simple_vis(n_chan=1)
        fn = self._base(tmp_path, axes=axes,
                        data=pack_data(re, im, np.ones_like(re),
                                       axes + [('FREQ', 1, 1, 1, 1)]
                                       )[..., 0, :, :])
        with pytest.raises(ValueError, match="FREQ"):
            uvfits.read_uvfits(fn)

    def test_no_complex_axis(self, tmp_path):
        axes = [('STOKES', 3, 1.0, 1.0, 1.0)] + STD_AXES[1:]
        re, im = simple_vis()
        data = pack_data(re, im, np.ones_like(re),
                         [('COMPLEX', 3, 1, 1, 1)] + STD_AXES[1:])
        fn = self._base(tmp_path, axes=axes, data=data)
        with pytest.raises(ValueError, match="COMPLEX"):
            uvfits.read_uvfits(fn)

    def test_cross_hands_only(self, tmp_path):
        re, im = simple_vis()
        n_chan, n_vis = re.shape
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('STOKES', 2, -3.0, 1.0, -1.0),     # RL, LR
                ('FREQ', n_chan, 1.0e9, 1.0, 1.0e6),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        dat = np.zeros((n_vis, 1, 1, n_chan, 2, 3))
        dat[..., 2] = 1.0
        fn = self._base(tmp_path, axes=axes, data=dat)
        with pytest.raises(ValueError, match="RL.*LR|cannot form"):
            uvfits.read_uvfits(fn)

    def test_multi_if_without_fq(self, tmp_path):
        n_chan, n_if, n_vis = 2, 3, 8
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 1.0e9, 1.0, 1.0e6),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        dat = np.zeros((n_vis, 1, 1, n_if, n_chan, 1, 3))
        fn = self._base(tmp_path, axes=axes, data=dat)
        with pytest.raises(ValueError, match="FQ"):
            uvfits.read_uvfits(fn)

    def test_non_degenerate_ra_axis(self, tmp_path):
        axes = [a if a[0] != 'RA' else ('RA', 2, 0.0, 1.0, 1.0)
                for a in STD_AXES]
        re, im = simple_vis()
        n_chan, n_vis = re.shape
        dat = np.zeros((n_vis, 1, 2, n_chan, 1, 3))
        fn = self._base(tmp_path, axes=axes, data=dat)
        with pytest.raises(ValueError, match="RA"):
            uvfits.read_uvfits(fn)

    def test_varying_freqsel(self, tmp_path):
        pars = std_pars() + [('FREQSEL', 1.0, 0.0)]
        pv = np.concatenate(
            [std_par_vals(8)[0],
             np.arange(8, dtype=float)[:, None] % 2 + 1], axis=1)
        fn = self._base(tmp_path, pars=pars, par_vals=pv)
        with pytest.raises(ValueError, match="frequency setups"):
            uvfits.read_uvfits(fn)

    def test_multi_setup_fq_unmatched_freqsel(self, tmp_path):
        """FREQSEL pointing at no FQ row (or a multi-row FQ with no
        FRQSEL column) must raise, never silently use row 0."""
        n_chan, n_if, n_vis = 2, 2, 8
        cube = np.ones((n_vis, 1, 1, n_if, 1, n_chan, 3))
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        if_freq = np.zeros((2, n_if))
        ch_w = np.full((2, n_if), 1e6)
        sideband = np.ones((2, n_if), int)
        pars = std_pars() + [('FREQSEL', 1.0, 0.0)]
        pv = np.concatenate([std_par_vals(n_vis)[0],
                             np.full((n_vis, 1), 3.0)], axis=1)
        fn = build_group_file(
            tmp_path / 'badsel.uvfits', axes=axes, pars=pars,
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband,
                                      frqsel=(1, 2)))
        with pytest.raises(ValueError, match="FRQSEL=3"):
            uvfits.read_uvfits(fn)
        fn2 = build_group_file(
            tmp_path / 'nocol.uvfits', axes=axes, pars=pars,
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband,
                                      with_frqsel_col=False))
        with pytest.raises(ValueError, match="no FRQSEL column"):
            uvfits.read_uvfits(fn2)

    def test_single_row_fq_unmatched_freqsel(self, tmp_path):
        """Even a ONE-row FQ table must honour FRQSEL matching: groups
        carrying FREQSEL=2 against a lone FRQSEL=1 row (a mis-split
        archive file) must raise, never silently use that row; and a
        bare one-row table (no FRQSEL column) with a non-1 FREQSEL is
        equally unverifiable."""
        n_chan, n_if, n_vis = 2, 2, 8
        cube = np.ones((n_vis, 1, 1, n_if, 1, n_chan, 3))
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, 4.0e9, 1.0, 1.0e6),
                ('STOKES', 1, 1.0, 1.0, 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        if_freq = np.zeros((1, n_if))
        ch_w = np.full((1, n_if), 1e6)
        sideband = np.ones((1, n_if), int)
        pars = std_pars() + [('FREQSEL', 1.0, 0.0)]
        pv = np.concatenate([std_par_vals(n_vis)[0],
                             np.full((n_vis, 1), 2.0)], axis=1)
        fn = build_group_file(
            tmp_path / 'one_row.uvfits', axes=axes, pars=pars,
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband,
                                      frqsel=(1,)))
        with pytest.raises(ValueError, match="FRQSEL=2"):
            uvfits.read_uvfits(fn)
        fn2 = build_group_file(
            tmp_path / 'one_row_nocol.uvfits', axes=axes, pars=pars,
            par_vals=pv, data=cube,
            extensions=build_fq_table(n_if, if_freq, ch_w, sideband,
                                      with_frqsel_col=False))
        with pytest.raises(ValueError, match="no FRQSEL column"):
            uvfits.read_uvfits(fn2)

    def test_varying_source(self, tmp_path):
        pars = std_pars() + [('SOURCE', 1.0, 0.0)]
        pv = np.concatenate(
            [std_par_vals(8)[0],
             np.arange(8, dtype=float)[:, None] % 3 + 1], axis=1)
        fn = self._base(tmp_path, pars=pars, par_vals=pv)
        with pytest.raises(ValueError, match="sources"):
            uvfits.read_uvfits(fn)

    def test_no_baseline_or_antenna_params(self, tmp_path):
        pars = [p for p in std_pars() if p[0] != 'BASELINE']
        pv = np.delete(std_par_vals(8)[0], 3, axis=1)
        fn = self._base(tmp_path, pars=pars, par_vals=pv)
        with pytest.raises(ValueError, match="BASELINE or ANTENNA"):
            uvfits.read_uvfits(fn)

    def test_truncated_group_data(self, tmp_path):
        fn = self._base(tmp_path)
        raw = open(fn, 'rb').read()
        fn2 = tmp_path / 'trunc.uvfits'
        _, dpos = scan_cards(raw)
        fn2.write_bytes(raw[:dpos + 40])
        with pytest.raises(ValueError, match="truncated"):
            uvfits.read_uvfits(str(fn2))

    def test_odd_complex_length(self, tmp_path):
        axes = [('COMPLEX', 4, 1.0, 1.0, 1.0)] + STD_AXES[1:]
        re, im = simple_vis()
        n_chan, n_vis = re.shape
        dat = np.zeros((n_vis, 1, 1, n_chan, 1, 4))
        fn = self._base(tmp_path, axes=axes, data=dat)
        with pytest.raises(ValueError, match="COMPLEX axis length"):
            uvfits.read_uvfits(fn)


# --------------------------------------------------------------------- #
# 4. phase-sign convention through the export path                       #
# --------------------------------------------------------------------- #

class TestPhaseConvention:
    def test_point_source_phase_sign_roundtrip(self, tmp_path):
        """A point source offset by +l carries V = e^{-2 pi i u l} in
        the AIPS/memo-117 sign convention (the sampler's measurement
        kernel, sampler.py) — the sign must survive write + read."""
        rng = np.random.default_rng(11)
        n_vis = 32
        uvw_m = rng.normal(scale=3e3, size=(n_vis, 3))
        freq = 10e9
        lam = 299792458.0 / freq
        l0, m0 = 2e-5, -1e-5                   # radians
        u_l = uvw_m[:, 0] / lam
        v_l = uvw_m[:, 1] / lam
        phase = -2 * np.pi * (u_l * l0 + v_l * m0)
        vis = np.exp(1j * phase)[None, :]
        i, j = np.triu_indices(9, k=1)
        fn = uvfits.write_uvfits(
            str(tmp_path / 'pt.uvfits'), uvw_m, vis.real, vis.imag,
            np.array([freq]), rng.normal(size=(9, 3)), i[:n_vis],
            j[:n_vis], np.zeros(n_vis), ra_deg=0.0, dec_deg=0.0)
        out = uvfits.read_uvfits(fn)
        u_back = out['uvw'][:, 0] / lam
        v_back = out['uvw'][:, 1] / lam
        model = np.exp(-2j * np.pi * (u_back * l0 + v_back * m0))
        got = out['vis_re'][0] + 1j * out['vis_im'][0]
        np.testing.assert_allclose(got, model, rtol=0, atol=1e-5)


# --------------------------------------------------------------------- #
# 5. fit_uvfits failure modes                                            #
# --------------------------------------------------------------------- #

class TestFitUVFITSFailureModes:
    """fit_uvfits (fit/__init__.py) under hostile data: flagged rows,
    conjugate-convention mismatch, unsupported layouts."""

    @pytest.fixture(scope='class')
    def vis_setup(self):
        from rajepy_tpu import JetModel
        from rajepy_tpu import fit as jfit
        params = {
            "target": {"name": "test", "ra": "04:31:34.07736",
                       "dec": "+18:08:04.9020", "epoch": "J2000",
                       "dist": 120., "v_lsr": 6.2, "M_star": 0.55,
                       "R_1": .25, "R_2": 2.5},
            "grid": {"n_x": 16, "n_y": 16, "n_z": 16, "l_z": None,
                     "c_size": 0.5},
            "geometry": {"epsilon": 7. / 9., "opang": 25., "w_0": 1.,
                         "r_0": 1., "inc": 90., "pa": 0.,
                         "rotation": "CCW"},
            "power_laws": {"q_v": 0., "q_T": 0., "q_x": 0., "q^d_n": 0.,
                           "q^d_T": 0., "q^d_v": 0., "q^d_x": 0.},
            # mlr_rj != mlr_bj: the asymmetric source carries real phase
            # structure, so a conjugated dataset is NOT degenerate
            "properties": {"v_0": 150., "x_0": 0.1, "T_0": 1E4,
                           "mu": 1.3, "mlr_bj": 1e-7, "mlr_rj": 5e-8},
            "ejection": {"t_0": np.array([0.5]), "hl": np.array([0.15]),
                         "chi": np.array([5.]),
                         "which": np.array(["B"])},
        }
        rng = np.random.default_rng(7)
        n_ant = 13
        i, j = np.triu_indices(n_ant, k=1)
        uvw = rng.normal(0, 2e4, (i.size, 3))
        freqs = np.array([1e11, 3e11])
        true = copy.deepcopy(params)
        true['properties'].update(mlr_bj=2e-7)
        jm_t = JetModel(true)
        jm_t.time = 0.0
        fwd_t, th_t = jfit.build_vis_forward(jm_t, freqs, uvw,
                                             ('properties.mlr_bj',))
        vis = np.asarray(fwd_t(th_t))
        sigma = 0.02 * np.abs(vis).max()
        noisy = vis + (rng.normal(0, sigma, vis.shape) +
                       1j * rng.normal(0, sigma, vis.shape))
        return dict(params=params, uvw=uvw, freqs=freqs, vis=noisy,
                    sigma=sigma, n_ant=n_ant, ant1=i, ant2=j, rng=rng)

    def _write(self, tmp_path, s, vis, name, **kw):
        rng = np.random.default_rng(0)
        return uvfits.write_uvfits(
            str(tmp_path / name), s['uvw'], vis.real, vis.imag,
            s['freqs'], rng.normal(0, 1e4, (s['n_ant'], 3)), s['ant1'],
            s['ant2'], np.full(s['ant1'].size, 30.0), ra_deg=100.0,
            dec_deg=20.0, sigma=s['sigma'], **kw)

    def _fit(self, s, fn, **kw):
        from rajepy_tpu import JetModel
        from rajepy_tpu import fit as jfit
        jm = JetModel(copy.deepcopy(s['params']))
        jm.time = 0.0
        return jfit.fit_uvfits(jm, fn, free=('properties.mlr_bj',),
                               steps=120, learning_rate=0.05, **kw)

    def test_flagged_rows_are_excluded(self, vis_setup, tmp_path):
        """Visibilities corrupted by 50x but flagged (negative weights)
        must not move the fit; the same corruption unflagged wrecks it."""
        s = vis_setup
        vis = s['vis'].copy()
        bad = np.zeros(vis.shape, bool)
        bad[:, ::3] = True                       # a third of the rows
        vis[bad] *= 50.0
        fn_flagged = self._write(tmp_path, s, vis, 'flagged.uvfits',
                                 flags=bad)
        res = self._fit(s, fn_flagged)
        assert res.values['properties.mlr_bj'] == \
            pytest.approx(2e-7, rel=0.03)
        assert res.loss[-1] < 3.0
        fn_unflagged = self._write(tmp_path, s, vis, 'unflagged.uvfits')
        res_bad = self._fit(s, fn_unflagged)
        assert abs(res_bad.values['properties.mlr_bj'] / 2e-7 - 1) > 0.10

    def test_conjugated_data_is_detectable_not_silent(self, vis_setup,
                                                      tmp_path):
        """A file in the opposite phase convention converges to a loss
        far above the reduced-chi-squared floor (the documented
        mismatch diagnostic) instead of quietly returning plausible
        numbers with a good fit quality."""
        s = vis_setup
        fn_ok = self._write(tmp_path, s, s['vis'], 'ok.uvfits')
        res_ok = self._fit(s, fn_ok)
        assert res_ok.values['properties.mlr_bj'] == \
            pytest.approx(2e-7, rel=0.03)
        assert res_ok.loss[-1] < 3.0             # the chi-squared floor
        fn_conj = self._write(tmp_path, s, np.conj(s['vis']),
                              'conj.uvfits')
        res_conj = self._fit(s, fn_conj)
        assert res_conj.loss[-1] > 30.0          # loudly inconsistent

    def test_wrong_layout_raises_through_fit(self, vis_setup, tmp_path):
        """Reader rejections surface as clear errors from fit_uvfits,
        never as a silently-wrong fit."""
        s = vis_setup
        re, im = simple_vis()
        n_chan, n_vis = re.shape
        axes = [('COMPLEX', 3, 1.0, 1.0, 1.0),
                ('STOKES', 2, -3.0, 1.0, -1.0),   # RL, LR only
                ('FREQ', n_chan, 1.0e9, 1.0, 1.0e6),
                ('RA', 1, 0.0, 1.0, 1.0), ('DEC', 1, 0.0, 1.0, 1.0)]
        dat = np.zeros((n_vis, 1, 1, n_chan, 2, 3))
        fn = build_group_file(tmp_path / 'cross.uvfits', axes=axes,
                              pars=std_pars(),
                              par_vals=std_par_vals(n_vis)[0], data=dat)
        with pytest.raises(ValueError, match="cannot form"):
            self._fit(s, fn)


# --------------------------------------------------------------------- #
# 4. randomized layout fuzz: the supported-format matrix, cross-product  #
# --------------------------------------------------------------------- #

class TestRandomizedLayoutFuzz:
    """Each seed draws a random combination of supported layout variants
    (axis order, COMPLEX length, Stokes set, IF count, FQ table shape,
    FREQSEL, baseline encoding, PZERO/PSCAL, DATE split, interposed
    extensions) and asserts the reader recovers the exact visibilities,
    weights, (u,v,w), antenna indices and frequencies — every expectation
    computed HERE, independently of the reader's logic."""

    @pytest.mark.parametrize('seed', range(24))
    def test_random_layout_roundtrip(self, seed, tmp_path):
        rng = np.random.default_rng(1000 + seed)
        n_vis = 12
        n_chan = int(rng.choice([1, 2, 5]))
        n_if = int(rng.choice([1, 2, 3]))
        n_cplx = int(rng.choice([2, 3]))
        stokes_sets = [(1,), (-1, -2), (-5, -6), (-1,),
                       (-1, -2, -3, -4)]
        stokes_codes = list(stokes_sets[rng.integers(len(stokes_sets))])
        n_stok = len(stokes_codes)
        use_fq = bool(n_if > 1 or rng.random() < 0.5)
        multi_setup = bool(use_fq and rng.random() < 0.5)
        freqsel = 2 if multi_setup else 1
        use_antenna_pars = bool(rng.random() < 0.3)
        use_ext_baseline = bool(not use_antenna_pars and
                                rng.random() < 0.3)
        split_date = bool(rng.random() < 0.5)
        interpose_ext = bool(use_fq and rng.random() < 0.4)
        crpix_f = float(rng.choice([1.0, 2.0]))
        crval_f = 4.0e9
        cdelt_f = float(rng.choice([1.0e6, -2.0e6]))

        # ---------- ground truth ----------
        uvw_true = rng.normal(scale=2e4, size=(n_vis, 3))
        a1 = rng.integers(0, 3, n_vis)
        a2 = a1 + 1 + rng.integers(0, 3, n_vis)
        jd_true = 2451544.5 + 0.25 + np.arange(n_vis) * 1e-5
        # per-(if,stokes) planes; weights random positive, some flagged
        cube = rng.normal(size=(n_vis, n_if, n_stok, n_chan, 3))
        if n_cplx == 3:
            cube[..., 2] = rng.uniform(0.5, 2.0,
                                       size=cube[..., 2].shape)
            flag = rng.random(size=cube[..., 2].shape) < 0.15
            cube[..., 2] = np.where(flag, -cube[..., 2], cube[..., 2])
        else:
            cube = cube[..., :2]

        # expected Stokes-I combination (independent re-derivation)
        w_full = cube[..., 2] if n_cplx == 3 else \
            np.ones(cube.shape[:-1])
        if 1 in stokes_codes:
            k = stokes_codes.index(1)
            exp = cube[:, :, k, :, :2] if n_cplx == 3 else \
                cube[:, :, k, :, :]
            exp_re, exp_im = exp[..., 0], exp[..., 1]
            exp_wt = w_full[:, :, k, :]
        elif n_stok == 1:
            exp_re, exp_im = cube[..., 0, :, 0], cube[..., 0, :, 1]
            exp_wt = w_full[:, :, 0, :]
        else:
            pair = (stokes_codes.index(-1), stokes_codes.index(-2)) \
                if -1 in stokes_codes else \
                (stokes_codes.index(-5), stokes_codes.index(-6))
            wa = np.maximum(w_full[:, :, pair[0], :], 0.0)
            wb = np.maximum(w_full[:, :, pair[1], :], 0.0)
            div = np.where(wa + wb > 0, wa + wb, 1.0)
            exp_re = (wa * cube[:, :, pair[0], :, 0] +
                      wb * cube[:, :, pair[1], :, 0]) / div
            exp_im = (wa * cube[:, :, pair[0], :, 1] +
                      wb * cube[:, :, pair[1], :, 1]) / div
            exp_wt = wa + wb

        # expected frequencies
        chan_off = np.arange(n_chan) - (crpix_f - 1.0)
        if use_fq:
            if_freq = np.round(rng.uniform(-2e8, 2e8, (2, n_if)))
            ch_w = np.round(rng.uniform(1e5, 5e6, (2, n_if)))
            sideband = rng.choice([-1, 1], (2, n_if))
            r = freqsel - 1          # FRQSEL column holds (1, 2)
            exp_freqs = np.concatenate([
                crval_f + if_freq[r, i] +
                chan_off * ch_w[r, i] * sideband[r, i]
                for i in range(n_if)])
            fq_ext = build_fq_table(
                n_if, if_freq if multi_setup else if_freq[r],
                ch_w if multi_setup else ch_w[r],
                sideband if multi_setup else sideband[r],
                frqsel=(1, 2) if multi_setup else (freqsel,))
        else:
            exp_freqs = crval_f + chan_off * cdelt_f
            fq_ext = b''
        if interpose_ext:
            img = np.zeros((17, 5), '>f8').tobytes()
            fq_ext = header_bytes(
                [card('XTENSION', 'IMAGE'), card('BITPIX', -64),
                 card('NAXIS', 2), card('NAXIS1', 5),
                 card('NAXIS2', 17), card('PCOUNT', 0),
                 card('GCOUNT', 1), card('EXTNAME', 'JUNK'),
                 card('END')]) + img + \
                b'\x00' * (-len(img) % BLOCK) + fq_ext

        # ---------- group parameters (random PSCAL/PZERO) ----------
        pars, cols = [], []

        def add_par(ptype, true_vals, pscal=None, pzero=None):
            p = float(pscal if pscal is not None else
                      rng.choice([1.0, 1e-7, 4.0]))
            z = float(pzero if pzero is not None else
                      rng.choice([0.0, rng.normal(scale=1e-5)]))
            pars.append((ptype, p, z))
            cols.append((np.asarray(true_vals, np.float64) - z) / p)

        from rajepy_tpu.synthobs.uvfits import C_MPS
        add_par('UU---SIN', uvw_true[:, 0] / C_MPS)
        add_par('VV---SIN', uvw_true[:, 1] / C_MPS)
        add_par('WW---SIN', uvw_true[:, 2] / C_MPS)
        if use_antenna_pars:
            add_par('ANTENNA1', a1 + 1.0, pscal=1.0, pzero=0.0)
            add_par('ANTENNA2', a2 + 1.0, pscal=1.0, pzero=0.0)
        elif use_ext_baseline:
            add_par('BASELINE',
                    2048.0 * (a1 + 1) + (a2 + 1) + 65536.0,
                    pscal=1.0, pzero=0.0)
        else:
            add_par('BASELINE', 256.0 * (a1 + 1) + (a2 + 1),
                    pscal=1.0, pzero=0.0)
        if split_date:
            day = np.floor(jd_true - 2451544.5)
            add_par('DATE', day + 2451544.5, pscal=1.0,
                    pzero=2451544.5)
            add_par('DATE', jd_true - 2451544.5 - day,
                    pscal=1.0, pzero=0.0)
        else:
            add_par('DATE', jd_true, pscal=1.0, pzero=2451544.5)
        if freqsel != 1:
            add_par('FREQSEL', np.full(n_vis, float(freqsel)),
                    pscal=1.0, pzero=0.0)
        par_vals = np.stack(cols, axis=1)

        # ---------- axes, randomly ordered ----------
        axes = [('COMPLEX', n_cplx, 1.0, 1.0, 1.0),
                ('FREQ', n_chan, crval_f, crpix_f, cdelt_f),
                ('STOKES', n_stok, float(stokes_codes[0]), 1.0,
                 float(stokes_codes[1] - stokes_codes[0])
                 if n_stok > 1 else 1.0),
                ('IF', n_if, 1.0, 1.0, 1.0),
                ('RA', 1, 40.0, 1.0, 1.0), ('DEC', 1, -12.0, 1.0, 1.0)]
        order = rng.permutation(len(axes))
        axes = [axes[i] for i in order]
        names = [a[0] for a in axes]
        lens = [a[1] for a in axes]
        nax = len(axes)
        dat = np.zeros((n_vis,) + tuple(reversed(lens)))
        mv = np.moveaxis(
            dat, [1 + (nax - 1 - names.index(nm))
                  for nm in ('IF', 'STOKES', 'FREQ', 'COMPLEX')],
            [1, 2, 3, 4])
        mv[..., 0, 0] = cube        # RA/DEC trail as the two length-1s

        fn = build_group_file(tmp_path / f'fuzz{seed}.uvfits',
                              axes=axes, pars=pars, par_vals=par_vals,
                              data=dat, extensions=fq_ext)
        out = uvfits.read_uvfits(fn)

        # f32 storage: compare at f32 precision
        # f32 storage + random PSCAL/PZERO de/re-scaling: ~1e-6 relative
        np.testing.assert_allclose(out['uvw'], uvw_true, rtol=1e-5,
                                   atol=1e-3)
        np.testing.assert_array_equal(out['ant1'], a1)
        np.testing.assert_array_equal(out['ant2'], a2)
        np.testing.assert_allclose(out['jd'], jd_true, rtol=0,
                                   atol=1e-6)
        np.testing.assert_allclose(out['freqs'], exp_freqs, rtol=0,
                                   atol=max(1.0, abs(cdelt_f) * 1e-5))
        exp_re_t = exp_re.reshape(n_vis, n_if * n_chan).T
        exp_im_t = exp_im.reshape(n_vis, n_if * n_chan).T
        exp_wt_t = exp_wt.reshape(n_vis, n_if * n_chan).T
        np.testing.assert_allclose(out['vis_re'], exp_re_t, rtol=0,
                                   atol=5e-7)
        np.testing.assert_allclose(out['vis_im'], exp_im_t, rtol=0,
                                   atol=5e-7)
        np.testing.assert_allclose(out['weights'], exp_wt_t, rtol=0,
                                   atol=5e-7)
        assert out['n_if'] == n_if
