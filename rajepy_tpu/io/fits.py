"""Minimal, dependency-free FITS writer/reader.

The reference writes sky models through astropy.io.fits
(classes.py:1543-1652); astropy is not part of this framework's runtime
footprint, so the (small) required subset of FITS is implemented directly:
single-HDU primary images, BITPIX -32/-64, 80-char cards in 2880-byte
blocks, string/numeric/boolean values, COMMENT/HISTORY cards.

The reader handles everything this writer produces (plus common simple
primary-HDU images), enough for pipeline resume (classes.py:2430) and the
synthetic-observation backend's sky-model ingestion (classes.py:2691-2707).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.misc import atomic_write

BLOCK = 2880
CARD = 80


def _format_value(value) -> str:
    if isinstance(value, bool):
        return 'T' if value else 'F'
    if isinstance(value, str):
        s = value.replace("'", "''")
        return "'" + s.ljust(8) + "'"
    if isinstance(value, (int, np.integer)):
        return str(int(value))
    if isinstance(value, (float, np.floating)):
        v = float(value)
        if not np.isfinite(v):
            # the FITS standard has no non-finite card values; write the
            # tokens our reader (and astropy, with a warning) parse back
            # via float() rather than crashing the whole product write on
            # int(nan) (e.g. a degenerate beam fit, an inf dynamic range)
            return 'NaN' if np.isnan(v) else ('INF' if v > 0 else '-INF')
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        # fixed-width scientific, 17 significant digits: round-trips any
        # float64 exactly and never overflows the card
        return f"{v:.16E}"
    raise TypeError(f"unsupported FITS header value type: {type(value)}")


def _chunk_string(value: str, limit: int = 66) -> List[str]:
    """Split so each chunk's quote-escaped form fits a CONTINUE card."""
    chunks: List[str] = []
    cur, cur_len = '', 0
    for ch in value:
        el = 2 if ch == "'" else 1
        if cur_len + el > limit:
            chunks.append(cur)
            cur, cur_len = '', 0
        cur += ch
        cur_len += el
    chunks.append(cur)
    return chunks


def _card(key: str, value=None, comment: str = '') -> str:
    key = key.upper()[:8]
    if key in ('COMMENT', 'HISTORY', 'END', ''):
        text = f"{key:<8}{value if value is not None else '':<72}"
        return text[:CARD].ljust(CARD)
    vs = _format_value(value)
    if vs.startswith("'"):
        body = f"{key:<8}= {vs}"
    else:
        body = f"{key:<8}= {vs:>20}"
    if comment:
        body += f" / {comment}"
    return body[:CARD].ljust(CARD)


def _render_card(key: str, value=None, comment: str = '') -> List[str]:
    """One or more 80-char cards for (key, value): long string values use
    the CONTINUE convention ('&'-terminated chunks) instead of being
    silently truncated."""
    if (isinstance(value, str) and key.upper() not in
            ('COMMENT', 'HISTORY', 'END', '') and
            len(value.replace("'", "''")) > 67):
        chunks = _chunk_string(value)
        cards = []
        for i, chunk in enumerate(chunks):
            esc = chunk.replace("'", "''")
            amp = '&' if i + 1 < len(chunks) else ''
            text = "'" + esc + amp + "'"
            if i == 0:
                cards.append(f"{key.upper()[:8]:<8}= {text}"
                             [:CARD].ljust(CARD))
            else:
                cards.append(f"CONTINUE  {text}"[:CARD].ljust(CARD))
        return cards
    return [_card(key, value, comment)]


class Header:
    """Ordered FITS header: mapping access plus per-key comments, COMMENT and
    HISTORY accumulation."""

    def __init__(self):
        self._cards: List[Tuple[str, object, str]] = []
        self.comments: Dict[str, str] = _CommentProxy(self)

    def __setitem__(self, key: str, value):
        key = key.upper()
        if key in ('COMMENT', 'HISTORY'):
            for chunk in _split72(str(value)):
                self._cards.append((key, chunk, ''))
            return
        for i, (k, _, c) in enumerate(self._cards):
            if k == key:
                self._cards[i] = (key, value, c)
                return
        self._cards.append((key, value, ''))

    def __getitem__(self, key: str):
        key = key.upper()
        vals = [v for k, v, _ in self._cards if k == key]
        if not vals:
            raise KeyError(key)
        if key in ('COMMENT', 'HISTORY'):
            return vals
        return vals[0]

    def __contains__(self, key: str) -> bool:
        return any(k == key.upper() for k, _, _ in self._cards)

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def copy(self) -> 'Header':
        """Independent deep copy (cards and comments), for derived
        products that tweak a base header (e.g. a unitless BUNIT)."""
        out = Header()
        out._cards = list(self._cards)
        return out

    def keys(self):
        return [k for k, _, _ in self._cards]

    def set_comment(self, key: str, comment: str):
        key = key.upper()
        for i, (k, v, _) in enumerate(self._cards):
            if k == key:
                self._cards[i] = (k, v, comment)
                return
        raise KeyError(key)

    def cards(self):
        return list(self._cards)


class _CommentProxy(dict):
    def __init__(self, header: Header):
        super().__init__()
        self._header = header

    def __setitem__(self, key, value):
        self._header.set_comment(key, value)

    def __getitem__(self, key):
        # comments live in the header's cards, not in this dict — read
        # them back from there (astropy's hdr.comments[key] contract)
        key = key.upper()
        for k, _, c in self._header._cards:
            if k == key:
                return c
        raise KeyError(key)

    def __contains__(self, key):
        return any(k == key.upper() for k, _, _ in self._header._cards)


def _split72(text: str) -> List[str]:
    return [text[i:i + 72] for i in range(0, max(len(text), 1), 72)]


def write_fits(filename: str, data: np.ndarray,
               header: Optional[Header] = None, overwrite: bool = True):
    """Write ``data`` as a primary-HDU FITS image.  Axis order follows the
    FITS convention: data[..., NAXIS2, NAXIS1] (last numpy axis fastest)."""
    if os.path.exists(filename) and not overwrite:
        raise FileExistsError(filename)
    data = np.asarray(data)
    if data.dtype in (np.float32,):
        bitpix, dt = -32, '>f4'
    else:
        bitpix, dt = -64, '>f8'
        data = data.astype(np.float64)

    cards = [_card('SIMPLE', True, 'conforms to FITS standard'),
             _card('BITPIX', bitpix, 'array data type'),
             _card('NAXIS', data.ndim, 'number of array dimensions')]
    for i, n in enumerate(reversed(data.shape)):
        cards.append(_card(f'NAXIS{i + 1}', int(n)))
    if header is not None:
        for key, value, comment in header.cards():
            if key in ('SIMPLE', 'BITPIX', 'NAXIS') or key.startswith('NAXIS'):
                continue
            if key in ('COMMENT', 'HISTORY'):
                cards.append(_card(key, value))
            else:
                cards.extend(_render_card(key, value, comment))
    cards.append(_card('END'))

    header_bytes = ''.join(cards).encode('ascii')
    header_bytes += b' ' * (-len(header_bytes) % BLOCK)

    # stream the payload without materialising tobytes()/concat copies —
    # cube products run to gigabytes (1,000 x 500^2 images) and each
    # avoided pass over the buffer is seconds of wall time
    payload = np.ascontiguousarray(data, dtype=dt)
    # atomic: the pipeline's resume logic treats an EXISTING product
    # file as a completed stage — a truncated FITS from a killed
    # process must never appear under the final name
    with atomic_write(filename) as f:
        f.write(header_bytes)
        f.write(memoryview(payload).cast('B'))
        f.write(b'\x00' * (-payload.nbytes % BLOCK))


def _parse_value(raw: str):
    raw = raw.strip()
    if raw.startswith("'"):
        return raw[1:raw.rindex("'")].rstrip().replace("''", "'")
    if raw == 'T':
        return True
    if raw == 'F':
        return False
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw


def read_fits(filename: str) -> Tuple[np.ndarray, Header]:
    """Read a primary-HDU FITS image -> (data, header)."""
    with open(filename, 'rb') as f:
        raw = f.read()

    header = Header()
    pos = 0
    bitpix = None
    shape = []
    ended = False
    while not ended:
        block = raw[pos:pos + BLOCK].decode('ascii', errors='replace')
        pos += BLOCK
        for i in range(0, BLOCK, CARD):
            card = block[i:i + CARD]
            key = card[:8].strip()
            if key == 'END':
                ended = True
                break
            if not key:
                continue
            if key in ('COMMENT', 'HISTORY'):
                header._cards.append((key, card[8:].rstrip(), ''))
                continue
            if key == 'CONTINUE':
                # long-string continuation: append to the preceding
                # '&'-terminated string value
                rest = card[8:].strip()
                if rest.startswith("'") and header._cards:
                    chunk = _parse_value(rest)
                    pk, pv, pc = header._cards[-1]
                    if isinstance(pv, str) and pv.endswith('&'):
                        joined = pv[:-1] + chunk
                        header._cards[-1] = (pk, joined, pc)
                continue
            if card[8:10] != '= ':
                continue
            rest = card[10:]
            if rest.lstrip().startswith("'"):
                q = rest.index("'")
                q2 = rest.index("'", q + 1)
                while q2 + 1 < len(rest) and rest[q2 + 1] == "'":
                    q2 = rest.index("'", q2 + 2)
                value = _parse_value(rest[:q2 + 1])
                comment = rest[q2 + 1:].lstrip().lstrip('/').strip()
            else:
                parts = rest.split('/', 1)
                value = _parse_value(parts[0])
                comment = parts[1].strip() if len(parts) > 1 else ''
            if key == 'BITPIX':
                bitpix = int(value)
            elif key.startswith('NAXIS') and key != 'NAXIS':
                shape.append(int(value))
            header._cards.append((key, value, comment))

    dt = {8: '>u1', 16: '>i2', 32: '>i4', 64: '>i8',
          -32: '>f4', -64: '>f8'}[bitpix]
    count = int(np.prod(shape)) if shape else 0
    data = np.frombuffer(raw[pos:pos + count * np.dtype(dt).itemsize],
                         dtype=dt, count=count)
    data = data.reshape(tuple(reversed(shape))).astype(
        np.float64 if bitpix < 0 else np.int64)
    bscale = header.get('BSCALE', 1.0)
    bzero = header.get('BZERO', 0.0)
    if bscale != 1.0 or bzero != 0.0:
        data = data * bscale + bzero
    return data, header
