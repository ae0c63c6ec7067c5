"""Run logging: timestamped, typed entries mirrored to file and console.

API-compatible rebuild of the reference's logger/logger.py (Log at
logger.py:12-150, Entry at logger.py:176-251), fixing the reference's empty
``logger/__init__.py`` export bug (SURVEY §1 L8): ``Log`` is importable both
from ``rajepy_tpu`` and ``rajepy_tpu.utils``.

Unlike the reference, file writes are append-only without re-reading the
whole log per entry (logger.py:139-150 re-reads the file on every write).
"""
from __future__ import annotations

import os
import time
from typing import Dict


VALID_MTYPES = ("INFO", "ERROR", "WARNING")
_MTYPE_WIDTH = max(len(m) for m in VALID_MTYPES)


class Entry:
    """A single log entry (reference logger.py:176-251)."""

    valid_mtypes = VALID_MTYPES
    mtype_max_len = _MTYPE_WIDTH

    def __init__(self, mtype: str, entry: str, timestamp: bool = True):
        if not isinstance(mtype, str):
            raise TypeError("mtype must be a str")
        if not isinstance(entry, str):
            raise TypeError("entry must be a str")
        if mtype.upper() not in VALID_MTYPES:
            raise TypeError("mtype must be one of " + ", ".join(VALID_MTYPES))
        self._rtime = time.time()
        self._mtime = time.localtime()
        self._mtype = mtype.upper()
        self._message = entry
        self.timestamp = timestamp

    def __repr__(self):
        return (f"Entry(mtype={self._mtype!r}, entry={self._message!r}, "
                f"timestamp={self.timestamp})")

    def __str__(self):
        preamble = ':: '.join([self.time_str(),
                               format(self.mtype, str(self.mtype_max_len))])
        if not self.timestamp:
            preamble = ' ' * len(preamble)
        lines = self.message.split('\n')
        for i in range(1, len(lines)):
            lines[i] = ' ' * (len(preamble) + 2) + lines[i]
        return ': '.join([preamble, '\n'.join(lines)])

    @property
    def rtime(self) -> float:
        return self._rtime

    @property
    def message(self) -> str:
        return self._message

    @property
    def mtype(self) -> str:
        return self._mtype

    @property
    def mtime(self):
        return self._mtime

    def time_str(self, fmt='%d%B%Y-%H:%M:%S') -> str:
        return time.strftime(fmt, self.mtime).upper()


class Log:
    """Create, store and persist log entries (reference logger.py:12-150)."""

    @classmethod
    def combine_logs(cls, log1: 'Log', log2: 'Log', filename: str,
                     delete_old_logs: bool) -> 'Log':
        """Time-merge two logs into a new file (logger.py:17-61)."""
        for logfile in (log1.filename, log2.filename):
            if delete_old_logs or filename == logfile:
                if os.path.exists(logfile):
                    os.remove(logfile)

        entries = sorted(
            list(log1.entries.values()) + list(log2.entries.values()),
            key=lambda e: e.rtime)

        new_log = cls(filename, verbose=log1.verbose or log2.verbose)
        new_log.entries = {i + 1: e for i, e in enumerate(entries)}
        for e in entries:
            new_log.write_entry(e)
        return new_log

    def __init__(self, fname: str, verbose: bool = True):
        self._entries: Dict[int, Entry] = {}
        self._filename = fname
        self._verbose = verbose

    def __str__(self):
        return '\n'.join(str(self._entries[n])
                         for n in sorted(self._entries))

    @property
    def filename(self) -> str:
        return self._filename

    @property
    def verbose(self) -> bool:
        return self._verbose

    @verbose.setter
    def verbose(self, new_verbosity: bool):
        self._verbose = new_verbosity

    @property
    def entries(self) -> Dict[int, Entry]:
        return self._entries

    @entries.setter
    def entries(self, new_entries: Dict[int, Entry]):
        self._entries = new_entries

    def add_entry(self, mtype: str, entry: str, timestamp: bool = True):
        """Append an entry; echo to stdout when verbose (logger.py:103-137)."""
        parent = os.path.dirname(self.filename)
        if parent and not os.path.isdir(parent):
            raise FileNotFoundError(parent)
        new_entry = Entry(mtype, entry, timestamp)
        self._entries[len(self._entries) + 1] = new_entry
        if self._verbose:
            print(new_entry)
        self.write_entry(new_entry)

    def write_entry(self, entry: Entry):
        prefix = '' if (not os.path.exists(self.filename) or
                        os.path.getsize(self.filename) == 0) else '\n'
        with open(self.filename, 'at') as f:
            f.write(prefix + str(entry))
