"""Shared utilities."""
from . import misc, validation  # noqa: F401
from .logger import Entry, Log  # noqa: F401
