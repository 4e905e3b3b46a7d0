"""Error taxonomy for pocketkaldi_tpu.

The reference carries two parallel error systems (C++ ``Status`` value type,
``src/status.h:37-100``, and the C ``pk_status_t`` struct,
``src/pocketkaldi.h:30-34``).  We collapse both into one small exception
hierarchy: Python exceptions are the idiomatic status channel, and the error
*codes* of the reference map 1:1 onto exception classes so callers can still
dispatch on failure kind.
"""

from __future__ import annotations


class PkError(Exception):
    """Base class for all pocketkaldi_tpu errors (``Status`` analogue)."""


class PkIOError(PkError):
    """File could not be opened/read (``Status::IOError``, status.h:41-44)."""


class CorruptionError(PkError):
    """A model/data file failed validation (``Status::Corruption``, status.h:45-48)."""


class PkRuntimeError(PkError):
    """Generic runtime failure (``Status::RuntimeError``, status.h:49-52)."""


class NotImplementedPkError(PkError):
    """Feature intentionally unsupported (``Status::NotImplemented``, status.h:53-56)."""


def check(cond: bool, exc_type: type, msg: str) -> None:
    """Raise ``exc_type(msg)`` unless ``cond`` — the ``PK_CHECK_STATUS`` analogue."""
    if not cond:
        raise exc_type(msg)
