"""Minimal structured logging (PK_INFO / PK_WARN analogues, util.h:33-35).

The reference prints bare messages with the source filename; here messages go
through a module logger so embedders can route them, while `info`/`warn`
keep the reference's call shape.  One production warning site exists in the
reference (NaN mel energy, fbank.cc:180-182) — numerical guards here raise
typed exceptions instead, so logging is observability only.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("pocketkaldi_tpu")


def info(msg: str, *args) -> None:
    logger.info(msg, *args)


def warn(msg: str, *args) -> None:
    logger.warning(msg, *args)
