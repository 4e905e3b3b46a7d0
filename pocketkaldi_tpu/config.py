"""Text configuration / model-manifest parser.

Mirrors the behaviour of the reference ``Configuration`` class
(``src/configuration.cc:14-90``):

  * ``key = value`` lines; keys are lowercased; values trimmed.
  * ``#`` starts a comment line; blank lines ignored.
  * ``get_path`` resolves relative paths against the directory containing the
    config file itself — this is how one "model file" references its binary
    sub-model files (fst, nnet, prior, ...).

On top of the reference semantics we promote the hyperparameters that the
reference hard-codes (beam = 16.0 ``decoder.cc:31``, max_active = 30000
``decoder.h:45``, acoustic_scale = 0.1 ``pocketkaldi.cc:215``) into real,
overridable config keys — see ``hparams.py``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from .errors import CorruptionError, PkIOError


class Configuration:
    """A parsed ``key = value`` config file with path resolution."""

    def __init__(self, table: Optional[Dict[str, str]] = None, filename: str = ""):
        self._table: Dict[str, str] = dict(table or {})
        self._filename = filename

    @classmethod
    def read(cls, filename: str) -> "Configuration":
        """Parse ``filename``; raises like ``Configuration::Read`` (configuration.cc:14-54)."""
        try:
            with open(filename, "r", encoding="utf-8") as fd:
                lines = fd.read().splitlines()
        except OSError as e:
            raise PkIOError(f"unable to open configuration file: {filename}") from e

        table: Dict[str, str] = {}
        for line in lines:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            fields = line.split("=")
            if len(fields) != 2:
                raise CorruptionError(f"Unexpected line in {filename}: {line}")
            key = fields[0].strip().lower()
            value = fields[1].strip()
            if not value:
                raise CorruptionError(f"Value could not be empty: {filename}: {line}")
            table[key] = value
        return cls(table, filename)

    @property
    def filename(self) -> str:
        return self._filename

    def get_string(self, key: str, default: Optional[str] = None) -> str:
        val = self._table.get(key.lower())
        if val is None:
            if default is None:
                raise CorruptionError(
                    f"key '{key}' not found in configuration: {self._filename}")
            return default
        return val

    def get_integer(self, key: str, default: Optional[int] = None) -> int:
        val = self._table.get(key.lower())
        if val is None:
            if default is None:
                raise CorruptionError(
                    f"key '{key}' not found in configuration: {self._filename}")
            return default
        return int(val)

    def get_float(self, key: str, default: Optional[float] = None) -> float:
        val = self._table.get(key.lower())
        if val is None:
            if default is None:
                raise CorruptionError(
                    f"key '{key}' not found in configuration: {self._filename}")
            return default
        return float(val)

    def get_path(self, key: str, default: Optional[str] = None) -> str:
        """Value resolved against the config file's own directory.

        Mirrors ``GetPathOrElse`` (configuration.cc:56-71): absolute paths pass
        through; relative paths are joined with ``dirname(config_file)``.
        """
        path = self._table.get(key.lower())
        if path is None:
            if default is None:
                raise CorruptionError(
                    f"path key '{key}' not found in configuration: {self._filename}")
            return default
        if os.path.isabs(path):
            return path
        directory = os.path.dirname(self._filename)
        return os.path.join(directory, path) if directory else path

    def has(self, key: str) -> bool:
        return key.lower() in self._table

    def as_dict(self) -> Dict[str, str]:
        return dict(self._table)
