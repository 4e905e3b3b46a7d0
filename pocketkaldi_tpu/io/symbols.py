"""Word-id → string symbol table (``pk_symboltable_t`` analogue).

The reference keeps one packed ``\\0``-separated char buffer plus an int32
offset array (``src/symbol_table.{h,cc}``); in Python a plain list of strings
carries the same contract.  Binary ``SYM0`` serialization lives in
``io/binary.py``.
"""

from __future__ import annotations

from typing import List, Sequence

from . import binary


class SymbolTable:
    def __init__(self, words: Sequence[str]):
        self._words: List[str] = list(words)

    @classmethod
    def read(cls, filename: str) -> "SymbolTable":
        return cls(binary.read_symbol_table_file(filename))

    def write(self, filename: str) -> None:
        binary.write_symbol_table_file(filename, self._words)

    def get(self, symbol_id: int) -> str:
        """Lookup like ``pk_symboltable_get`` (symbol_table.cc:75-79)."""
        if not 0 <= symbol_id < len(self._words):
            raise IndexError(f"symbol_id {symbol_id} out of range "
                             f"[0, {len(self._words)})")
        return self._words[symbol_id]

    def __len__(self) -> int:
        return len(self._words)

    def __iter__(self):
        return iter(self._words)
