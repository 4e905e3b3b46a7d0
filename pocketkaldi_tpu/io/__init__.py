from . import binary, wav  # noqa: F401
from .symbols import SymbolTable  # noqa: F401
