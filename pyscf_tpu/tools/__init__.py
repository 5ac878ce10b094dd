"""File-format tools (analog of reference pyscf/tools)."""
from . import fcidump, cubegen, molden
