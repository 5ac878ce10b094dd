"""File-format tools (analog of reference pyscf/tools)."""
from . import fcidump, cubegen, molden, qcschema, mo_mapping, dump_mat
from . import finite_diff, wfn_format, chgcar
