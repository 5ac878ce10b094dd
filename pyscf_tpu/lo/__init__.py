"""Orbital localization (analog of reference pyscf/lo)."""
from . import boys
from . import pipek
from . import orth
from . import iao as iao_mod
from . import edmiston
from . import nao as nao_mod
from .boys import Boys
from .pipek import PipekMezey, PM
from .orth import orth_ao, lowdin
from .iao import iao, ibo
from .edmiston import EdmistonRuedenberg, kernel as edmiston_ruedenberg
from .nao import nao, prenao, npa_charges
from .cholesky import cholesky_mos
