"""Restricted open-shell Kohn-Sham DFT (analog of reference
pyscf/dft/roks.py).

The XC potential is the spin-resolved UKS one evaluated on the ROHF
alpha/beta densities (dft/uks.py machinery); the single effective Fock
comes from ROHF's Roothaan coupling of the two spin Focks
(scf/rohf.py get_fock). Same host driver as ROHF (the open-shell
projector algebra keeps this off the fused one-dispatch path)."""
from ..scf.rohf import ROHF
from .rks import KohnShamDFT
from .uks import UKS


class ROKS(KohnShamDFT, ROHF):

    _fused_kind = None      # Roothaan coupling runs in the host loop

    def __init__(self, mol, xc='lda,vwn'):
        ROHF.__init__(self, mol)
        self._init_ks(xc)

    # spin-resolved veff/energy are exactly the UKS expressions on the
    # (alpha, beta) ROHF densities (reference dft/roks.py get_veff
    # delegates to uks.get_veff the same way)
    get_veff = UKS.get_veff
    energy_elec = UKS.energy_elec
