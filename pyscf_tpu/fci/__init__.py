"""Full configuration interaction (analog of reference pyscf/fci)."""
from . import cistring, direct_spin1, direct_spin0, spin_op, addons, rdm
from .direct_spin1 import kernel, contract_2e, make_hdiag, make_rdm1, make_rdm12
from .spin_op import spin_square, contract_ss
from .addons import fix_spin_, kernel_fixed_spin
from .rdm import (make_rdm1s, make_rdm123, make_rdm1234, trans_rdm1,
                  trans_rdm1s, trans_rdm12)


class FCI:
    """Simple FCI solver object (reference fci/direct_spin1.py FCISolver)."""

    conv_tol = 1e-10
    max_cycle = 100
    nroots = 1

    def __init__(self, mol_or_mf=None, mo_coeff=None):
        self.mol = None
        self._scf = None
        if mol_or_mf is not None and hasattr(mol_or_mf, 'mo_coeff'):
            self._scf = mol_or_mf
            self.mol = mol_or_mf.mol
        elif mol_or_mf is not None:
            self.mol = mol_or_mf

    def kernel(self, h1e=None, eri=None, norb=None, nelec=None, ci0=None,
               ecore=0.0, nroots=None, **kwargs):
        if h1e is None:
            # build from the SCF object over all MOs
            import numpy as np
            import jax.numpy as jnp
            from .. import ao2mo
            mf = self._scf
            mo = mf.mo_coeff
            norb = mo.shape[1]
            h1e = np.asarray(mo.T @ mf.get_hcore() @ mo)
            eri = ao2mo.full(mf.mol.intor('int2e'), mo)
            nelec = mf.mol.nelec
            ecore = mf.mol.energy_nuc()
        e, c = kernel(h1e, eri, norb, nelec, ecore=ecore, ci0=ci0,
                      nroots=nroots or self.nroots,
                      max_cycle=self.max_cycle, tol=self.conv_tol)
        self.e_tot = e
        self.ci = c
        return e, c

    make_rdm1 = staticmethod(make_rdm1)
    make_rdm12 = staticmethod(make_rdm12)
    contract_2e = staticmethod(contract_2e)
