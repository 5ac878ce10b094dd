"""CISD (analog of reference pyscf/ci/cisd.py).

Determinant-driven formulation: the CISD space is the <=2-excitation mask
of the FCI determinant grid, and H.c reuses the FCI sigma contraction
(one dense MXU matmul + scatters) projected onto the mask. Exact CISD;
the amplitude-driven O(N^6) formulation follows with larger systems.
"""
import numpy as np
import jax.numpy as jnp

from ..fci import cistring, direct_spin1
from ..lib.linalg import davidson


def _exc_levels(norb, nelec, hf_string):
    strs = cistring.make_strings(norb, nelec)
    return np.array([nelec - bin(int(s) & int(hf_string)).count('1')
                     for s in strs])


class CISD:
    conv_tol = 1e-9
    max_cycle = 100

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.e_corr = None
        self.ci = None

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + float(self.e_corr)

    def kernel(self):
        mf = self._scf
        from .. import ao2mo
        mo = mf.mo_coeff
        norb = mo.shape[1] - self.frozen
        mo = mo[:, self.frozen:]
        h1e = np.asarray(mo.T @ mf.get_hcore() @ mo)
        eri_ao = mf._eri if mf._eri is not None else self.mol.intor('int2e')
        eri = np.asarray(ao2mo.full(eri_ao, jnp.asarray(mo)))
        na_e, nb_e = self.mol.nelec
        na_e -= self.frozen
        nb_e -= self.frozen
        na = cistring.num_strings(norb, na_e)
        nb = cistring.num_strings(norb, nb_e)
        hf_a = sum(1 << i for i in range(na_e))
        hf_b = sum(1 << i for i in range(nb_e))
        exc_a = _exc_levels(norb, na_e, hf_a)
        exc_b = _exc_levels(norb, nb_e, hf_b)
        mask = (exc_a[:, None] + exc_b[None, :]) <= 2
        idx = np.where(mask.ravel())[0]
        nsd = len(idx)

        h2e = direct_spin1.absorb_h1e(h1e, eri, norb, (na_e, nb_e), 0.5)
        h2e_mat = jnp.asarray(h2e.reshape(norb * norb, norb * norb))
        Ia, pqa, Ja, sa = direct_spin1._flat_links(norb, na_e, na)
        Ib, pqb, Jb, sb = direct_spin1._flat_links(norb, nb_e, nb)
        links = tuple(jnp.asarray(x)
                      for x in (Ia, pqa, Ja, sa, Ib, pqb, Jb, sb))

        def matvec(x):
            full = np.zeros(na * nb)
            full[idx] = np.asarray(x)
            out = direct_spin1._contract_2e(
                h2e_mat, jnp.asarray(full.reshape(na, nb)), links,
                norb, na, nb)
            return np.asarray(out).ravel()[idx]

        hdiag_full = direct_spin1.make_hdiag(h1e, eri, norb, (na_e, nb_e))
        hdiag = hdiag_full[idx]
        x0 = np.zeros(nsd)
        hf_addr = (cistring.str2addr(norb, na_e, hf_a) * nb
                   + cistring.str2addr(norb, nb_e, hf_b))
        x0[np.where(idx == hf_addr)[0][0]] = 1.0
        e, vecs, conv = davidson(matvec, x0, neig=1, tol=self.conv_tol,
                                 max_cycle=self.max_cycle, hdiag=hdiag)
        e_elec_hf = float(self._scf.e_tot) - self.mol.energy_nuc()
        self.e_corr = float(e[0]) - e_elec_hf
        self.converged = conv
        ci_full = np.zeros(na * nb)
        ci_full[idx] = vecs[0]
        self.ci = ci_full.reshape(na, nb)
        return self.e_corr, self.ci

    run = kernel


RCISD = CISD
