"""k-point CCSD over a KRHF reference.

Reference analog: pyscf/pbc/cc/kccsd.py / kccsd_rhf.py. The Bloch MOs of
all k-points are treated as one complex spin-orbital basis: integrals
<(k p)(k' q)||(k'' r)(k''' s)> are nonzero only on momentum-conserving
quartets and carry the supercell normalization 1/nk, after which the
molecular spin-orbital CCSD iteration (cc/gccsd.py, complex-correct
driving terms) applies verbatim; E_corr per cell = E_corr / nk.

This is the dense-MXU formulation: one (2 nk nmo)^4 complex tensor and
full GEMMs, trading the reference's k-block sparsity bookkeeping for
regular shapes (the k-sparse pipelined variant is the scale-out path).
MO ERIs come from the same FFT eri_block validated in pbc/mp/kmp2.py.
"""
import jax.numpy as jnp
import numpy as np

from ...cc.gccsd import _gccsd_energy, _gccsd_update
from ...lib.diis import DIIS
from ..mp.kmp2 import eri_block, kconserve_index


def _bloch_spin_orbital_eris(mf):
    """(<PQ||RS>, mo_energy, nocc) in the sorted Bloch spin-orbital basis."""
    cell = mf.cell
    kpts = np.asarray(mf.kpts)
    nk = len(kpts)
    nmo = np.asarray(mf.mo_coeff[0]).shape[1]
    M = nk * nmo
    ao_k = mf.with_df._ao_on_grid_kpts()
    kconserv = kconserve_index(cell, kpts)
    mos = [np.asarray(mf.mo_coeff[k]) for k in range(nk)]

    # spatial chemist ERIs over Bloch orbitals, supercell normalization
    v = np.zeros((M, M, M, M), dtype=complex)
    for k1 in range(nk):
        for k2 in range(nk):
            for k3 in range(nk):
                # chemist (k1 k2|k3 k4): q12 + q34 in G
                # kconserv[i, j, a] solves ki - ka + kj - kb in G; here we
                # need k2 - k1 + k4 - k3 in G -> k4 = kconserv[k3, k2, k1]?
                # solve directly: kb index with (k2-k1)+(k4-k3) in G
                k4 = int(kconserv[k1, k3, k2])
                blk = eri_block(cell, ao_k, kpts, mos[k1], k1, mos[k2], k2,
                                mos[k3], k3, mos[k4], k4) / nk
                s1, s2 = k1 * nmo, k2 * nmo
                s3, s4 = k3 * nmo, k4 * nmo
                v[s1:s1 + nmo, s2:s2 + nmo, s3:s3 + nmo, s4:s4 + nmo] = blk

    # spin-orbital basis sorted occupied-first by energy
    entries = []
    for s in range(2):
        for k in range(nk):
            occs = np.asarray(mf.mo_occ[k])
            es = np.asarray(mf.mo_energy[k])
            for p in range(nmo):
                entries.append((es[p], s, k * nmo + p, occs[p] > 0))
    entries.sort(key=lambda t: (not t[3], t[0]))
    spins = np.array([e[1] for e in entries])
    orbs = np.array([e[2] for e in entries])
    energies = np.array([e[0] for e in entries])
    nocc = int(sum(1 for e in entries if e[3]))

    sP = spins[:, None, None, None]
    sQ = spins[None, :, None, None]
    sR = spins[None, None, :, None]
    sS = spins[None, None, None, :]
    eri_mo = v[np.ix_(orbs, orbs, orbs, orbs)] * ((sP == sQ) & (sR == sS))
    phys = eri_mo.transpose(0, 2, 1, 3)
    asym = phys - phys.transpose(0, 1, 3, 2)
    return jnp.asarray(asym), jnp.asarray(energies), nocc


class KRCCSD:
    """CCSD on a k-point mesh. e_corr is per unit cell."""

    conv_tol = 1e-7
    conv_tol_normt = 1e-5
    max_cycle = 100
    diis_space = 6

    def __init__(self, mf):
        self._scf = mf
        self.cell = mf.cell
        self.kpts = mf.kpts
        self.verbose = getattr(mf, 'verbose', 0)
        self.converged = False
        self.e_corr = None
        self.emp2 = None

    @property
    def nkpts(self):
        return len(np.asarray(self.kpts).reshape(-1, 3))

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + float(self.e_corr)

    def kernel(self):
        nk = self.nkpts
        eris, mo_e, nocc = _bloch_spin_orbital_eris(self._scf)
        nvir = mo_e.shape[0] - nocc
        o = slice(0, nocc)
        v = slice(nocc, None)
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        t2 = jnp.conj(oovv) / eijab
        t1 = jnp.zeros((nocc, nvir), dtype=eris.dtype)
        self.emp2 = float(_gccsd_energy(t1, t2, oovv).real) / nk
        if self.verbose >= 4:
            print(f'KMP2 (from CC eris) E_corr/cell = {self.emp2:.12f}')
        diis = DIIS(self.diis_space)
        e_last = self.emp2 * nk
        conv = False
        for it in range(self.max_cycle):
            t1n, t2n = _gccsd_update(t1, t2, eris, mo_e, jnp.asarray(nocc))
            normt = float(jnp.linalg.norm(t1n - t1)
                          + jnp.linalg.norm(t2n - t2))
            t1, t2 = diis.update((t1n, t2n), (t1n - t1, t2n - t2))
            e_corr = float(_gccsd_energy(t1, t2, oovv).real)
            de = e_corr - e_last
            e_last = e_corr
            if self.verbose >= 4:
                print(f'KCCSD cycle {it + 1} E_corr/cell = '
                      f'{e_corr / nk:.12f} dE = {de:.3g} |t| = {normt:.3g}')
            if abs(de) < self.conv_tol and normt < self.conv_tol_normt:
                conv = True
                break
        self.converged = conv
        self.e_corr = e_corr / nk
        self.t1, self.t2 = t1, t2
        return self.e_corr, t1, t2

    run = kernel

    def ccsd_t(self):
        """Perturbative triples per cell (complex Bloch spin-orbitals;
        reference pbc/cc/kccsd_t.py analog). Validated against the
        supercell oracle in tests/test_kccsd.py."""
        from ...cc.gccsd_t import kernel as t_kernel
        eris, mo_e, nocc = _bloch_spin_orbital_eris(self._scf)
        return t_kernel(np.asarray(eris), np.asarray(mo_e), nocc,
                        self.t1, self.t2) / self.nkpts


KCCSD = KRCCSD
