"""k-point unrestricted Hartree-Fock.

Reference analog: pyscf/pbc/scf/kuhf.py (KUHF:~520). Same host SCF loop
as KRHF with spin-resolved density (2, nk, nao, nao); J couples the
spin-summed density, K acts per spin, Ewald exxdiv per spin.
"""
import numpy as np

from ...lib.diis import DIIS
from .hf import madelung
from .khf import KRHF


class KUHF(KRHF):

    def get_jk(self, dm_kpts, with_j=True, with_k=True):
        dm = np.asarray(dm_kpts)               # (2, nk, nao, nao)
        vj_t, _ = self.with_df.get_jk_kpts(dm[0] + dm[1], True, False)
        vks = []
        for s in range(2):
            _, vk = self.with_df.get_jk_kpts(dm[s], False, True)
            if self.exxdiv == 'ewald':
                sm = np.asarray(self.get_ovlp())
                mad = madelung(self.cell, self.kpts)
                vk = vk + mad * np.einsum('kij,kjl,klm->kim', sm, dm[s], sm)
            vks.append(vk)
        return np.stack([vj_t, vj_t]), np.stack(vks)

    def get_veff(self, dm_kpts):
        vj, vk = self.get_jk(dm_kpts)
        return vj - vk

    def get_occ(self, mo_energy_kpts):
        """Aufbau per spin channel across the k mesh."""
        nk = self.nkpts
        cell = self.cell
        na = (cell.nelectron + cell.spin) // 2 * nk
        nb = cell.nelectron * nk - na
        occs = []
        for s, ntot in enumerate((na, nb)):
            all_e = np.concatenate([np.asarray(e) for e in mo_energy_kpts[s]])
            fermi = np.sort(all_e)[ntot - 1]
            occs.append(np.stack([
                np.where(np.asarray(e) <= fermi + 1e-12, 1.0, 0.0)
                for e in mo_energy_kpts[s]]))
        return np.stack(occs)

    def make_rdm1(self, mo_coeff=None, mo_occ=None):
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = mo_occ if mo_occ is not None else self.mo_occ
        return np.stack([
            np.stack([(ck * ok[None, :]) @ ck.conj().T
                      for ck, ok in zip(c[s], o[s])])
            for s in range(2)])

    def energy_elec(self, dm, h1e, vhf):
        e1 = np.einsum('kij,skji->', h1e, dm).real / self.nkpts
        e2 = 0.5 * np.einsum('skij,skji->', vhf, dm).real / self.nkpts
        return e1 + e2

    def eig_all(self, fock, xk):
        es, cs = [], []
        for s in range(2):
            moe, moc = KRHF.eig_all(self, fock[s], xk)
            es.append(moe)
            cs.append(moc)
        return es, cs

    def init_guess_dm(self, h1e, xk):
        moe, moc = self.eig_all(np.stack([h1e, h1e]), xk)
        occ = self.get_occ(moe)
        dm = self.make_rdm1(moc, occ)
        if self.cell.spin == 0:
            # break alpha/beta symmetry slightly so open-shell solutions
            # are reachable (reference kuhf init_guess_by_minao pattern)
            dm[0] *= 1.0
        return dm

    def kernel(self, dm0=None):
        cell = self.cell
        s = np.asarray(self.get_ovlp())
        h1e = np.asarray(self.get_hcore())
        xk = []
        for k in range(self.nkpts):
            w, v = np.linalg.eigh(s[k])
            keep = w > 1e-10
            xk.append(v[:, keep] / np.sqrt(w[keep]))
        dm = np.asarray(dm0) if dm0 is not None else self.init_guess_dm(
            h1e, xk)
        diis = DIIS(self.diis_space)
        e_last = 0.0
        conv = False
        for cycle in range(self.max_cycle):
            vhf = np.asarray(self.get_veff(dm))
            f = np.stack([h1e + vhf[0], h1e + vhf[1]])
            e_tot = self.energy_elec(dm, h1e, vhf) + self.energy_nuc()
            errs = np.stack([
                np.stack([s[k] @ dm[sp][k] @ f[sp][k]
                          - f[sp][k] @ dm[sp][k] @ s[k]
                          for k in range(self.nkpts)])
                for sp in range(2)])
            f = diis.update(f, errs)
            moe, moc = self.eig_all(f, xk)
            occ = self.get_occ(moe)
            dm = self.make_rdm1(moc, occ)
            gnorm = np.linalg.norm(errs) / self.nkpts
            de = abs(e_tot - e_last)
            if self.verbose >= 4:
                print(f'KUHF cycle {cycle + 1} E = {e_tot:.12f} '
                      f'dE = {de:.3e} |g| = {gnorm:.3e}')
            if cycle > 0 and de < self.conv_tol and gnorm < np.sqrt(
                    self.conv_tol):
                conv = True
                break
            e_last = e_tot
        self.converged = conv
        self.e_tot = float(e_tot)
        self.mo_energy = moe
        self.mo_coeff = moc
        self.mo_occ = occ
        return self.e_tot
