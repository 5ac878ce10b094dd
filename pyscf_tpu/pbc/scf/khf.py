"""k-point restricted Hartree-Fock (analog of reference pbc/scf/khf.py
KSCF:462, get_jk:114, with Ewald exxdiv).

Host loop over SCF cycles; each cycle is dense per-k linear algebra
(complex Fock build, DIIS over the stacked k Focks, generalized eigh per
k via canonical orthogonalization). FFT J/K from pbc/df/fft.py KFFTDF.
"""
import numpy as np

from ...lib.diis import DIIS
from .hf import madelung


class KRHF:
    conv_tol = 1e-8
    conv_tol_grad = None
    max_cycle = 100
    diis_space = 8
    exxdiv = 'ewald'
    verbose = 0
    init_guess = 'hcore'

    def __init__(self, cell, kpts=None, exxdiv='ewald'):
        from ..df.fft import KFFTDF
        self.cell = cell
        self.mol = cell
        self.kpts = (np.zeros((1, 3)) if kpts is None
                     else np.asarray(kpts).reshape(-1, 3))
        self.exxdiv = exxdiv
        self.with_df = KFFTDF(cell, self.kpts)
        self.converged = False
        self.e_tot = None
        self.mo_energy = None
        self.mo_coeff = None
        self.mo_occ = None

    @property
    def nkpts(self):
        return len(self.kpts)

    def get_ovlp(self):
        return self.with_df.get_ovlp_kpts()

    def get_hcore(self):
        return self.with_df.get_hcore_kpts()

    def density_fit(self, auxbasis=None):
        """Switch the JK engine to k-point Gaussian DF (analytic-FT
        builder, pbc/df/gdf.py KGDF; reference pbc/df/df.py GDF)."""
        from ..df.gdf import KGDF
        self.with_df = KGDF(self.cell, self.kpts, auxbasis=auxbasis)
        return self

    def get_jk(self, dm_kpts, with_j=True, with_k=True):
        vj, vk = self.with_df.get_jk_kpts(dm_kpts, with_j, with_k)
        if with_k and self.exxdiv == 'ewald':
            s = self.get_ovlp()
            mad = madelung(self.cell, self.kpts)
            vk = vk + mad * np.einsum('kij,kjl,klm->kim', s,
                                      np.asarray(dm_kpts), s)
        return vj, vk

    def get_veff(self, dm_kpts):
        vj, vk = self.get_jk(dm_kpts)
        return vj - 0.5 * vk

    def get_occ(self, mo_energy_kpts):
        """Aufbau across the whole k mesh (2 e- per filled Bloch state)."""
        nk = self.nkpts
        nocc_tot = self.cell.nelectron * nk // 2
        all_e = np.concatenate([np.asarray(e) for e in mo_energy_kpts])
        fermi = np.sort(all_e)[nocc_tot - 1]
        occs = []
        for e in mo_energy_kpts:
            occs.append(np.where(np.asarray(e) <= fermi + 1e-12, 2.0, 0.0))
        # fix round-off: total must be exact
        return np.stack(occs)

    def get_bands(self, kpts_band, dm_kpts=None):
        """Band energies/orbitals at arbitrary k-points from the
        converged density (reference pbc/scf/khf.py get_bands:746).
        Returns (mo_energy, mo_coeff) lists over band k-points. The
        Ewald exxdiv shift is applied only at band points that coincide
        with SCF mesh points (reference df_jk.py:1494-1498)."""
        from ..df.fft import KFFTDF
        kpts_band = np.asarray(kpts_band).reshape(-1, 3)
        if dm_kpts is None:
            dm_kpts = self.make_rdm1()
        band_df = KFFTDF(self.cell, kpts_band)
        h1 = np.asarray(band_df.get_hcore_kpts())
        s_b = np.asarray(band_df.get_ovlp_kpts())
        vj, vk = self.with_df.get_jk_bands(dm_kpts, band_df)
        if self.exxdiv == 'ewald':
            s_scf = np.asarray(self.get_ovlp())
            mad = madelung(self.cell, self.kpts)
            for k, kpt in enumerate(self.kpts):
                for b in np.where(np.linalg.norm(
                        kpts_band - kpt, axis=1) < 1e-9)[0]:
                    vk[b] += mad * s_scf[k] @ np.asarray(dm_kpts)[k] \
                        @ s_scf[k]
        fock = h1 + vj - 0.5 * vk
        moes, mocs = [], []
        for b in range(len(kpts_band)):
            w, v = np.linalg.eigh(s_b[b])
            keep = w > 1e-10
            x = v[:, keep] / np.sqrt(w[keep])
            e, cp = np.linalg.eigh(x.conj().T @ fock[b] @ x)
            moes.append(e)
            mocs.append(x @ cp)
        return moes, mocs

    def make_rdm1(self, mo_coeff=None, mo_occ=None):
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = mo_occ if mo_occ is not None else self.mo_occ
        return np.stack([(ck * ok[None, :]) @ ck.conj().T
                         for ck, ok in zip(c, o)])

    def energy_elec(self, dm, h1e, vhf):
        e1 = np.einsum('kij,kji->', h1e, dm).real / self.nkpts
        e2 = 0.5 * np.einsum('kij,kji->', vhf, dm).real / self.nkpts
        return e1 + e2

    def energy_nuc(self):
        return self.cell.ewald()

    def eig_all(self, fock, xk):
        moes, mocs = [], []
        for k in range(self.nkpts):
            fp = xk[k].conj().T @ fock[k] @ xk[k]
            e, cp = np.linalg.eigh(fp)
            moes.append(e)
            mocs.append(xk[k] @ cp)
        return moes, mocs

    def init_guess_dm(self, h1e, xk):
        moe, moc = self.eig_all(h1e, xk)
        occ = self.get_occ(moe)
        return self.make_rdm1(moc, occ)

    def kernel(self, dm0=None):
        cell = self.cell
        s = np.asarray(self.get_ovlp())
        h1e = np.asarray(self.get_hcore())
        # canonical orthogonalization per k
        xk = []
        for k in range(self.nkpts):
            w, v = np.linalg.eigh(s[k])
            keep = w > 1e-10
            xk.append(v[:, keep] / np.sqrt(w[keep]))
        dm = np.asarray(dm0) if dm0 is not None else self.init_guess_dm(
            h1e, xk)
        conv_tol_grad = (np.sqrt(self.conv_tol)
                         if self.conv_tol_grad is None else
                         self.conv_tol_grad)
        diis = DIIS(self.diis_space)
        e_last = 0.0
        conv = False
        for cycle in range(self.max_cycle):
            vhf = np.asarray(self.get_veff(dm))
            f = h1e + vhf
            e_tot = self.energy_elec(dm, h1e, vhf) + self.energy_nuc()
            errs = np.stack([s[k] @ dm[k] @ f[k]
                             - f[k] @ dm[k] @ s[k]
                             for k in range(self.nkpts)])
            f = diis.update(f, errs)
            moe, moc = self.eig_all(f, xk)
            occ = self.get_occ(moe)
            dm = self.make_rdm1(moc, occ)
            gnorm = np.linalg.norm(errs) / self.nkpts
            de = abs(e_tot - e_last)
            if self.verbose >= 4:
                print(f'KRHF cycle {cycle}: E={e_tot:.12f} dE={de:.2e} '
                      f'|g|={gnorm:.2e}')
            if cycle > 0 and de < self.conv_tol and gnorm < conv_tol_grad:
                conv = True
                break
            e_last = e_tot
        # final consistent energy + canonical orbitals
        vhf = np.asarray(self.get_veff(dm))
        moe, moc = self.eig_all(h1e + vhf, xk)
        occ = self.get_occ(moe)
        dm = self.make_rdm1(moc, occ)
        vhf = np.asarray(self.get_veff(dm))
        self.e_tot = self.energy_elec(dm, h1e, vhf) + self.energy_nuc()
        self.converged = conv
        self.mo_energy = moe
        self.mo_coeff = moc
        self.mo_occ = occ
        return self.e_tot
