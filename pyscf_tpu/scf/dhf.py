"""4-component Dirac-Hartree-Fock (Dirac-Coulomb Hamiltonian).

Reference analog: pyscf/scf/dhf.py (DHF/UDHF, get_jk_coulomb) on libcint
spinor integrals.  Here the restricted-kinetic-balance (RKB) 4-spinor
basis is built analytically on top of the scalar McMurchie-Davidson
engine:

  large basis:  chi_mu (x) |sigma>,          sigma in {alpha, beta}
  small basis:  f_mu,sigma = sigma.p (chi_mu (x) |sigma>) / (2c)

One-electron matrices (same blocks as the spinor X2C builder,
x2c/__init__.py x2c1e_spinor_hcore — X2C decouples them, DHF iterates on
the full 4-component problem):

  H = [[ V,  T        ],        M = [[ S,  0       ],
       [ T,  W/4c^2-T ]]             [ 0,  T/2c^2  ]]

with W = pVp.I2 + i sigma.(pV x p).  Two-electron Coulomb blocks from
the spin-separated small-component distributions

  f_mu^+ f_nu = [grad(mu).grad(nu) I2 + i sigma.(grad(mu) x grad(nu))]/4c^2

via the scalar derivative ERIs of ops/integrals/int2e_ss.py; no Gaunt /
Breit terms (the reference's default Coulomb level 'LLLL/SSLL/SSSS' with
with_gaunt=False).  Energies are for the electron-like (positive-energy)
solutions; the negative-energy sea is frozen out by aufbau over the
positive branch (no-pair approximation, as the reference).
"""
import numpy as np
import scipy.linalg

from ..lib.parameters import LIGHT_SPEED
from ..lib import logger

_EPS3 = np.zeros((3, 3, 3))
_EPS3[0, 1, 2] = _EPS3[1, 2, 0] = _EPS3[2, 0, 1] = 1.0
_EPS3[0, 2, 1] = _EPS3[2, 1, 0] = _EPS3[1, 0, 2] = -1.0
_SIGMA = np.array([[[0, 1], [1, 0]],
                   [[0, -1j], [1j, 0]],
                   [[1, 0], [0, -1]]], dtype=complex)
# (sigma.a)(sigma.b) = a.b I + i sigma.(a x b):  M[d,e,s,t]
_MSPIN = (np.einsum('de,st->dest', np.eye(3), np.eye(2)).astype(complex)
          + 1j * np.einsum('fde,fst->dest', _EPS3, _SIGMA))


def dirac_hcore(mol, c=LIGHT_SPEED):
    """(h, m): 4-component one-electron Hamiltonian and metric, (n4, n4)
    complex, spinor layout [L-alpha, L-beta, S-alpha, S-beta] blocks."""
    from ..ops.integrals.int1e_deriv import int1e_pnucp, int1e_pnucxp
    t = np.asarray(mol.intor('int1e_kin'))
    v = np.asarray(mol.intor('int1e_nuc'))
    s = np.asarray(mol.intor('int1e_ovlp'))
    pvp = np.asarray(int1e_pnucp(mol))
    wso = np.asarray(int1e_pnucxp(mol))       # (3, nao, nao) = (pV x p)_f
    nao = s.shape[0]
    n2 = 2 * nao

    def spin2(mat):
        out = np.zeros((n2, n2), dtype=complex)
        out[:nao, :nao] = mat
        out[nao:, nao:] = mat
        return out

    w2 = spin2(pvp)
    w2[:nao, :nao] += 1j * wso[2]
    w2[nao:, nao:] -= 1j * wso[2]
    w2[:nao, nao:] += 1j * wso[0] + wso[1]
    w2[nao:, :nao] += 1j * wso[0] - wso[1]

    v2, t2, s2 = spin2(v), spin2(t), spin2(s)
    n4 = 2 * n2
    h = np.zeros((n4, n4), dtype=complex)
    m = np.zeros((n4, n4), dtype=complex)
    h[:n2, :n2] = v2
    h[:n2, n2:] = t2
    h[n2:, :n2] = t2
    h[n2:, n2:] = w2 * (0.25 / c ** 2) - t2
    m[:n2, :n2] = s2
    m[n2:, n2:] = t2 * (0.5 / c ** 2)
    return h, m


def dirac_eri4(mol, c=LIGHT_SPEED, with_ssss=True):
    """Full 4-component spinor ERI tensor (n4,)*4 in chemists' notation
    (ab|cd); mixed large-small charge distributions vanish in the RKB
    basis, so only the LLLL / SSLL / LLSS / SSSS blocks are nonzero."""
    from ..ops.integrals.int2e import int2e
    from ..ops.integrals.int2e_ss import int2e_ssll, int2e_ssss
    nao = mol.nao
    n2 = 2 * nao
    n4 = 2 * n2
    eye2 = np.eye(2)
    eri4 = np.zeros((n4, n4, n4, n4), dtype=complex)

    ll = np.asarray(int2e(mol))
    blk = np.einsum('mnkl,st,uv->smtnukvl', ll, eye2, eye2)
    eri4[:n2, :n2, :n2, :n2] = blk.reshape(n2, n2, n2, n2)

    g1 = np.asarray(int2e_ssll(mol))          # (3,3,nao^4)
    ssbra = np.einsum('demnkl,dest->smtnkl', g1, _MSPIN) / (4.0 * c * c)
    ssbra = ssbra.reshape(n2, n2, nao, nao)
    blk = np.einsum('abkl,uv->abukvl', ssbra, eye2).reshape(n2, n2, n2, n2)
    eri4[n2:, n2:, :n2, :n2] = blk
    eri4[:n2, :n2, n2:, n2:] = blk.transpose(2, 3, 0, 1)

    if with_ssss:
        g2 = np.asarray(int2e_ssss(mol))      # (3,3,3,3,nao^4)
        blk = np.einsum('defgmnkl,dest,fguv->smtnukvl', g2, _MSPIN, _MSPIN,
                        optimize=True) / (16.0 * c ** 4)
        eri4[n2:, n2:, n2:, n2:] = blk.reshape(n2, n2, n2, n2)
    return eri4


class DHF:
    """Dirac-Coulomb HF (Kramers-unrestricted, like the reference's UHF-
    equivalent default DHF).  Small dense spinor tensors on host; the
    method exists for heavy-element parity/validation, not throughput."""

    conv_tol = 1e-9
    max_cycle = 80
    diis_space = 8

    def __init__(self, mol, with_ssss=True, c=LIGHT_SPEED):
        self.mol = mol
        self.with_ssss = with_ssss
        self.c = c
        self.converged = False
        self.e_tot = None
        self.mo_energy = None
        self.mo_coeff = None
        self.mo_occ = None
        self.verbose = getattr(mol, 'verbose', 0)

    @property
    def n2c(self):
        return 2 * self.mol.nao

    def get_jk(self, eri4, dm):
        j = np.einsum('abcd,dc->ab', eri4, dm, optimize=True)
        k = np.einsum('adcb,dc->ab', eri4, dm, optimize=True)
        return j, k

    def make_rdm1(self, mo_coeff=None, mo_occ=None):
        co = (self.mo_coeff if mo_coeff is None else mo_coeff)
        occ = (self.mo_occ if mo_occ is None else mo_occ)
        co = co[:, occ > 0]
        return co @ co.conj().T

    def _occupy(self, e):
        """Aufbau over the positive-energy branch (no-pair)."""
        n2 = self.n2c
        occ = np.zeros(e.shape[0])
        occ[n2:n2 + self.mol.nelectron] = 1.0
        return occ

    def kernel(self, dm0=None):
        mol = self.mol
        log = logger.Logger(self)
        h, m = dirac_hcore(mol, self.c)
        eri4 = dirac_eri4(mol, self.c, self.with_ssss)
        e_nuc = mol.energy_nuc()

        if dm0 is None:
            e, cmo = scipy.linalg.eigh(h, m)
            dm = self.make_rdm1(cmo, self._occupy(e))
        else:
            dm = dm0
        diis_f, diis_e = [], []
        e_last = 0.0
        for cycle in range(self.max_cycle):
            vj, vk = self.get_jk(eri4, dm)
            f = h + vj - vk
            err = f @ dm @ m - m @ dm @ f
            diis_f.append(f)
            diis_e.append(err.ravel())
            if len(diis_f) > self.diis_space:
                diis_f.pop(0)
                diis_e.pop(0)
            nd = len(diis_f)
            if nd > 1:
                B = np.empty((nd + 1, nd + 1), dtype=complex)
                B[:nd, :nd] = np.array(
                    [[np.vdot(a, b) for b in diis_e] for a in diis_e])
                B[nd, :] = -1.0
                B[:, nd] = -1.0
                B[nd, nd] = 0.0
                rhs = np.zeros(nd + 1, dtype=complex)
                rhs[nd] = -1.0
                try:
                    cvec = np.linalg.solve(B, rhs)[:nd]
                    f = sum(ci * fi for ci, fi in zip(cvec, diis_f))
                    f = 0.5 * (f + f.conj().T)
                except np.linalg.LinAlgError:
                    pass
            e, cmo = scipy.linalg.eigh(f, m)
            occ = self._occupy(e)
            dm = self.make_rdm1(cmo, occ)
            e_tot = (0.5 * np.einsum('ij,ji->', dm, h + f).real
                     + e_nuc)
            dnorm = np.linalg.norm(err)
            log.info('DHF cycle %d  E=%.12f  |FDS-SDF|=%.3e',
                     cycle + 1, e_tot, dnorm)
            if abs(e_tot - e_last) < self.conv_tol and dnorm < 1e-6:
                self.converged = True
                break
            e_last = e_tot
        self.mo_energy, self.mo_coeff, self.mo_occ = e, cmo, occ
        self.e_tot = float(e_tot)
        return self.e_tot


DHF4c = DHF
