"""Electron-phonon coupling matrices.

Reference analog: pyscf/eph (rhf.py analytic, eph_fd.py finite
difference). Finite-difference formulation with the reference's
conventions:

- per Cartesian coordinate, vfull_Ax = d<u|V|v>/dR_Ax by central FD of
  the potential-only matrix V = hcore + veff - T (each evaluated in its
  own displaced AO basis),
- the basis-movement (Pulay) part for atom A's AOs is removed with the
  analytic derivative integrals (ipnuc + ip1-contracted JK rows), leaving
  the operator derivative <u|dV/dR|v>,
- g_J[p,q] = sum_Ax mode[Ax,J]/sqrt(2 m_A w_J) vfull_Ax[p,q], modes
  sorted by descending frequency (reference eph/rhf.py solve_hmat:64).

Masses follow the reference's eph convention: main-isotope integer mass
numbers x the proton/electron ratio (solve_hmat, eph/rhf.py:55).

Validated against the reference H2O/STO-3G goldens
(eph/test/test_rhf.py:48-50): frequency fingerprint to 1e-9 and the
|g| coupling fingerprint to 7e-7 (in pyscf AO ordering; this codebase
stores p shells as m=-1,0,+1 = y,z,x). This codebase's ip integrals are
CENTER derivatives (int1e_deriv.py) -- the negative of libcint's
electron-coordinate nabla -- so the Pulay rows are *subtracted* here
where the reference subtracts its (negated) ve; both remove the same
basis-movement term (FD-oracle-pinned: d<u|v>/dR_A = +ipovlp rows).
"""
import numpy as np

from ..data.elements import ISOTOPE_MAIN
from ..hessian import harmonic_analysis, hessian_fd
from ..lib.parameters import MP_ME


def _potential_mat(mf_conv, mol):
    """<u|hcore + veff - T|v> of a converged mean field (AO basis)."""
    dm = np.asarray(mf_conv.make_rdm1())
    h = np.asarray(mf_conv.get_hcore())
    v = np.asarray(mf_conv.get_veff(mol, dm))
    t = np.asarray(mol.intor('int1e_kin'))
    return h + v - t


def _pulay_rows(mf):
    """ve[x] = <d_u/dR u|V_nuc + veff|v> rows (3, nao, nao) for the
    equilibrium density -- the basis-movement part to subtract."""
    from ..ops.integrals import int1e_deriv, int2e as int2e_mod
    mol = mf.mol
    dm = np.asarray(mf.make_rdm1())
    ipnuc = np.asarray(int1e_deriv.int1e_ipnuc(mol))
    ip1 = np.asarray(int2e_mod.int2e_ip1(mol))
    vj = np.einsum('xijkl,lk->xij', ip1, dm)
    vk = np.einsum('xijkl,jk->xil', ip1, dm)
    return ipnuc + vj - 0.5 * vk


class EPH:
    """mf must be a converged mean-field; mf_factory(mol) must build and
    converge the same method at a displaced geometry."""

    cutoff_frequency = 80.0       # cm^-1, drop trans/rot/soft modes

    def __init__(self, mf, mf_factory=None):
        self._scf = mf
        self.mol = mf.mol
        if mf_factory is None:
            def mf_factory(m):
                mf2 = type(mf)(m)
                mf2.conv_tol = getattr(mf, 'conv_tol', 1e-11)
                mf2.kernel()
                return mf2
        self.mf_factory = mf_factory

    def _masses(self):
        """Main-isotope integer mass numbers x proton/electron ratio (the
        reference's atom_mass_list() * MP_ME, eph/rhf.py solve_hmat)."""
        return np.array([ISOTOPE_MAIN[z] for z in self.mol.charges]) * MP_ME

    def get_modes(self, hess=None):
        mol = self.mol
        if hess is None:
            def gfac(m):
                mf2 = self.mf_factory(m)
                return np.asarray(mf2.nuc_grad_method().kernel())
            hess = hessian_fd(gfac, mol)
        res = harmonic_analysis(mol, hess, masses=self._masses())
        freq = res['freq_au']
        modes = res['norm_mode']              # mass-weighted eigenvectors
        keep = np.abs(res['freq_wavenumber']) > self.cutoff_frequency
        freq, modes = freq[keep], modes[:, keep]
        order = np.argsort(freq)[::-1]        # reference sorts descending
        return freq[order], modes[:, order]

    def get_vmat(self, step=1e-4):
        """d<u|V|v>/dR per Cartesian coordinate, (3 natm, nao, nao)."""
        mol = self.mol
        coords0 = np.asarray(mol.coords).copy()
        ve = _pulay_rows(self._scf)
        ao2atom = np.zeros(mol.nao, dtype=int)
        for ish, sh in enumerate(mol._shells):
            ao2atom[mol.ao_loc[ish]:mol.ao_loc[ish + 1]] = sh.atom_id
        out = []
        for A in range(mol.natm):
            mask = ao2atom == A
            for x in range(3):
                vs = []
                for sgn in (1.0, -1.0):
                    c = coords0.copy()
                    c[A, x] += sgn * step
                    m2 = mol.copy()
                    m2.set_geom_(c)
                    mf2 = self.mf_factory(m2)
                    vs.append(_potential_mat(mf2, m2))
                vfull = (vs[0] - vs[1]) / (2.0 * step)
                # remove the basis-movement (Pulay) rows/cols: this
                # codebase's ip integrals are CENTER derivatives
                # (<du/dA|V|v>, int1e_deriv.py docstring), verified by
                # FD oracle d<u|v>/dR_A = +ipovlp rows, so the part to
                # subtract is + the raw ip rows (the reference subtracts
                # its ve = -(electron-nabla rows) = the same quantity,
                # eph/eph_fd.py:75-90)
                vfull[mask] -= ve[x][mask]
                vfull[:, mask] -= ve[x][mask].T
                out.append(vfull)
        return np.asarray(out)

    def kernel(self, step=1e-4, hess=None, mo_rep=False):
        """Returns (eph_mat (nmodes, nao|nmo, nao|nmo), freq_au)."""
        mol = self.mol
        mf = self._scf
        freq, modes = self.get_modes(hess)
        masses = self._masses()
        vmat = self.get_vmat(step)
        # freq-mass-weighted polarization: mode[Ax,J]/sqrt(2 m_A |w_J|)
        invw = 1.0 / np.sqrt(np.repeat(masses, 3))
        eph = np.einsum('xJ,x,xpq->Jpq',
                        modes, invw, vmat) / np.sqrt(
            2.0 * np.abs(freq))[:, None, None]
        if mo_rep:
            mo = np.asarray(mf.mo_coeff)
            eph = np.einsum('Juv,up,vq->Jpq', eph, mo.conj(), mo)
        return eph, freq
