"""Nuclear Hessians and thermochemistry (analog of reference pyscf/hessian).

Round-1 path: semi-numerical Hessian (central differences of the analytic
gradient) + harmonic frequency analysis + ideal-gas thermochemistry
(reference hessian/thermo.py:40 harmonic_analysis, :136 thermo).
"""
import numpy as np

from ..data.elements import MASSES
from ..lib.parameters import AMU2AU, HARTREE2WAVENUMBER


def hessian_fd(grad_factory, mol, step=1e-3):
    """(natm,3,natm,3) Hessian from central differences of gradients.

    grad_factory(mol) -> (natm, 3) gradient array (runs SCF internally).
    """
    natm = mol.natm
    h = np.zeros((natm, 3, natm, 3))
    coords0 = np.asarray(mol.coords).copy()
    for A in range(natm):
        for x in range(3):
            gp, gm = None, None
            for s, sign in ((step, 1), (-step, -1)):
                c = coords0.copy()
                c[A, x] += s
                m2 = mol.copy()
                m2.set_geom_(c)
                g = np.asarray(grad_factory(m2))
                if sign > 0:
                    gp = g
                else:
                    gm = g
            h[A, x] = (gp - gm) / (2 * step)
    # symmetrize
    h = 0.5 * (h + h.transpose(2, 3, 0, 1))
    return h


def harmonic_analysis(mol, hess, masses=None):
    """Frequencies (cm^-1) and normal modes from a Cartesian Hessian.

    masses: optional per-atom masses in electron-mass units (default:
    standard atomic weights, the reference thermo convention)."""
    natm = mol.natm
    if masses is None:
        masses = np.array([MASSES[z] for z in mol.charges]) * AMU2AU
    invsqrt = 1.0 / np.sqrt(np.repeat(masses, 3))
    H = hess.reshape(natm * 3, natm * 3)
    Hmw = H * invsqrt[:, None] * invsqrt[None, :]
    w2, modes = np.linalg.eigh(Hmw)
    freq_au = np.sign(w2) * np.sqrt(np.abs(w2))
    freq_cm = freq_au * HARTREE2WAVENUMBER
    return {'freq_wavenumber': freq_cm, 'norm_mode': modes, 'freq_au': freq_au}


def thermo(mol, freq_au, e_tot, temperature=298.15, pressure=101325.0):
    """Ideal-gas RRHO thermochemistry (reference hessian/thermo.py:136)."""
    from ..lib.parameters import BOLTZMANN_AU
    kT = BOLTZMANN_AU * temperature
    # vibrational: drop translations/rotations (6 smallest |freq|)
    natm = mol.natm
    nfree = 3 * natm - (5 if natm == 2 else 6 if natm > 2 else 0)
    freqs = np.sort(np.abs(freq_au))[-nfree:] if nfree > 0 else np.array([])
    freqs = freqs[freqs > 1e-8]
    zpe = 0.5 * freqs.sum()
    e_vib = zpe + np.sum(freqs / (np.exp(freqs / kT) - 1.0))
    s_vib = np.sum(freqs / kT / (np.exp(freqs / kT) - 1.0)
                   - np.log(1.0 - np.exp(-freqs / kT)))
    results = {
        'ZPE': zpe,
        'E_vib': e_vib,
        'S_vib(k)': s_vib,
        'E_tot+ZPE': float(e_tot) + zpe,
    }
    return results


def Hessian(mf, **kwargs):
    """Nuclear Hessian of a converged mean field (reference mf.Hessian()).

    Dispatches to the analytic CPHF Hessian (hessian/rhf.py for
    restricted, hessian/uhf.py for unrestricted) for density-fitted
    mean fields with global-hybrid or pure functionals; otherwise falls
    back to the semi-analytic FD-of-analytic-gradient path."""
    try:
        if getattr(mf, 'with_solvent', None) is not None:
            # implicit solvent: FD over the solvated analytic gradient
            raise NotImplementedError('solvent Hessian via FD path')
        if getattr(mf, '_fused_kind', None) == 'unrestricted':
            from .uhf import Hessian as AnalyticHessian
        else:
            from .rhf import Hessian as AnalyticHessian
        return AnalyticHessian(mf, **kwargs)
    except NotImplementedError:
        return HessianFD(mf, **kwargs)


class HessianFD:
    """Semi-analytic nuclear Hessian: central differences of the ANALYTIC
    (autodiff) gradient — one order better than FD-of-energy and the
    cross-check oracle for the CPHF analytic Hessian (hessian/rhf.py,
    reference hessian/rhf.py)."""

    def __init__(self, mf, step=1e-3):
        self._scf = mf
        self.mol = mf.mol
        self.step = step

    def kernel(self):
        mf0 = self._scf
        isks = hasattr(mf0, 'xc')
        isdf = getattr(mf0, 'with_df', None) is not None

        isuhf = getattr(mf0, '_fused_kind', None) == 'unrestricted'

        def grad_factory(m2):
            if isks and isuhf:
                from ..dft import UKS
                f = UKS(m2, xc=mf0.xc)
            elif isks:
                from ..dft import RKS
                f = RKS(m2, xc=mf0.xc)
            elif isuhf:
                f = m2.UHF()
            else:
                f = m2.RHF()
            if isdf:
                f = f.density_fit(mf0.with_df.auxbasis)
            sol = getattr(mf0, 'with_solvent', None)
            if sol is not None:
                # rebuild the same solvent model at the displaced geometry
                # (reference hessian/thermo FD over solvated gradients; no
                # dedicated solvent Hessian code needed)
                from ..solvent.ddcosmo import DDCOSMO, ddcosmo_for_scf
                from ..solvent.ddpcm import DDPCM, ddpcm_for_scf
                from ..solvent.pcm import PCM, pcm_for_scf
                from ..solvent.smd import SMD, smd_for_scf
                # most-derived-first: DDPCM subclasses DDCOSMO
                if isinstance(sol, DDPCM):
                    f = ddpcm_for_scf(f, eps=sol.eps, lmax=sol.lmax)
                elif isinstance(sol, DDCOSMO):
                    f = ddcosmo_for_scf(f, eps=sol.eps, lmax=sol.lmax)
                elif isinstance(sol, SMD):
                    f = smd_for_scf(f, solvent=sol.solvent)
                elif isinstance(sol, PCM):
                    f = pcm_for_scf(f, eps=sol.eps, method=sol.method)
                else:
                    raise NotImplementedError(
                        'FD Hessian with solvent model %s' % type(sol))
            f.conv_tol = min(mf0.conv_tol, 1e-11)
            f.kernel()
            return f.Gradients().kernel()

        self.de = hessian_fd(grad_factory, self.mol, self.step)
        return self.de

    run = kernel
