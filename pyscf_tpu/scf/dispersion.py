"""Empirical dispersion corrections.

Reference analog: pyscf/scf/dispersion.py, which delegates to the
external dftd3/dftd4 packages (unavailable here -- zero egress). The
DFT-D2 model (Grimme, J. Comput. Chem. 27, 1787 (2006)) is implemented
natively:

  E = -s6 sum_{i<j} C6_ij / R_ij^6 * [1 + exp(-d (R_ij/R_r - 1))]^-1,
  C6_ij = sqrt(C6_i C6_j),  R_r = R_vdw,i + R_vdw,j,  d = 20.

D3/D4 require the external parameterizations and are gated with an
informative error, matching the reference's optional-dependency shape.
"""
import numpy as np

from ..lib.parameters import BOHR

# Grimme 2006 Table 1: C6 (J nm^6 / mol) and R_vdw (Angstrom)
_C6_JNM6 = {
    'H': 0.14, 'He': 0.08, 'Li': 1.61, 'Be': 1.61, 'B': 3.13, 'C': 1.75,
    'N': 1.23, 'O': 0.70, 'F': 0.75, 'Ne': 0.63, 'Na': 5.71, 'Mg': 5.71,
    'Al': 10.79, 'Si': 9.23, 'P': 7.84, 'S': 5.57, 'Cl': 5.07, 'Ar': 4.61,
    'K': 10.80, 'Ca': 10.80, 'Sc': 10.80, 'Ti': 10.80, 'V': 10.80,
    'Cr': 10.80, 'Mn': 10.80, 'Fe': 10.80, 'Co': 10.80, 'Ni': 10.80,
    'Cu': 10.80, 'Zn': 10.80, 'Ga': 16.99, 'Ge': 17.10, 'As': 16.37,
    'Se': 12.64, 'Br': 12.47, 'Kr': 12.01, 'Rb': 24.67, 'Sr': 24.67,
    'Y': 24.67, 'Zr': 24.67, 'Nb': 24.67, 'Mo': 24.67, 'Tc': 24.67,
    'Ru': 24.67, 'Rh': 24.67, 'Pd': 24.67, 'Ag': 24.67, 'Cd': 24.67,
    'In': 37.32, 'Sn': 38.71, 'Sb': 38.44, 'Te': 31.74, 'I': 31.50,
    'Xe': 29.99,
}
_RVDW_ANG = {
    'H': 1.001, 'He': 1.012, 'Li': 0.825, 'Be': 1.408, 'B': 1.485,
    'C': 1.452, 'N': 1.397, 'O': 1.342, 'F': 1.287, 'Ne': 1.243,
    'Na': 1.144, 'Mg': 1.364, 'Al': 1.639, 'Si': 1.716, 'P': 1.705,
    'S': 1.683, 'Cl': 1.639, 'Ar': 1.595, 'K': 1.485, 'Ca': 1.474,
    'Sc': 1.562, 'Ti': 1.562, 'V': 1.562, 'Cr': 1.562, 'Mn': 1.562,
    'Fe': 1.562, 'Co': 1.562, 'Ni': 1.562, 'Cu': 1.562, 'Zn': 1.562,
    'Ga': 1.650, 'Ge': 1.727, 'As': 1.760, 'Se': 1.771, 'Br': 1.749,
    'Kr': 1.727, 'Rb': 1.628, 'Sr': 1.606, 'Y': 1.639, 'Zr': 1.639,
    'Nb': 1.639, 'Mo': 1.639, 'Tc': 1.639, 'Ru': 1.639, 'Rh': 1.639,
    'Pd': 1.639, 'Ag': 1.639, 'Cd': 1.639, 'In': 1.672, 'Sn': 1.804,
    'Sb': 1.881, 'Te': 1.892, 'I': 1.892, 'Xe': 1.881,
}
# s6 scaling per functional (Grimme 2006 Table 2)
S6 = {'pbe': 0.75, 'blyp': 1.2, 'b3lyp': 1.05, 'b3lypg': 1.05,
      'bp86': 1.05, 'tpss': 1.0, 'b97-d': 1.25, 'hf': 1.0}

_C6_AU = 17.34527758          # (J nm^6/mol) -> Hartree bohr^6
_D = 20.0


def _params(mol):
    c6 = np.array([_C6_JNM6[s] * _C6_AU for s in mol.raw_symbols])
    rv = np.array([_RVDW_ANG[s] / BOHR for s in mol.raw_symbols])
    return c6, rv


def d2_energy(mol, functional='pbe', s6=None, with_grad=False):
    """DFT-D2 dispersion energy (and gradient) in atomic units."""
    if s6 is None:
        key = functional.lower().split(',')[0].strip()
        s6 = S6.get(key, 1.0)
    c6, rv = _params(mol)
    r = np.asarray(mol.coords)
    natm = mol.natm
    e = 0.0
    grad = np.zeros((natm, 3))
    for i in range(natm):
        for j in range(i + 1, natm):
            dvec = r[i] - r[j]
            rij = np.linalg.norm(dvec)
            c6ij = np.sqrt(c6[i] * c6[j])
            rr = rv[i] + rv[j]
            x = np.exp(-_D * (rij / rr - 1.0))
            fd = 1.0 / (1.0 + x)
            e -= s6 * c6ij / rij ** 6 * fd
            if with_grad:
                dfd = fd * fd * x * _D / rr
                de_dr = s6 * c6ij * (6.0 / rij ** 7 * fd
                                     - dfd / rij ** 6)
                grad[i] += de_dr * dvec / rij
                grad[j] -= de_dr * dvec / rij
    if with_grad:
        return e, grad
    return e


def dftd(mf, version='d2', functional=None):
    """Attach a dispersion correction to a mean-field object (the
    reference's energy_nuc-level patching shape)."""
    version = version.lower()
    if version in ('d3', 'd3bj', 'd4'):
        raise NotImplementedError(
            f'{version} requires the external dftd3/dftd4 parameterization '
            '(reference pyscf/scf/dispersion.py optional dependency); '
            "use version='d2'")
    if version != 'd2':
        raise ValueError(version)
    xc = functional or getattr(mf, 'xc', 'hf')
    e_disp = d2_energy(mf.mol, xc)
    enuc_orig = mf.energy_nuc

    def energy_nuc():
        return enuc_orig() + e_disp

    mf.energy_nuc = energy_nuc
    mf.e_disp = e_disp
    return mf
