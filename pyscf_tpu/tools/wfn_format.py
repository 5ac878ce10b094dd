"""AIM/AIMPAC .wfn wavefunction file export.

Reference analog: pyscf/tools/wfn_format.py (write_mo). The format lists
unnormalized cartesian primitives x^a y^b z^c exp(-alpha r^2); every
normalization and contraction factor is folded into the printed MO
coefficients. Our AOs are spherical, so each shell's MO coefficient is
pushed through the cart2sph matrix onto its cartesian primitives
(validated by reconstructing MO values from the file in tests).
"""
import numpy as np

from ..ops.integrals.cart2sph import cart2sph
from ..ops.integrals.hermite import cart_components

# AIMPAC type codes per (l, cartesian exponent triple)
_TYPE = {
    (0, 0, 0): 1,
    (1, 0, 0): 2, (0, 1, 0): 3, (0, 0, 1): 4,
    (2, 0, 0): 5, (0, 2, 0): 6, (0, 0, 2): 7,
    (1, 1, 0): 8, (1, 0, 1): 9, (0, 1, 1): 10,
    (3, 0, 0): 11, (0, 3, 0): 12, (0, 0, 3): 13,
    (2, 1, 0): 14, (2, 0, 1): 15, (0, 2, 1): 16,
    (1, 2, 0): 17, (1, 0, 2): 18, (0, 1, 2): 19,
    (1, 1, 1): 20,
}


def primitive_expansion(mol, mo_coeff):
    """Expand spherical-AO MOs onto cartesian primitives.

    Returns (centers, types, exps, prim_mo) with prim_mo (nprim, nmo):
    MO_i(r) = sum_p prim_mo[p, i] * x^a y^b z^c exp(-exps[p] r^2)
    about atom centers[p].
    """
    mo = np.asarray(mo_coeff)
    centers, types, exps, rows = [], [], [], []
    for ish, sh in enumerate(mol._shells):
        l = sh.l
        off = int(mol.ao_loc[ish])
        S = np.asarray(cart2sph(l))              # (2l+1, ncart)
        c_sh = mo[off:off + 2 * l + 1]           # (2l+1, nmo)
        cart_c = S.T @ c_sh                      # (ncart, nmo)
        carts = cart_components(l)
        coeffs = np.asarray(sh.coeffs).ravel()
        shexps = np.asarray(sh.exps).ravel()
        keep = np.abs(coeffs) > 0
        for ic, tri in enumerate(carts):
            for k in np.where(keep)[0]:
                centers.append(sh.atom_id)
                types.append(_TYPE[tri])
                exps.append(shexps[k])
                rows.append(coeffs[k] * cart_c[ic])
    return (np.asarray(centers), np.asarray(types), np.asarray(exps),
            np.asarray(rows))


def write_mo(filename, mol, mo_coeff, mo_energy=None, mo_occ=None,
             e_tot=None, title='pyscf_tpu'):
    mo = np.asarray(mo_coeff)
    nmo = mo.shape[1]
    if mo_occ is None:
        mo_occ = np.zeros(nmo)
    if mo_energy is None:
        mo_energy = np.zeros(nmo)
    centers, types, exps, prim = primitive_expansion(mol, mo)
    nprim = len(exps)
    with open(filename, 'w') as f:
        f.write(f'{title}\n')
        f.write(f'GAUSSIAN {nmo:15d} MOL ORBITALS {nprim:6d} PRIMITIVES '
                f'{mol.natm:8d} NUCLEI\n')
        for ia in range(mol.natm):
            x, y, z = np.asarray(mol.coords[ia])
            f.write(f'  {mol.raw_symbols[ia]:<3s}{ia + 1:4d}    '
                    f'(CENTRE{ia + 1:3d}) {x:12.8f}{y:12.8f}{z:12.8f}  '
                    f'CHARGE = {float(mol.charges[ia]):4.1f}\n')
        for i0 in range(0, nprim, 20):
            f.write('CENTRE ASSIGNMENTS  '
                    + ''.join(f'{c + 1:3d}' for c in centers[i0:i0 + 20])
                    + '\n')
        for i0 in range(0, nprim, 20):
            f.write('TYPE ASSIGNMENTS    '
                    + ''.join(f'{t:3d}' for t in types[i0:i0 + 20]) + '\n')
        for i0 in range(0, nprim, 5):
            f.write('EXPONENTS '
                    + ''.join(f'{e:14.7E}' for e in exps[i0:i0 + 5]) + '\n')
        for i in range(nmo):
            f.write(f'MO{i + 1:5d}     MO 0.0        OCC NO = '
                    f'{float(mo_occ[i]):12.7f}  ORB. ENERGY ='
                    f'{float(mo_energy[i]):12.6f}\n')
            col = prim[:, i]
            for i0 in range(0, nprim, 5):
                f.write(''.join(f'{v:16.8E}' for v in col[i0:i0 + 5]) + '\n')
        f.write('END DATA\n')
        if e_tot is not None:
            f.write(f' THE  SCF ENERGY = {float(e_tot):20.12f}'
                    f' THE VIRIAL(-V/T)=   2.00000000\n')


def write_scf(filename, mf, title='pyscf_tpu'):
    """Write the occupied orbitals of a converged mean-field object."""
    occ = np.asarray(mf.mo_occ) > 0
    write_mo(filename, mf.mol, np.asarray(mf.mo_coeff)[:, occ],
             np.asarray(mf.mo_energy)[occ], np.asarray(mf.mo_occ)[occ],
             e_tot=float(mf.e_tot), title=title)
