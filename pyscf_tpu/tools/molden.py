"""Molden orbital-file export (analog of reference pyscf/tools/molden.py)."""
import numpy as np

from ..lib.parameters import BOHR


def dump_scf(mf, filename, ignore_h=False):
    from_mo(mf.mol, filename, np.asarray(mf.mo_coeff),
            ene=np.asarray(mf.mo_energy), occ=np.asarray(mf.mo_occ))


def from_mo(mol, filename, mo_coeff, ene=None, occ=None, spin='Alpha'):
    nmo = mo_coeff.shape[1]
    if ene is None:
        ene = np.zeros(nmo)
    if occ is None:
        occ = np.zeros(nmo)
    with open(filename, 'w') as f:
        f.write('[Molden Format]\n[Atoms] (AU)\n')
        for ia in range(mol.natm):
            c = mol.coords[ia]
            f.write(f'{mol.elements_[ia]:3s} {ia + 1:4d} '
                    f'{int(mol.charges[ia]):4d} '
                    f'{c[0]:18.10f} {c[1]:18.10f} {c[2]:18.10f}\n')
        f.write('[GTO]\n')
        lsym = 'spdfgh'
        for ia in range(mol.natm):
            f.write(f'{ia + 1} 0\n')
            for sh in mol._shells:
                if sh.atom_id != ia:
                    continue
                f.write(f' {lsym[sh.l]}  {len(sh.exps):3d} 1.00\n')
                for e, c in zip(sh.exps, sh.coeffs):
                    f.write(f'    {e:18.10e} {c:18.10e}\n')
            f.write('\n')
        f.write('[5D]\n[7F]\n[9G]\n[MO]\n')
        for i in range(nmo):
            f.write(f' Sym= A\n Ene= {float(ene[i]):.10f}\n'
                    f' Spin= {spin}\n Occup= {float(occ[i]):.8f}\n')
            for mu in range(mo_coeff.shape[0]):
                f.write(f' {mu + 1:4d} {mo_coeff[mu, i]:18.10f}\n')
