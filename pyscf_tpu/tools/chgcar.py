"""VASP CHGCAR-format density export for periodic cells.

Reference analog: pyscf/tools/chgcar.py. The density is evaluated on the
cell's uniform FFT mesh and written as rho*V_cell in the VASP convention
(x index fastest, 5 values per line).
"""
import numpy as np

from ..lib.parameters import BOHR


def density(cell, dm, outfile, mesh=None):
    """Write the AO density matrix's real-space density as CHGCAR."""
    from ..pbc.df.fft import eval_ao_periodic
    mesh = list(mesh or cell.mesh)
    coords = cell.get_uniform_grids(mesh)
    ao = np.asarray(eval_ao_periodic(cell, np.asarray(coords)))
    dm = np.asarray(dm)
    rho = np.einsum('gi,ij,gj->g', ao, dm, ao).real
    _write(cell, rho.reshape(mesh), outfile)
    return rho


def orbital(cell, mo, outfile, mesh=None):
    """Write |psi|^2-like data for one MO coefficient vector."""
    from ..pbc.df.fft import eval_ao_periodic
    mesh = list(mesh or cell.mesh)
    coords = cell.get_uniform_grids(mesh)
    ao = np.asarray(eval_ao_periodic(cell, np.asarray(coords)))
    psi = ao @ np.asarray(mo)
    _write(cell, np.abs(psi).reshape(mesh) ** 2, outfile)


def _write(cell, rho_grid, outfile):
    mesh = rho_grid.shape
    a = np.asarray(cell.lattice_vectors_) * BOHR    # Angstrom
    symbols = list(cell.raw_symbols)
    uniq = []
    counts = []
    for s in symbols:
        if uniq and uniq[-1] == s:
            counts[-1] += 1
        else:
            uniq.append(s)
            counts.append(1)
    frac = np.asarray(cell.coords) @ np.linalg.inv(
        np.asarray(cell.lattice_vectors_))
    with open(outfile, 'w') as f:
        f.write('CHGCAR written by pyscf_tpu\n')
        f.write('1.0\n')
        for v in a:
            f.write(f'  {v[0]:12.6f} {v[1]:12.6f} {v[2]:12.6f}\n')
        f.write(' '.join(f'{s:>4s}' for s in uniq) + '\n')
        f.write(' '.join(f'{c:4d}' for c in counts) + '\n')
        f.write('Direct\n')
        for fr in frac:
            f.write(f'  {fr[0]:10.6f} {fr[1]:10.6f} {fr[2]:10.6f}\n')
        f.write('\n')
        f.write(f' {mesh[0]:4d} {mesh[1]:4d} {mesh[2]:4d}\n')
        # VASP stores rho * V_cell with x fastest (Fortran order)
        vals = (rho_grid * cell.vol).transpose(2, 1, 0).ravel()
        for i0 in range(0, len(vals), 5):
            f.write(' '.join(f'{v: .11E}' for v in vals[i0:i0 + 5]) + '\n')
