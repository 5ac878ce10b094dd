"""Unfold k-point MOs onto the Born-von-Karman supercell at Gamma
(analog of reference pyscf/pbc/tools/k2gamma.py)."""
import numpy as np


def k2gamma_mo(cell, kpts, mo_coeff_kpts, ncopy):
    """Supercell Gamma MO coefficients from k-point MOs.

    The supercell AO basis is ordered image-major (pbc/tools super_cell);
    C^sc[(L, mu), (k, n)] = e^{i k T_L} C^k[mu, n] / sqrt(Nk). For a
    Gamma-inclusive Monkhorst-Pack mesh the resulting orbitals can be made
    real by a phase rotation (done per column)."""
    a = np.asarray(cell.lattice_vectors_)
    Ts = []
    for i in range(ncopy[0]):
        for j in range(ncopy[1]):
            for k in range(ncopy[2]):
                Ts.append(i * a[0] + j * a[1] + k * a[2])
    Ts = np.asarray(Ts)
    nk = len(kpts)
    assert nk == len(Ts)
    nao = cell.nao
    nmo = mo_coeff_kpts[0].shape[1]
    csc = np.zeros((nk * nao, nk * nmo), dtype=complex)
    for ik, kpt in enumerate(kpts):
        phase = np.exp(1j * (Ts @ kpt)) / np.sqrt(nk)
        for il in range(nk):
            csc[il * nao:(il + 1) * nao, ik * nmo:(ik + 1) * nmo] = \
                phase[il] * np.asarray(mo_coeff_kpts[ik])
    # make columns (approximately) real by phase rotation
    for c in range(csc.shape[1]):
        col = csc[:, c]
        imax = np.argmax(np.abs(col))
        ph = col[imax] / abs(col[imax])
        csc[:, c] = col / ph
    return csc
