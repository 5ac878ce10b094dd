"""FCIDUMP read/write (analog of reference pyscf/tools/fcidump.py)."""
import numpy as np


def from_integrals(filename, h1e, h2e, norb, nelec, nuc=0.0, ms=0,
                   orbsym=None, tol=1e-12):
    """Write an FCIDUMP file from MO integrals (chemists' notation)."""
    h1e = np.asarray(h1e)
    h2e = np.asarray(h2e).reshape(norb, norb, norb, norb)
    if isinstance(nelec, (tuple, list)):
        ms = nelec[0] - nelec[1]
        nelec = sum(nelec)
    with open(filename, 'w') as f:
        f.write(f'&FCI NORB={norb},NELEC={nelec},MS2={ms},\n')
        sym = orbsym if orbsym is not None else [1] * norb
        f.write('  ORBSYM=' + ','.join(map(str, sym)) + ',\n')
        f.write('  ISYM=1,\n&END\n')
        for i in range(norb):
            for j in range(i + 1):
                for k in range(i + 1):
                    lmax = j + 1 if k == i else k + 1
                    for l in range(lmax):
                        v = h2e[i, j, k, l]
                        if abs(v) > tol:
                            f.write(f'{v:23.16e} {i+1:4d} {j+1:4d} '
                                    f'{k+1:4d} {l+1:4d}\n')
        for i in range(norb):
            for j in range(i + 1):
                if abs(h1e[i, j]) > tol:
                    f.write(f'{h1e[i, j]:23.16e} {i+1:4d} {j+1:4d}'
                            '    0    0\n')
        f.write(f'{nuc:23.16e}    0    0    0    0\n')


def from_scf(mf, filename, tol=1e-12):
    """Dump the converged SCF's MO integrals."""
    import jax.numpy as jnp
    from .. import ao2mo
    mo = mf.mo_coeff
    norb = mo.shape[1]
    h1e = np.asarray(mo.T @ mf.get_hcore() @ mo)
    eri_ao = mf._eri if mf._eri is not None else mf.mol.intor('int2e')
    h2e = np.asarray(ao2mo.full(eri_ao, jnp.asarray(mo)))
    from_integrals(filename, h1e, h2e, norb, mf.mol.nelec,
                   nuc=mf.mol.energy_nuc(), tol=tol)


def read(filename):
    """Parse an FCIDUMP -> dict(H1, H2, NORB, NELEC, MS2, ECORE)."""
    with open(filename) as f:
        text = f.read()
    import re
    head, body = text.split('&END\n', 1)
    norb = int(re.search(r'NORB\s*=\s*(\d+)', head).group(1))
    nelec = int(re.search(r'NELEC\s*=\s*(\d+)', head).group(1))
    ms2 = int(re.search(r'MS2\s*=\s*(-?\d+)', head).group(1))
    h1 = np.zeros((norb, norb))
    h2 = np.zeros((norb,) * 4)
    ecore = 0.0
    for line in body.splitlines():
        toks = line.split()
        if len(toks) != 5:
            continue
        v = float(toks[0])
        i, j, k, l = map(int, toks[1:])
        if i == 0:
            ecore = v
        elif k == 0:
            h1[i - 1, j - 1] = h1[j - 1, i - 1] = v
        else:
            ii, jj, kk, ll = i - 1, j - 1, k - 1, l - 1
            for (a, b, c, d) in ((ii, jj, kk, ll), (jj, ii, kk, ll),
                                 (ii, jj, ll, kk), (jj, ii, ll, kk),
                                 (kk, ll, ii, jj), (ll, kk, ii, jj),
                                 (kk, ll, jj, ii), (ll, kk, jj, ii)):
                h2[a, b, c, d] = v
    return {'H1': h1, 'H2': h2, 'NORB': norb, 'NELEC': nelec,
            'MS2': ms2, 'ECORE': ecore}


def to_scf(filename, max_cycle=100, conv_tol=1e-10):
    """Run an RHF SCF directly on FCIDUMP integrals (reference
    tools/fcidump.py scf_from_fcidump): the orthonormal-orbital Fock is
    iterated with DIIS in the dump's own basis.

    Returns (e_tot, mo_energy, mo_coeff, dm) with everything expressed in
    the FCIDUMP orbital basis.
    """
    from ..lib.diis import DIIS
    data = read(filename)
    h1 = data['H1']
    h2 = data['H2']
    norb = data['NORB']
    nocc = data['NELEC'] // 2
    ecore = data['ECORE']
    dm = np.zeros((norb, norb))
    np.fill_diagonal(dm[:nocc, :nocc], 2.0)
    diis = DIIS(8)
    e_last = 0.0
    for cyc in range(max_cycle):
        vj = np.einsum('pqrs,sr->pq', h2, dm)
        vk = np.einsum('prqs,sr->pq', h2, dm)
        f = h1 + vj - 0.5 * vk
        e = ecore + np.einsum('pq,qp->', h1, dm) \
            + 0.5 * np.einsum('pq,qp->', vj - 0.5 * vk, dm)
        err = f @ dm - dm @ f
        f = np.asarray(diis.update(f, err))
        w, c = np.linalg.eigh(f)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e - e_last) < conv_tol and np.abs(err).max() < 1e-6:
            break
        e_last = e
    return float(e), w, c, dm


def from_mcscf(mc, filename, tol=1e-12):
    """Dump the CASCI/CASSCF active-space Hamiltonian (reference
    tools/fcidump.py from_mcscf:156): the core-Fock-dressed one-body
    integrals, active-space ERIs, and the core energy, so an external
    FCI solver reproduces mc.e_tot exactly."""
    h1, ecore = mc.h1e_for_cas()
    eri = mc.get_h2eff()
    na, nb = mc.nelecas
    from_integrals(filename, np.asarray(h1), np.asarray(eri), mc.ncas,
                   na + nb, nuc=float(ecore), ms=na - nb, tol=tol)
