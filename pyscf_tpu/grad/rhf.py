"""Analytic RHF nuclear gradients (analog of reference pyscf/grad/rhf.py:
grad_elec:33, GradientsBase:321)."""
import numpy as np
import jax.numpy as jnp


def _ao2atom_map(mol):
    ao2atom = np.zeros(mol.nao, dtype=int)
    for l, g in mol.shell_groups.items():
        for off, ia in zip(g.ao_off, g.atom_ids):
            ao2atom[off:off + 2 * l + 1] = ia
    return ao2atom


def grad_nuc(mol):
    z = np.asarray(mol.charges, dtype=float)
    r = np.asarray(mol.coords)
    d = r[:, None, :] - r[None, :, :]
    dist = np.linalg.norm(d, axis=2)
    np.fill_diagonal(dist, np.inf)
    # dE/dR_A = -sum_B Z_A Z_B (R_A - R_B)/|R_A - R_B|^3
    return -np.einsum('a,b,abx->ax', z, z, d / dist[:, :, None] ** 3)


def grad_elec(mf, mo_energy=None, mo_coeff=None, mo_occ=None):
    """Electronic part of the RHF gradient, (natm, 3)."""
    from ..ops.integrals import int1e_deriv, int2e as int2e_mod
    mol = mf.mol
    mo_e = np.asarray(mo_energy if mo_energy is not None else mf.mo_energy)
    mo_c = np.asarray(mo_coeff if mo_coeff is not None else mf.mo_coeff)
    mo_o = np.asarray(mo_occ if mo_occ is not None else mf.mo_occ)
    dm = np.asarray(mf.make_rdm1(jnp.asarray(mo_c), jnp.asarray(mo_o)))
    occ = mo_o > 0
    dme = np.asarray((mo_c[:, occ] * (mo_e[occ] * mo_o[occ])) @ mo_c[:, occ].T)

    ipovlp = np.asarray(int1e_deriv.int1e_ipovlp(mol))   # <d mu | nu>
    ipkin = np.asarray(int1e_deriv.int1e_ipkin(mol))
    ipnuc = np.asarray(int1e_deriv.int1e_ipnuc(mol))
    ip1 = np.asarray(int2e_mod.int2e_ip1(mol))           # (3, d mu, nu|la,si)

    ao2atom = _ao2atom_map(mol)
    de = np.zeros((mol.natm, 3))
    h1 = ipkin + ipnuc
    # J'/K'-like contractions of the derivative ERIs
    vj = np.einsum('xijkl,lk->xij', ip1, dm)
    vk = np.einsum('xijkl,jk->xil', ip1, dm)
    vhf = vj - 0.5 * vk
    for A in range(mol.natm):
        mask = ao2atom == A
        # one-electron: 2 * <d mu|h|nu> dm  (bra derivative, dm symmetric)
        de[A] += 2.0 * np.einsum('xij,ij->x', h1[:, mask], dm[mask])
        # Hellmann-Feynman operator term (full matrix sum, no bra/ket factor)
        iprinv = np.asarray(int1e_deriv.int1e_iprinv(mol, mol.coords[A]))
        de[A] += float(mol.charges[A]) * np.einsum('xij,ij->x', iprinv, dm)
        # overlap (energy-weighted density)
        de[A] -= 2.0 * np.einsum('xij,ij->x', ipovlp[:, mask], dme[mask])
        # two-electron
        de[A] += 2.0 * np.einsum('xij,ij->x', vhf[:, mask], dm[mask])
    return de


class Gradients:
    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol
        self.de = None

    def grad_nuc(self):
        return grad_nuc(self.mol)

    def grad_elec(self):
        return grad_elec(self._scf)

    def kernel(self):
        mf0 = self._scf
        if getattr(mf0, 'with_df', None) is not None:
            from .autodiff import grad_scf
            e_chk, self.de = grad_scf(mf0)
            if abs(e_chk - mf0.e_tot) > 1e-6:
                raise RuntimeError(
                    f'gradient energy check failed: {e_chk} vs {mf0.e_tot}')
            return self.de
        self.de = self.grad_elec() + self.grad_nuc()
        return self.de

    run = kernel


def finite_difference_gradient(mf_factory, mol, step=1e-4):
    """Central-difference gradient of any energy method.

    mf_factory(mol) -> object with .kernel() returning the energy.
    Analog of reference tools/finite_diff.py; used as the cross-check
    oracle and as the fallback Gradients engine for methods without
    analytic derivatives yet.
    """
    coords0 = np.asarray(mol.coords).copy()
    de = np.zeros((mol.natm, 3))
    for A in range(mol.natm):
        for x in range(3):
            for s, sign in ((step, 1.0), (-step, -1.0)):
                c = coords0.copy()
                c[A, x] += s
                m2 = mol.copy()
                m2.set_geom_(c)
                e = mf_factory(m2)
                de[A, x] += sign * e
    return de / (2 * step)
