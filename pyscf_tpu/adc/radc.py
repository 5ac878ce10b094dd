"""Restricted ADC(2) / ADC(2)-x for ionization potentials and electron
affinities.

Reference analog: pyscf/adc/radc.py + radc_ip.py + radc_ea.py +
radc_amplitudes.py (working equations of Banerjee & Sokolov,
J. Chem. Phys. 151, 224112 (2019), spatial-orbital spin-adapted form).

TPU-native design: the sigma vector is a single jitted einsum program over
dense MO blocks; the (1h + 2h1p) / (1p + 2p1h) eigenproblem is solved by
materializing the small effective matrix through vmap of the sigma over a
basis (the non-Hermitian problem is tiny for the 1h/1p-dominated roots) --
a matrix-free non-symmetric Davidson can replace this for large systems.

Conventions (matching the reference so its test goldens apply):
  t2_1[i,j,a,b] = (ia|jb) / (e_i + e_j - e_a - e_b)
  e_mp2 = 2 <t2, (iabj)> - <t2, (ibaj)>
  IP matrix is negated so roots are positive ionization energies.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ao2mo import full as ao2mo_full


class _Eris:
    """Dense MO integral blocks (o=occ, v=vir), chemists' notation."""

    def __init__(self, mf, nocc):
        mol = mf.mol
        mo = np.asarray(mf.mo_coeff)
        nmo = mo.shape[1]
        eri = np.asarray(ao2mo_full(mol, mo)).reshape(nmo, nmo, nmo, nmo)
        o, v = slice(0, nocc), slice(nocc, nmo)
        self.oooo = eri[o, o, o, o]
        self.ovoo = eri[o, v, o, o]
        self.oovv = eri[o, o, v, v]
        self.ovvo = eri[o, v, v, o]
        self.ovov = eri[o, v, o, v]
        self.ovvv = eri[o, v, v, v]
        self.vvvv = eri[v, v, v, v]


class RADC:
    """Ground-state MP amplitudes + dispatcher (reference adc.ADC)."""

    def __init__(self, mf, frozen=None, method='adc(2)'):
        if frozen:
            raise NotImplementedError('frozen core in ADC')
        self._scf = mf
        self.mol = mf.mol
        self.method = method
        self.mo_energy = np.asarray(mf.mo_energy)
        self.nocc = self.mol.nelectron // 2
        self.nmo = self.mo_energy.shape[0]
        self.nvir = self.nmo - self.nocc
        self._eris = None
        self.t1 = None
        self.t2 = None
        self.e_corr = None

    def transform_integrals(self):
        if self._eris is None:
            self._eris = _Eris(self._scf, self.nocc)
        return self._eris

    def kernel_gs(self):
        """First-order doubles, second-order singles, MP2 energy."""
        eris = self.transform_integrals()
        no = self.nocc
        e = self.mo_energy
        eo, ev = e[:no], e[no:]
        D2 = (eo[:, None, None, None] + eo[None, :, None, None]
              - ev[None, None, :, None] - ev[None, None, None, :])
        v_oovv = eris.ovov.transpose(0, 2, 1, 3)       # <ij|ab> = (ia|jb)
        t2_1 = v_oovv / D2

        D1 = eo[:, None] - ev[None, :]
        ovvv, ovoo = eris.ovvv, eris.ovoo
        t1_2 = (1.5 * np.einsum('kdac,ikcd->ia', ovvv, t2_1, optimize=True)
                - 0.5 * np.einsum('kdac,kicd->ia', ovvv, t2_1, optimize=True)
                - 0.5 * np.einsum('kcad,ikcd->ia', ovvv, t2_1, optimize=True)
                + 0.5 * np.einsum('kcad,kicd->ia', ovvv, t2_1, optimize=True)
                - 1.5 * np.einsum('lcki,klac->ia', ovoo, t2_1, optimize=True)
                + 0.5 * np.einsum('lcki,lkac->ia', ovoo, t2_1, optimize=True)
                - 0.5 * np.einsum('kcli,lkac->ia', ovoo, t2_1, optimize=True)
                + 0.5 * np.einsum('kcli,klac->ia', ovoo, t2_1, optimize=True)
                ) / D1
        t2_2 = None
        if self.method != 'adc(2)':
            # second-order doubles (needed for ADC(2)-x transition moments)
            oooo, ovvo, oovv = eris.oooo, eris.ovvo, eris.oovv
            vvvv = eris.vvvv
            r = np.einsum('acbd,ijcd->ijab', vvvv, t2_1, optimize=True)
            r += np.einsum('kilj,klab->ijab', oooo, t2_1, optimize=True)
            r += 2 * np.einsum('kcbj,kica->ijab', ovvo, t2_1, optimize=True)
            r -= np.einsum('kcbj,ikca->ijab', ovvo, t2_1, optimize=True)
            r -= np.einsum('kjbc,ikac->ijab', oovv, t2_1, optimize=True)
            r -= np.einsum('kibc,kjac->ijab', oovv, t2_1, optimize=True)
            r -= np.einsum('kjac,ikcb->ijab', oovv, t2_1, optimize=True)
            r += 2 * np.einsum('kcai,kjcb->ijab', ovvo, t2_1, optimize=True)
            r -= np.einsum('kcai,jkcb->ijab', ovvo, t2_1, optimize=True)
            r -= np.einsum('kiac,kjcb->ijab', oovv, t2_1, optimize=True)
            t2_2 = r / D2
        self.t2 = (t2_1, t2_2)
        self.t1 = (t1_2,)
        e_mp = (2 * np.einsum('ijab,iabj->', t2_1, eris.ovvo, optimize=True)
                - np.einsum('ijab,ibaj->', t2_1, eris.ovvo, optimize=True))
        self.e_corr = float(e_mp)
        return self.e_corr, t1_2, t2_1

    def make_ref_rdm1(self, ao_repr=False):
        """ADC(2) reference one-particle density matrix (MO basis)."""
        if self.t2 is None:
            self.kernel_gs()
        t2 = self.t2[0]
        t1 = self.t1[0]
        no, nmo = self.nocc, self.nmo
        # spin-summed ADC(2) reference OPDM (reference radc.make_ref_rdm1)
        dm = np.zeros((nmo, nmo))
        dm[:no, :no] = (2 * np.eye(no)
                        - 4 * np.einsum('Iiab,Jiab->IJ', t2, t2, optimize=True)
                        + 2 * np.einsum('Iiab,Jiba->IJ', t2, t2, optimize=True))
        dm[:no, no:] = 2 * t1
        dm[no:, :no] = 2 * t1.T
        dm[no:, no:] = (4 * np.einsum('ijAa,ijBa->AB', t2, t2, optimize=True)
                        - 2 * np.einsum('ijAa,jiBa->AB', t2, t2, optimize=True))
        if ao_repr:
            mo = np.asarray(self._scf.mo_coeff)
            dm = mo @ dm @ mo.T
        return dm


def _ip_sigma(method, M_ij, eris, e_occ, e_vir):
    """Jitted IP sigma: r -> -(ADC matrix) r (positive-IP convention)."""
    no, nv = len(e_occ), len(e_vir)
    ovoo = jnp.asarray(eris.ovoo)
    M = jnp.asarray(M_ij)
    D_aij = (-e_vir[:, None, None] + e_occ[None, :, None]
             + e_occ[None, None, :])
    D_aij = jnp.asarray(D_aij)
    if method != 'adc(2)':
        oooo = jnp.asarray(eris.oooo)
        oovv = jnp.asarray(eris.oovv)
        ovvo = jnp.asarray(eris.ovvo)

    @jax.jit
    def sigma(r):
        r1 = r[:no]
        r2 = r[no:].reshape(nv, no, no)
        s1 = M @ r1
        s1 += 2.0 * jnp.einsum('jaki,ajk->i', ovoo, r2)
        s1 -= jnp.einsum('kaji,ajk->i', ovoo, r2)
        s2 = jnp.einsum('jaki,i->ajk', ovoo, r1)
        s2 += D_aij * r2
        if method != 'adc(2)':
            s2 -= 0.5 * jnp.einsum('kijl,ali->ajk', oooo, r2)
            s2 -= 0.5 * jnp.einsum('klji,ail->ajk', oooo, r2)
            s2 += 0.5 * jnp.einsum('klba,bjl->ajk', oovv, r2)
            s2 += 0.5 * jnp.einsum('jabl,bkl->ajk', ovvo, r2)
            s2 -= jnp.einsum('jabl,blk->ajk', ovvo, r2)
            s2 += 0.5 * jnp.einsum('jlba,blk->ajk', oovv, r2)
            s2 += 0.5 * jnp.einsum('kiba,bji->ajk', oovv, r2)
            s2 += 0.5 * jnp.einsum('jiba,bik->ajk', oovv, r2)
            s2 -= jnp.einsum('jabi,bik->ajk', ovvo, r2)
            s2 += 0.5 * jnp.einsum('jabi,bki->ajk', ovvo, r2)
        return -jnp.concatenate([s1, s2.ravel()])

    return sigma


def _ea_sigma(method, M_ab, eris, e_occ, e_vir):
    no, nv = len(e_occ), len(e_vir)
    ovvv = jnp.asarray(eris.ovvv)
    M = jnp.asarray(M_ab)
    D_iab = (-e_occ[:, None, None] + e_vir[None, :, None]
             + e_vir[None, None, :])
    D_iab = jnp.asarray(D_iab)
    if method != 'adc(2)':
        vvvv = jnp.asarray(eris.vvvv)
        oovv = jnp.asarray(eris.oovv)
        ovvo = jnp.asarray(eris.ovvo)

    @jax.jit
    def sigma(r):
        r1 = r[:nv]
        r2 = r[nv:].reshape(no, nv, nv)
        s1 = M @ r1
        s1 += 2.0 * jnp.einsum('icab,ibc->a', ovvv, r2)
        s1 -= jnp.einsum('ibac,ibc->a', ovvv, r2)
        s2 = jnp.einsum('icab,a->ibc', ovvv, r1)
        s2 += D_iab * r2
        if method != 'adc(2)':
            s2 += jnp.einsum('xyzw,jzw->jxy', vvvv, r2)
            s2 -= 0.5 * jnp.einsum('jzyi,jzx->ixy', ovvo, r2)
            s2 += jnp.einsum('jzyi,jxz->ixy', ovvo, r2)
            s2 -= 0.5 * jnp.einsum('jiyz,jxz->ixy', oovv, r2)
            s2 -= 0.5 * jnp.einsum('jixz,jzy->ixy', oovv, r2)
            s2 -= 0.5 * jnp.einsum('jixw,jwy->ixy', oovv, r2)
            s2 -= 0.5 * jnp.einsum('jiyw,jxw->ixy', oovv, r2)
            s2 += jnp.einsum('jwyi,jxw->ixy', ovvo, r2)
            s2 -= 0.5 * jnp.einsum('jwyi,jwx->ixy', ovvo, r2)
        return jnp.concatenate([s1, s2.ravel()])

    return sigma


def _dense_eig(sigma, dim, nroots):
    """Materialize the small non-Hermitian matrix and take lowest roots."""
    H = np.asarray(jax.vmap(sigma)(jnp.eye(dim))).T   # columns = sigma(e_i)
    w, v = np.linalg.eig(H)
    order = np.argsort(w.real)
    roots = order[:nroots]
    return np.real(w[roots]), np.real(v[:, roots])


class RADCIP:
    """IP-(R)ADC(2)/(2)-x (reference radc_ip.RADCIP)."""

    def __init__(self, adc):
        self._adc = adc
        self.method = adc.method

    def get_imds(self):
        adc = self._adc
        if adc.t2 is None:
            adc.kernel_gs()
        t2 = adc.t2[0]
        no = adc.nocc
        ovvo = adc._eris.ovvo
        e_occ = adc.mo_energy[:no]
        M = np.diag(e_occ).astype(float)
        # second-order i-j block (spin-adapted RADC(2))
        M += 0.25 * np.einsum('ilde,jdel->ij', t2, ovvo, optimize=True)
        M -= 0.25 * np.einsum('lide,jdel->ij', t2, ovvo, optimize=True)
        M -= 0.25 * np.einsum('ilde,jedl->ij', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('lide,jedl->ij', t2, ovvo, optimize=True)
        M += 0.5 * np.einsum('ilde,jdel->ij', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('jlde,idel->ij', t2, ovvo, optimize=True)
        M -= 0.25 * np.einsum('ljde,idel->ij', t2, ovvo, optimize=True)
        M -= 0.25 * np.einsum('jlde,ldei->ij', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('ljde,ldei->ij', t2, ovvo, optimize=True)
        M += 0.5 * np.einsum('jlde,idel->ij', t2, ovvo, optimize=True)
        return M

    def kernel(self, nroots=3):
        adc = self._adc
        no, nv = adc.nocc, adc.nvir
        M = self.get_imds()
        sig = _ip_sigma(self.method, M, adc._eris, adc.mo_energy[:no],
                        adc.mo_energy[no:])
        dim = no + nv * no * no
        e, U = _dense_eig(sig, dim, nroots)
        self.E, self.U = e, U
        self.P, self.X = self.get_properties(nroots)
        return self.E, self.U, self.P, self.X

    def renormalize_eigenvectors(self, nroots):
        no, nv = self._adc.nocc, self._adc.nvir
        U = self.U.copy()
        for I in range(U.shape[1]):
            u1 = U[:no, I]
            u2 = U[no:, I].reshape(nv, no, no)
            n2 = (u1 @ u1 + 2 * (u2.ravel() @ u2.ravel())
                  - u2.ravel() @ u2.transpose(0, 2, 1).ravel())
            U[:, I] /= np.sqrt(n2)
        return U

    def get_trans_moments(self):
        adc = self._adc
        t2 = adc.t2[0]
        t1_2 = adc.t1[0]
        no, nv = adc.nocc, adc.nvir
        dim = no + nv * no * no
        T = np.zeros((no + nv, dim))
        for orb in range(no + nv):
            if orb < no:
                T1 = np.eye(no)[orb].astype(float)
                T1 += 0.25 * np.einsum('kdc,ikdc->i', t2[:, orb], t2)
                T1 -= 0.25 * np.einsum('kcd,ikdc->i', t2[:, orb], t2)
                T1 -= 0.25 * np.einsum('kdc,ikcd->i', t2[:, orb], t2)
                T1 += 0.25 * np.einsum('kcd,ikcd->i', t2[:, orb], t2)
                T1 -= 0.25 * np.einsum('kdc,ikdc->i', t2[orb], t2)
                T1 -= 0.25 * np.einsum('kcd,ikcd->i', t2[orb], t2)
                T[orb, :no] = T1
            else:
                T[orb, :no] = t1_2[:, orb - no]
                T[orb, no:] = t2.transpose(2, 3, 1, 0)[orb - no].ravel()
                if self.method != 'adc(2)' and adc.t2[1] is not None:
                    T[orb, no:] += adc.t2[1].transpose(2, 3, 1, 0)[
                        orb - no].ravel()
            # spin adaptation: T2 <- 2 T2 - T2(j<->k)
            t2blk = T[orb, no:].reshape(nv, no, no)
            T[orb, no:] = (2 * t2blk - t2blk.transpose(0, 2, 1)).ravel()
        return T

    def get_properties(self, nroots):
        T = self.get_trans_moments()
        U = self.renormalize_eigenvectors(nroots)
        X = T @ U
        P = 2.0 * np.einsum('pi,pi->i', X, X)
        return P, X


class RADCEA:
    """EA-(R)ADC(2)/(2)-x (reference radc_ea.RADCEA)."""

    def __init__(self, adc):
        self._adc = adc
        self.method = adc.method

    def get_imds(self):
        adc = self._adc
        if adc.t2 is None:
            adc.kernel_gs()
        t2 = adc.t2[0]
        no = adc.nocc
        ovvo = adc._eris.ovvo
        M = np.diag(adc.mo_energy[no:]).astype(float)
        M -= 0.75 * np.einsum('lmad,lbdm->ab', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('mlad,lbdm->ab', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('lmad,ldbm->ab', t2, ovvo, optimize=True)
        M -= 0.25 * np.einsum('mlad,ldbm->ab', t2, ovvo, optimize=True)
        M -= 0.75 * np.einsum('lmbd,ladm->ab', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('mlbd,ladm->ab', t2, ovvo, optimize=True)
        M += 0.25 * np.einsum('lmbd,ldam->ab', t2, ovvo, optimize=True)
        M -= 0.25 * np.einsum('mlbd,ldam->ab', t2, ovvo, optimize=True)
        return M

    def kernel(self, nroots=3):
        adc = self._adc
        no, nv = adc.nocc, adc.nvir
        M = self.get_imds()
        sig = _ea_sigma(self.method, M, adc._eris, adc.mo_energy[:no],
                        adc.mo_energy[no:])
        dim = nv + no * nv * nv
        e, U = _dense_eig(sig, dim, nroots)
        self.E, self.U = e, U
        self.P, self.X = self.get_properties(nroots)
        return self.E, self.U, self.P, self.X

    def renormalize_eigenvectors(self, nroots):
        no, nv = self._adc.nocc, self._adc.nvir
        U = self.U.copy()
        for I in range(U.shape[1]):
            u1 = U[:nv, I]
            u2 = U[nv:, I].reshape(no, nv, nv)
            n2 = (u1 @ u1 + 2 * (u2.ravel() @ u2.ravel())
                  - u2.ravel() @ u2.transpose(0, 2, 1).ravel())
            U[:, I] /= np.sqrt(n2)
        return U

    def get_trans_moments(self):
        adc = self._adc
        t2 = adc.t2[0]
        t1_2 = adc.t1[0]
        no, nv = adc.nocc, adc.nvir
        dim = nv + no * nv * nv
        T = np.zeros((no + nv, dim))
        for orb in range(no + nv):
            if orb < no:
                T[orb, :nv] = -t1_2[orb]
                T[orb, nv:] = (-t2.transpose(1, 0, 2, 3)[:, orb]).ravel()
                if self.method != 'adc(2)' and adc.t2[1] is not None:
                    T[orb, nv:] += (-adc.t2[1].transpose(1, 0, 2, 3)[:, orb]
                                    ).ravel()
            else:
                a = orb - no
                T1 = np.eye(nv)[a].astype(float)
                T1 -= 0.25 * np.einsum('klc,klac->a', t2[:, :, a, :], t2)
                T1 -= 0.25 * np.einsum('lkc,lkac->a', t2[:, :, a, :], t2)
                T1 -= 0.25 * np.einsum('klc,klac->a', t2[:, :, a, :], t2)
                T1 += 0.25 * np.einsum('lkc,klac->a', t2[:, :, a, :], t2)
                T1 += 0.25 * np.einsum('klc,lkac->a', t2[:, :, a, :], t2)
                T1 -= 0.25 * np.einsum('lkc,lkac->a', t2[:, :, a, :], t2)
                T[orb, :nv] = T1
            t2blk = T[orb, nv:].reshape(no, nv, nv)
            T[orb, nv:] = (2 * t2blk - t2blk.transpose(0, 2, 1)).ravel()
        return T

    def get_properties(self, nroots):
        T = self.get_trans_moments()
        U = self.renormalize_eigenvectors(nroots)
        X = T @ U
        P = 2.0 * np.einsum('pi,pi->i', X, X)
        return P, X
