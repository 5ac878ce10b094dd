"""Unrestricted Hartree-Fock (analog of reference pyscf/scf/uhf.py)."""
import jax.numpy as jnp
import numpy as np

from .hf import SCF, _density


class UHF(SCF):
    """UHF: dm is a stacked (2, nao, nao) array [dm_alpha, dm_beta]."""

    _fused_kind = 'unrestricted'

    def _fused_veff(self):
        if self.with_df is not None:
            B = self.with_df.cderi

            def veff_fn(data, dma, dmb, coa, cob):
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dma + dmb)
                vj = jnp.einsum('p,pij->ij', rho, B)
                Boa = jnp.einsum('pij,jo->pio', B, coa)
                Bob = jnp.einsum('pij,jo->pio', B, cob)
                vka = jnp.einsum('pio,pjo->ij', Boa, Boa)
                vkb = jnp.einsum('pio,pjo->ij', Bob, Bob)
                vhf = jnp.stack([vj - vka, vj - vkb])
                e2 = 0.5 * (jnp.sum(vhf[0] * dma) + jnp.sum(vhf[1] * dmb))
                return vhf, e2

            def veff_dm_fn(data, dma, dmb):
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dma + dmb)
                vj = jnp.einsum('p,pij->ij', rho, B)
                vka = jnp.einsum('pil,lk,pkj->ij', B, dma, B)
                vkb = jnp.einsum('pil,lk,pkj->ij', B, dmb, B)
                vhf = jnp.stack([vj - vka, vj - vkb])
                e2 = 0.5 * (jnp.sum(vhf[0] * dma) + jnp.sum(vhf[1] * dmb))
                return vhf, e2

            return (('uhf-df', B.shape), veff_fn, {'B': B}, veff_dm_fn)
        if self._eri is None:
            self._eri = self.mol.intor('int2e')
        eri = self._eri

        def veff_fn(data, dma, dmb, coa, cob):
            eri = data['eri']
            vj = jnp.einsum('ijkl,lk->ij', eri, dma + dmb)
            vka = jnp.einsum('ilkj,lk->ij', eri, dma)
            vkb = jnp.einsum('ilkj,lk->ij', eri, dmb)
            vhf = jnp.stack([vj - vka, vj - vkb])
            e2 = 0.5 * (jnp.sum(vhf[0] * dma) + jnp.sum(vhf[1] * dmb))
            return vhf, e2

        def veff_dm_fn(data, dma, dmb):
            return veff_fn(data, dma, dmb, None, None)

        return (('uhf-eri', eri.shape), veff_fn, {'eri': eri}, veff_dm_fn)

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        dm = jnp.asarray(dm)
        vj, vk = self.get_jk(mol, dm)
        vjt = vj[0] + vj[1]
        return jnp.stack([vjt - vk[0], vjt - vk[1]])

    def get_occ(self, mo_energy, mo_coeff=None):
        na, nb = self.mol.nelec
        occs = []
        for e, n in zip(np.asarray(mo_energy), (na, nb)):
            idx = np.argsort(e)
            occ = np.zeros_like(e)
            occ[idx[:n]] = 1.0
            occs.append(occ)
        return jnp.asarray(np.stack(occs))

    def make_rdm1(self, mo_coeff=None, mo_occ=None):
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = mo_occ if mo_occ is not None else self.mo_occ
        return jnp.stack([_density(c[0], o[0]), _density(c[1], o[1])])

    def energy_elec(self, dm, h1e, vhf):
        e1 = jnp.einsum('ij,sji->', h1e, dm)
        e2 = 0.5 * jnp.einsum('sij,sji->', vhf, dm)
        return (e1 + e2).real

    def eig(self, fock, s1e=None):
        from ..lib.linalg import eigh_gen
        ea, ca = eigh_gen(fock[0], self._orth)
        eb, cb = eigh_gen(fock[1], self._orth)
        return jnp.stack([ea, eb]), jnp.stack([ca, cb])

    def get_fock(self, h1e, s1e, vhf, dm, cycle=-1, diis=None):
        fock = h1e[None] + vhf
        if diis is not None and cycle >= self.diis_start_cycle:
            errs = []
            for s in range(2):
                sdf = s1e @ dm[s] @ fock[s]
                errs.append(sdf.conj().T - sdf)
            fock = diis.update(fock, jnp.stack(errs))
        return fock

    def get_init_guess(self, mol=None, key=None):
        dm = super().get_init_guess(mol, key)
        dm = jnp.asarray(dm)
        if dm.ndim == 2:
            na, nb = self.mol.nelec
            ne = max(self.mol.nelectron, 1)
            dm = jnp.stack([dm * (na / ne), dm * (nb / ne)])
        return dm

    def init_guess_by_1e(self, mol=None):
        mol = mol or self.mol
        from ..lib.linalg import canonical_orth, eigh_gen
        h1e = self.get_hcore(mol)
        s1e = self.get_ovlp(mol)
        x = canonical_orth(s1e, self.lindep_thresh)
        e, c = eigh_gen(h1e, x)
        mo_energy = jnp.stack([e, e])
        mo_coeff = jnp.stack([c, c])
        mo_occ = self.get_occ(mo_energy, mo_coeff)
        return self.make_rdm1(mo_coeff, mo_occ)

    def _scf_grad_norm(self, mo_coeff, mo_occ, fock):
        tot = 0.0
        for s in range(2):
            occ = np.asarray(mo_occ[s]) > 0
            co = mo_coeff[s][:, occ]
            cv = mo_coeff[s][:, ~occ]
            g = co.T @ fock[s] @ cv
            tot += float(jnp.sum(g * g))
        return tot ** 0.5

    def spin_square(self, mo_coeff=None, mo_occ=None, s=None):
        """<S^2> and multiplicity (reference scf/uhf.py spin_square)."""
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = mo_occ if mo_occ is not None else self.mo_occ
        if s is None:
            s = self.get_ovlp()
        occa = np.asarray(o[0]) > 0
        occb = np.asarray(o[1]) > 0
        ca = c[0][:, occa]
        cb = c[1][:, occb]
        na, nb = ca.shape[1], cb.shape[1]
        sab = ca.T @ s @ cb
        ovlp2 = float(jnp.sum(sab * sab))
        sz = 0.5 * (na - nb)
        ss = sz * sz + 0.5 * (na + nb) - ovlp2
        return ss, 2 * (np.sqrt(ss + 0.25)) if ss > -0.25 else 1.0

    def MP2(self, **kwargs):
        from ..mp.ump2 import UMP2
        return UMP2(self, **kwargs)

    # ---- analysis: base-class methods expect one (nao, nao) density;
    # collapse the stacked spin density (reference scf/uhf.py:797 ff).
    def dip_moment(self, mol=None, dm=None, unit='Debye'):
        if dm is None:
            dm = self.make_rdm1()
        return super().dip_moment(mol, dm[0] + dm[1], unit)

    def quad_moment(self, mol=None, dm=None):
        if dm is None:
            dm = self.make_rdm1()
        return super().quad_moment(mol, dm[0] + dm[1])

    def mulliken_pop(self, mol=None, dm=None, s=None):
        if dm is None:
            dm = self.make_rdm1()
        return super().mulliken_pop(mol, dm[0] + dm[1], s)

    def mulliken_spin_pop(self, mol=None, dm=None, s=None):
        """Mulliken atomic spin density Tr[(Da - Db) S] per atom
        (reference scf/uhf.py mulliken_spin_pop:837). Returns
        (ao_spin_pop, atom_spin_density); atom values sum to 2S."""
        import jax.numpy as jnp
        mol = mol or self.mol
        if dm is None:
            dm = self.make_rdm1()
        if s is None:
            s = self.get_ovlp(mol)
        pop = np.asarray(jnp.einsum('ij,ji->i', dm[0] - dm[1], s))
        ao2atom = np.zeros(mol.nao, dtype=int)
        for l, g in mol.shell_groups.items():
            for off, ia in zip(g.ao_off, g.atom_ids):
                ao2atom[off:off + 2 * l + 1] = ia
        spin = np.zeros(mol.natm)
        for i, p in enumerate(pop):
            spin[ao2atom[i]] += p
        return pop, spin

    def Gradients(self):
        from ..grad import uhf as uhf_grad
        return uhf_grad.Gradients(self)

    def nuc_grad_method(self):
        return self.Gradients()

    def Hessian(self, **kwargs):
        from ..hessian import Hessian
        return Hessian(self, **kwargs)
