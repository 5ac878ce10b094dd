"""Generalized Hartree-Fock (analog of reference pyscf/scf/ghf.py).

The spinor basis is AO ⊗ spin (dimension 2*nao); the density matrix may
mix spin blocks (noncollinear solutions). J couples only the spin-traced
density; K acts on every spin block:
    J_{sμ,s'ν} = δ_ss' Σ (μν|λσ) [D_aa + D_bb]_{σλ}
    K_{sμ,s'ν} = Σ (μλ|σν) D^{ss'}_{λσ}
"""
import numpy as np
import jax.numpy as jnp

from .hf import SCF


class GHF(SCF):
    _fused_kind = None     # host loop: spinor occupations are general

    def get_ovlp(self, mol=None):
        s = super().get_ovlp(mol)
        nao = s.shape[0]
        out = jnp.zeros((2 * nao, 2 * nao))
        out = out.at[:nao, :nao].set(s).at[nao:, nao:].set(s)
        return out

    def get_hcore(self, mol=None):
        h = super().get_hcore(mol)
        nao = h.shape[0]
        out = jnp.zeros((2 * nao, 2 * nao))
        out = out.at[:nao, :nao].set(h).at[nao:, nao:].set(h)
        return out

    def get_jk(self, mol=None, dm=None, hermi=1, with_j=True, with_k=True,
               omega=None):
        mol = mol or self.mol
        eri = self._get_eri(omega)
        dm = jnp.asarray(dm)
        nao = dm.shape[-1] // 2
        dmb = dm.reshape(2, nao, 2, nao).transpose(0, 2, 1, 3)  # (s,s',n,n)
        dmt = dmb[0, 0] + dmb[1, 1]
        vj = vk = None
        if with_j:
            j = jnp.einsum('mnls,sl->mn', eri, dmt)
            vj = jnp.zeros((2 * nao, 2 * nao))
            vj = vj.at[:nao, :nao].set(j).at[nao:, nao:].set(j)
        if with_k:
            kb = jnp.einsum('mlsn,acls->acmn', eri, dmb)
            vk = kb.transpose(0, 2, 1, 3).reshape(2 * nao, 2 * nao)
        return vj, vk

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        vj, vk = self.get_jk(mol, dm)
        return vj - vk          # spinor basis: exchange enters with 1

    def get_occ(self, mo_energy, mo_coeff=None):
        ne = self.mol.nelectron
        e = np.asarray(mo_energy)
        occ = np.zeros_like(e)
        occ[np.argsort(e)[:ne]] = 1.0
        return jnp.asarray(occ)

    def get_init_guess(self, mol=None, key=None):
        mol = mol or self.mol
        dm = super().get_init_guess(mol, key)
        dm = np.asarray(dm)
        if dm.shape[-1] == 2 * mol.nao:
            # guess built from spinor-sized operators (hcore/chk) --
            # already in the GHF basis
            return jnp.asarray(dm)
        nao = dm.shape[-1]
        out = np.zeros((2 * nao, 2 * nao))
        out[:nao, :nao] = dm * 0.5
        out[nao:, nao:] = dm * 0.5
        return jnp.asarray(out)

    def spin_square(self, mo_coeff=None, mo_occ=None, s=None):
        """<S^2> and multiplicity of the GHF determinant via the projector
        identity <A B> = tr(PA)tr(PB) + tr(PA(1-P)B) for one-body spin
        operators (exact for any single determinant; reference
        scf/ghf.py spin_square)."""
        import scipy.linalg
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = np.asarray(mo_occ if mo_occ is not None else self.mo_occ)
        if s is None:
            s = np.asarray(super().get_ovlp())
        nao = s.shape[0]
        shalf = scipy.linalg.sqrtm(s).real
        cocc = np.asarray(c)[:, o > 0]
        ct = np.concatenate([shalf @ cocc[:nao], shalf @ cocc[nao:]])
        P = ct @ ct.conj().T                     # orthonormal spinor basis
        eye = np.eye(nao)
        zero = np.zeros((nao, nao))
        Sx = 0.5 * np.block([[zero, eye], [eye, zero]])
        Sy = 0.5 * np.block([[zero, -1j * eye], [1j * eye, zero]])
        Sz = 0.5 * np.block([[eye, zero], [zero, -eye]])
        ss = 0.0
        for Sk in (Sx, Sy, Sz):
            psk = P @ Sk
            ss += (np.trace(psk) ** 2
                   + np.trace(psk @ (np.eye(2 * nao) - P) @ Sk)).real
        mult = 2.0 * np.sqrt(max(ss + 0.25, 0.0))
        return float(ss), float(mult)
