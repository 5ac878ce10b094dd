"""Restricted open-shell Hartree-Fock (analog of reference pyscf/scf/rohf.py).

Roothaan effective Fock: single set of orbitals, alpha/beta occupations.
"""
import jax.numpy as jnp
import numpy as np

from .hf import SCF, _density
from .uhf import UHF


class ROHF(UHF):

    _fused_kind = None   # ROHF constraints need the legacy host loop

    def get_fock(self, h1e, s1e, vhf, dm, cycle=-1, diis=None):
        """Roothaan single effective Fock (reference scf/rohf.py get_roothaan_fock)."""
        fa = h1e + vhf[0]
        fb = h1e + vhf[1]
        dma, dmb = dm[0], dm[1]
        # Roothaan effective Fock: closed/open/virtual block structure
        #   closed-closed Fc, open-open Fc, virt-virt Fc,
        #   closed-open Fb, open-virt Fa, closed-virt Fc  (Fc = (Fa+Fb)/2).
        s = s1e
        pc = dmb @ s                  # core projector (beta-occupied)
        po = (dma - dmb) @ s          # open-shell projector
        pv = jnp.eye(s.shape[0]) - dma @ s
        fc = 0.5 * (fa + fb)
        f = 0.5 * (pc.conj().T @ fc @ pc + po.conj().T @ fc @ po
                   + pv.conj().T @ fc @ pv)
        f = f + po.conj().T @ fb @ pc + po.conj().T @ fa @ pv \
            + pv.conj().T @ fc @ pc
        f = f + f.conj().T
        if diis is not None and cycle >= self.diis_start_cycle:
            dmt = dma + dmb
            sdf = s1e @ dmt @ f
            err = sdf.conj().T - sdf
            f = diis.update(f, err)
        return f

    def eig(self, fock, s1e=None):
        from ..lib.linalg import eigh_gen
        e, c = eigh_gen(fock, self._orth)
        return e, c

    def get_occ(self, mo_energy, mo_coeff=None):
        na, nb = self.mol.nelec
        e = np.asarray(mo_energy)
        idx = np.argsort(e)
        occ = np.zeros_like(e)
        occ[idx[:nb]] = 2.0
        occ[idx[nb:na]] = 1.0
        return jnp.asarray(occ)

    def make_rdm1(self, mo_coeff=None, mo_occ=None):
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = np.asarray(mo_occ if mo_occ is not None else self.mo_occ)
        occa = jnp.asarray((o > 0).astype(float))
        occb = jnp.asarray((o == 2).astype(float))
        return jnp.stack([_density(c, occa), _density(c, occb)])

    def _scf_grad_norm(self, mo_coeff, mo_occ, fock):
        # ROHF gradient blocks: vc gets Fa+Fb, oc gets Fb, vo gets Fa
        # (mirrors reference scf/rohf.py:236 get_grad).
        o = np.asarray(mo_occ)
        occa, occb = o > 0, o == 2
        fa = np.asarray(mo_coeff.T @ fock[0] @ mo_coeff)
        fb = np.asarray(mo_coeff.T @ fock[1] @ mo_coeff)
        uva = (~occa)[:, None] & occa[None, :]
        uvb = (~occb)[:, None] & occb[None, :]
        g = np.zeros_like(fa)
        g[uva] = fa[uva]
        g[uvb] += fb[uvb]
        return float(np.linalg.norm(g[uva | uvb]))

    def init_guess_by_1e(self, mol=None):
        mol = mol or self.mol
        from ..lib.linalg import canonical_orth, eigh_gen
        h1e = self.get_hcore(mol)
        s1e = self.get_ovlp(mol)
        x = canonical_orth(s1e, self.lindep_thresh)
        e, c = eigh_gen(h1e, x)
        occ = self.get_occ(e, c)
        return self.make_rdm1(c, occ)

    def get_init_guess(self, mol=None, key=None):
        key = key or self.init_guess
        if key in ('hcore', '1e'):
            return self.init_guess_by_1e(mol)
        dm = SCF.get_init_guess(self, mol, key)
        dm = jnp.asarray(dm)
        if dm.ndim == 2:
            na, nb = self.mol.nelec
            ne = max(self.mol.nelectron, 1)
            dm = jnp.stack([dm * (na / ne), dm * (nb / ne)])
        return dm

    def spin_square(self, mo_coeff=None, mo_occ=None, s=None):
        na, nb = self.mol.nelec
        sz = 0.5 * (na - nb)
        return sz * (sz + 1), 2 * sz + 1
