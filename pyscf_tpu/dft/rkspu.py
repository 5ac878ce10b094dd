"""DFT+U (rotationally invariant, simplified Dudarev form) for RKS.

Reference analog: pyscf/dft/rkspu.py (get_veff:36, linear_response_u:276).
Local orbitals are Lowdin-orthogonalized minao projections; for each
Hubbard shell with projector C and local density P = (SC)^+ dm (SC):

  E_U  = (U/2) [Tr P - 1/2 Tr P^2]
  V_U  = SC [(U/2)(1 - P)] (SC)^+

The linear-response U (Cococcioni & de Gironcoli, PRB 71, 035105)
perturbs the shell with an alpha potential and compares the bare and
self-consistent occupancy responses: U = 1/chi0 - 1/chif.
"""
import numpy as np
import jax.numpy as jnp

from ..lib.parameters import HARTREE2EV
from .rks import RKS


def _minao_lo(mol, ao_labels, u_vals):
    """[(C_loc, U_au)] — one orthogonal local-orbital block per ATOM per
    pattern (reference rkspu.py _set_U groups by atom), U in eV -> au."""
    from ..mcscf.avas import minao_labels
    from ..ops.integrals.int1e import int1e_ovlp_cross
    from ..lo.iao import _vec_lowdin
    ref, labels = minao_labels(mol)
    s1 = np.asarray(mol.intor('int1e_ovlp'))
    s12 = np.asarray(int1e_ovlp_cross(mol, ref))
    c_all = np.linalg.solve(s1, s12)            # projected minao AOs
    c_all = _vec_lowdin(c_all, s1)
    atom_of = np.array([int(lb.split()[0]) for lb in labels])
    groups = []
    for pat, val in zip(ao_labels, u_vals):
        sel = np.where([pat in lb for lb in labels])[0]
        if len(sel) == 0:
            raise ValueError(f'no minao AO matches {pat!r}')
        for ia in np.unique(atom_of[sel]):
            cols = sel[atom_of[sel] == ia]
            groups.append((c_all[:, cols], float(val) / HARTREE2EV))
    return groups


class RKSpU(RKS):
    """RKS with Hubbard U corrections on selected local shells."""

    _fused_kind = None          # V_U couples through get_veff: host loop

    def __init__(self, mol, xc='lda,vwn', U_idx=(), U_val=(), alpha=None):
        RKS.__init__(self, mol, xc=xc)
        self.U_idx = list(U_idx)
        self.U_val = list(U_val)
        self.alpha = alpha
        self._C_loc = None

    def _projectors(self):
        """[(C_loc, U_au)] per atom-shell; U_val is taken in eV
        (reference rkspu.py _set_U:168)."""
        if self._C_loc is None:
            self._C_loc = _minao_lo(self.mol, self.U_idx, self.U_val)
        return self._C_loc

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        mol = mol or self.mol
        vxc = RKS.get_veff(self, mol, dm, dm_last, vhf_last)
        s = np.asarray(mol.intor('int1e_ovlp'))
        dm_np = np.asarray(dm)
        e_u = 0.0
        v_u = np.zeros_like(dm_np)
        for c_loc, val in self._projectors():
            sc = s @ c_loc
            p = sc.T @ dm_np @ sc
            vloc = (np.eye(p.shape[0]) - p) * (0.5 * val)
            if self.alpha is not None:
                e_u += self.alpha * np.trace(p)
                vloc = vloc + np.eye(p.shape[0]) * self.alpha
            v_u += sc @ vloc @ sc.T
            e_u += (0.5 * val) * (np.trace(p) - 0.5 * np.trace(p @ p))
        self._e_u = float(e_u)
        self._exc = self._exc + float(e_u)
        return vxc + jnp.asarray(v_u)

    def local_occupancy(self, dm=None):
        """Total Tr P over all Hubbard shells."""
        dm = np.asarray(dm if dm is not None else self.make_rdm1())
        s = np.asarray(self.mol.intor('int1e_ovlp'))
        out = 0.0
        for c_loc, _val in self._projectors():
            sc = s @ c_loc
            out += float(np.trace(sc.T @ dm @ sc))
        return out


def linear_response_u(mf, alphalist=(0.02, 0.05, 0.08)):
    """Self-consistent linear-response Hubbard U (eV perturbations)."""
    if not mf.converged:
        mf.kernel()
    bare_dm = np.asarray(mf.make_rdm1())
    alphas = np.asarray(alphalist, dtype=float)
    alphas = np.append(-alphas[::-1], alphas)
    bare_occ, final_occ = [], []
    import copy
    for a in alphas:
        mf2 = copy.copy(mf)
        mf2.alpha = float(a) / HARTREE2EV
        mf2.converged = False
        mf2.kernel(dm0=bare_dm)
        final_occ.append(mf2.local_occupancy())
        # bare (one-shot) response: diagonalize the alpha-perturbed Fock
        # built from the unperturbed density
        h1e = np.asarray(mf2.get_hcore())
        s1e = np.asarray(mf2.mol.intor('int1e_ovlp'))
        vhf = np.asarray(mf2.get_veff(mf2.mol, bare_dm))
        import scipy.linalg
        e, c = scipy.linalg.eigh(h1e + vhf, s1e)
        occ = np.zeros(len(e))
        occ[:mf2.mol.nelectron // 2] = 2.0
        dm1 = (c * occ[None, :]) @ c.T
        bare_occ.append(mf2.local_occupancy(dm1))
    chi0 = np.polyfit(alphas, bare_occ, 1)[0]
    chif = np.polyfit(alphas, final_occ, 1)[0]
    return 1.0 / chi0 - 1.0 / chif
