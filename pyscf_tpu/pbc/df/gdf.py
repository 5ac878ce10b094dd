"""Gaussian density fitting for periodic cells (Γ point).

Analog of reference pbc/df/df.py (GDF:125) + rsdf_builder.py:60: the
3-center integrals (μν|P) under the periodic Coulomb kernel are built by
plane-wave projection on the FFT mesh,

    (f|g) = (1/vol) Σ_G f̂(G)* coulG(G) ĝ(G),   f̂ = w · FFT(f),

which is exact to mesh resolution for the smooth GTH-pseudized densities
(the reference splits short-range lattice sums + long-range FT; with
pseudopotentials the full integral converges directly on the mesh).
The result is a dense cderi B[P, i, j] with (ij|kl) ≈ Σ_P B_Pij B_Pkl —
the same MXU-friendly DF-JK contraction path as the molecular code, which
unlocks the fused one-dispatch SCF driver for periodic systems.
G = 0 is excluded (neutralized background; Madelung/exxdiv handled by the
SCF layer, reference pbc/df/df_jk.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .fft import FFTDF, eval_ao_periodic


def make_etb_aux_cell(cell, beta=1.7):
    """Even-tempered fitting basis from the orbital basis (analog of
    reference pyscf/df/addons.py aug_etb_for_dfbasis)."""
    from ..gto.cell import Cell
    import math
    basis = {}
    for symb in set(cell.elements_):
        # collect (l, exps) of this element's shells
        shells = {}
        for l, g in cell.shell_groups.items():
            for s in range(g.nshl):
                ia = g.atom_ids[s]
                if cell.elements_[ia] != symb:
                    continue
                e = g.exps[s][g.coeffs[s] != 0]
                shells.setdefault(l, []).extend(e.tolist())
        lmax = max(shells)
        bas = []
        for laux in range(2 * lmax + 1):
            emins, emaxs = [], []
            for l1, e1 in shells.items():
                for l2, e2 in shells.items():
                    if not (abs(l1 - l2) <= laux <= l1 + l2):
                        continue
                    emins.append(2.0 * min(e1) * min(e2) / (min(e1) + min(e2)))
                    emaxs.append(2.0 * (max(e1) + max(e2)))
            if not emins:
                continue
            emin, emax = 0.5 * min(emins), 2.0 * max(emaxs)
            n = max(1, int(math.ceil(math.log(emax / emin) / math.log(beta))))
            for i in range(n):
                bas.append([laux, [emin * beta ** i, 1.0]])
        basis[symb] = bas
    aux = Cell(atom=list(zip(cell.raw_symbols, np.asarray(cell.coords))),
               a=cell.lattice_vectors_, unit='bohr', basis=basis,
               mesh=cell.mesh, precision=cell.precision, verbose=0)
    return aux.build()


class GDF(FFTDF):
    """Γ-point Gaussian density fitting; inherits hcore/grids from FFTDF."""

    def __init__(self, cell, auxbasis=None, kpts=None):
        super().__init__(cell, kpts=kpts)
        self.auxbasis = auxbasis
        self.auxcell = None
        self._cderi = None

    @property
    def naux(self):
        return getattr(self, '_naux', None) or self.auxcell.nao

    cholesky_tol = 1e-9      # pivoted-Cholesky truncation of the exact ERI

    def build(self):
        """Default: Cholesky-decomposition DF (CD). The plane-wave ERI is
        exact on the mesh; a pivoted Cholesky of the PSD matrix
        M[(ij),(kl)] = (ij|kl) gives a compact exact-to-tolerance cderi
        (the Γ-point analog of the reference's cholesky_eri,
        pyscf/df/incore.py:129, with the periodic Coulomb metric).
        An ETB Gaussian fitting basis (make_etb_aux_cell) is used instead
        when auxbasis is given explicitly."""
        cell = self.cell
        mesh = self.mesh
        ngrid = int(np.prod(mesh))
        w = self.weight
        vol = cell.vol
        Gv = cell.get_Gv(mesh)
        G2 = np.einsum('ix,ix->i', Gv, Gv)
        coulG = np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30),
                         0.0)
        coords = self.grids_coords
        ao = np.asarray(self._ao_on_grid(0))                # (ng, nao)
        nao = ao.shape[1]
        if self.auxbasis is None:
            # exact ERI in G space, then pivoted Cholesky
            pairG = np.fft.fftn(
                (ao[:, :, None] * ao[:, None, :]).reshape(*mesh, nao * nao),
                axes=(0, 1, 2)).reshape(ngrid, nao * nao)
            h = np.sqrt(np.maximum(coulG, 0.0) / vol)[:, None] * (w * pairG)
            M = (h.conj().T @ h).real                        # (nao^2, nao^2)
            B = _pivoted_cholesky(M, self.cholesky_tol)
            self._naux = B.shape[0]
            self._cderi = jnp.asarray(B.reshape(-1, nao, nao))
            return self
        if self.auxcell is None:
            if isinstance(self.auxbasis, str):
                from ..gto.cell import Cell
                self.auxcell = Cell(
                    atom=list(zip(cell.raw_symbols, np.asarray(cell.coords))),
                    a=cell.lattice_vectors_, unit='bohr',
                    basis=self.auxbasis, mesh=cell.mesh,
                    precision=cell.precision, verbose=0).build()
            else:
                self.auxcell = make_etb_aux_cell(cell)
        chi = np.asarray(eval_ao_periodic(self.auxcell, coords, 0))
        naux = chi.shape[1]
        chiG = np.fft.fftn(chi.reshape(*mesh, naux),
                           axes=(0, 1, 2)).reshape(ngrid, naux)
        vchiG = coulG[:, None] * chiG                        # coul * FFT(chi)
        # j2c[P,Q] = (w^2/vol) Σ_G conj(chiG_P) coul chiG_Q  (real sym)
        j2c = (w * w / vol) * (chiG.conj().T @ vchiG).real
        # j3c[i,j,P] = (w^2/vol) Σ_G conj(FFT(ao_i ao_j)) coul chiG_P
        j3c = np.empty((nao, nao, naux))
        for i in range(nao):
            pair = ao * ao[:, i][:, None]                    # (ng, nao)
            pairG = np.fft.fftn(pair.reshape(*mesh, nao),
                                axes=(0, 1, 2)).reshape(ngrid, nao)
            j3c[i] = (w * w / vol) * (pairG.conj().T @ vchiG).real
        # remove near-singular aux directions (ETB sets overlap heavily)
        wvals, vvecs = np.linalg.eigh(j2c)
        keep = wvals > 1e-9 * wvals.max()
        X = vvecs[:, keep] / np.sqrt(wvals[keep])            # j2c^(-1/2)
        B = np.einsum('ijP,PQ->Qij', j3c, X)
        self._naux = B.shape[0]
        self._cderi = jnp.asarray(B)
        return self

    @property
    def cderi(self):
        if self._cderi is None:
            self.build()
        return self._cderi

    def get_jk(self, dm, hermi=1, with_j=True, with_k=True):
        from ...df.df_jk import get_jk
        return get_jk(self, dm, with_j=with_j, with_k=with_k)


def _pivoted_cholesky(M, tol):
    """Pivoted Cholesky of a PSD matrix to absolute tolerance: returns
    L (rank, n) with M ~= L.T @ L."""
    M = M.copy()
    n = M.shape[0]
    d = np.diagonal(M).copy()
    perm = np.arange(n)
    Ls = []
    for it in range(n):
        j = np.argmax(d)
        if d[j] <= tol:
            break
        row = M[j] - sum(L[j] * L for L in Ls) if Ls else M[j].copy()
        L = row / np.sqrt(d[j])
        Ls.append(L)
        d = d - L * L
        d[j] = 0.0
    return np.stack(Ls) if Ls else np.zeros((0, n))
