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


class KGDF(object):
    """k-point Gaussian density fitting with the analytic-FT 3c builder.

    Replaces the reference's lattice-summed per-k-pair builders
    (pbc/df/df.py GDF:125 + rsdf_builder.py:60 _RSGDFBuilder: C real-space
    short-range fill + G-space long-range) with one G-space assembly over
    the analytic Fourier transform of AO pairs (ops/integrals/ft_ao.py):

      j2c(q)[P,Q]     = (1/vol) sum_G conj(X_P) coulG X_Q,
                        X_P = FT(chi_P)(G+q)
      j3c(ki,kj)[P,mn] = (1/vol) sum_G conj(X_P) coulG A_mn(G+q),
                        A = sum_L e^{i kj.L} FT(mu, nu(.-L))(G+q)
      B(ki,kj) = chol(j2c)^-1 j3c          (the per-k-pair cderi)

    so 4c integrals factor as (mu ki, nu kj | la kj, si ki)
    = sum_x B[x,mn] conj(B[x,sl]).  Exact to the G-cutoff for pseudized
    densities; no FFT-mesh collocation anywhere.  All heavy pieces are
    (nG x N) GEMMs.
    """

    def __init__(self, cell, kpts=None, auxbasis=None):
        from .fft import KFFTDF
        self.cell = cell
        self.kpts = (np.zeros((1, 3)) if kpts is None
                     else np.asarray(kpts).reshape(-1, 3))
        self.auxbasis = auxbasis
        self.auxcell = None
        self._cderi_k = None       # dict (i, j) -> (naux, nao, nao)
        # hcore/ovlp/pp still come from the FFT machinery
        self._fft = KFFTDF(cell, self.kpts)

    @property
    def nkpts(self):
        return len(self.kpts)

    def get_ovlp_kpts(self):
        return self._fft.get_ovlp_kpts()

    def get_hcore_kpts(self):
        return self._fft.get_hcore_kpts()

    cholesky_tol = 1e-10     # CD truncation of the exact pair Coulomb

    def build(self):
        cell = self.cell
        from ...ops.integrals.ft_ao import ft_ao, ft_aopair_kpt
        vol = cell.vol
        Gv = np.asarray(cell.get_Gv(cell.mesh))
        kpts = self.kpts
        nk = len(kpts)
        cderi = {}
        if self.auxbasis is None:
            # default: Cholesky-decomposition DF per momentum transfer q
            # (the k-point generalization of the Γ-GDF CD path). The
            # sqrt-Coulomb-weighted pair FTs of EVERY (ki, kj) pair with
            # the same q are stacked; a pivoted Cholesky of their exact
            # Coulomb overlap M = a^H a gives factors with
            # (m ki n kj | l kj s ki) = sum_x B[x,mn] conj(B[x,sl])
            # exact to cholesky_tol (no Gaussian-aux incompleteness —
            # an ETB fit plateaus at ~1e-3 in Fock elements for
            # diamond/gth-szv regardless of radial enrichment).
            qpairs = {}
            for i in range(nk):
                for j in range(nk):
                    qkey = tuple(np.round(kpts[j] - kpts[i], 9))
                    qpairs.setdefault(qkey, []).append((i, j))
            for qkey, pairs in qpairs.items():
                q = np.asarray(qkey)
                Gq = Gv + q[None, :]
                G2 = np.einsum('gx,gx->g', Gq, Gq)
                coul = np.where(G2 > 1e-10, 4.0 * np.pi
                                / np.maximum(G2, 1e-30), 0.0)
                sq = np.sqrt(coul / vol)
                acols = []
                for (i, j) in pairs:
                    A = np.asarray(ft_aopair_kpt(cell, Gq, kpts[j]))
                    nao = A.shape[1]
                    acols.append(sq[:, None] * A.reshape(len(Gq), -1))
                a_all = np.concatenate(acols, axis=1)   # (nG, npair*nao^2)
                M = a_all.conj().T @ a_all              # PSD Hermitian
                V = _pivoted_cholesky_c(M, self.cholesky_tol)
                for ip, (i, j) in enumerate(pairs):
                    blk = V[:, ip * nao * nao:(ip + 1) * nao * nao]
                    cderi[(i, j)] = blk.reshape(-1, nao, nao)
            self._cderi_k = cderi
            return self
        if self.auxcell is None:
            if isinstance(self.auxbasis, str) and self.auxbasis != 'etb':
                from ..gto.cell import Cell
                self.auxcell = Cell(
                    atom=list(zip(cell.raw_symbols,
                                  np.asarray(cell.coords))),
                    a=cell.lattice_vectors_, unit='bohr',
                    basis=self.auxbasis, mesh=cell.mesh,
                    precision=cell.precision, verbose=0).build()
            else:
                self.auxcell = make_etb_aux_cell(cell)
        # unique momentum transfers q = kj - ki; pair FT is the heavy
        # piece and depends on (q, kj) so loop pairs but reuse j2c per q
        j2c_cache = {}
        for i in range(nk):
            for j in range(nk):
                q = kpts[j] - kpts[i]
                Gq = Gv + q[None, :]
                G2 = np.einsum('gx,gx->g', Gq, Gq)
                coul = np.where(G2 > 1e-10, 4.0 * np.pi
                                / np.maximum(G2, 1e-30), 0.0)
                qkey = tuple(np.round(q, 9))
                if qkey not in j2c_cache:
                    X = ft_ao(self.auxcell, Gq)          # (nG, naux)
                    j2c = (X.conj().T * coul[None, :]) @ X / vol
                    w, V = np.linalg.eigh(j2c)
                    keep = w > 1e-9 * max(w.max(), 1e-30)
                    # j2c^(-1/2) with near-null aux directions dropped
                    Xinv = (V[:, keep] / np.sqrt(w[keep])).conj().T
                    j2c_cache[qkey] = (X, Xinv)
                X, Xinv = j2c_cache[qkey]
                A = ft_aopair_kpt(cell, Gq, kpts[j])      # (nG, nao, nao)
                nao = A.shape[1]
                j3c = np.einsum('gp,g,gmn->pmn', X.conj(), coul,
                                A.reshape(len(Gq), -1).reshape(
                                    len(Gq), nao, nao)) / vol
                B = np.tensordot(Xinv, j3c, axes=(1, 0))
                cderi[(i, j)] = B
        self._cderi_k = cderi
        return self

    @property
    def cderi_k(self):
        if self._cderi_k is None:
            self.build()
        return self._cderi_k

    def get_jk_kpts(self, dm_kpts, with_j=True, with_k=True):
        """DF J/K over the k mesh from the per-pair cderi."""
        cderi = self.cderi_k
        dm = np.asarray(dm_kpts)
        nk, nao = dm.shape[0], dm.shape[-1]
        vj = vk = None
        if with_j:
            rho = 0
            for k in range(nk):
                rho = rho + np.einsum('xsl,sl->x', cderi[(k, k)].conj(),
                                      dm[k])
            rho = rho / nk
            vj = np.stack([np.einsum('xmn,x->mn', cderi[(k, k)], rho)
                           for k in range(nk)])
        if with_k:
            vk = np.zeros((nk, nao, nao), dtype=complex)
            for i in range(nk):
                acc = 0
                for j in range(nk):
                    B = cderi[(i, j)]                  # (x, mu, nu)
                    BD = np.einsum('xmn,nl->xml', B, dm[j])
                    acc = acc + np.einsum('xml,xsl->ms', BD, B.conj())
                vk[i] = acc / nk
        return vj, vk


def _pivoted_cholesky_c(M, tol):
    """Pivoted Cholesky of a Hermitian PSD complex matrix: returns
    V (rank, n) with M ~= V^H V (so M_{mn,sl} = sum_x conj(V[x,mn]) V[x,sl])."""
    M = M.copy()
    n = M.shape[0]
    d = np.real(np.diagonal(M)).copy()
    Vs = []
    for _ in range(n):
        j = int(np.argmax(d))
        if d[j] <= tol:
            break
        row = M[j].copy()
        for V in Vs:
            row -= np.conj(V[j]) * V
        V = row / np.sqrt(d[j])
        Vs.append(V)
        d = d - (V.conj() * V).real
        d[j] = 0.0
    return (np.stack(Vs) if Vs
            else np.zeros((0, n), dtype=complex))
