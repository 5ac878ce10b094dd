"""k-point TDA for KRHF/KRKS (analog of reference pyscf/pbc/tdscf/krhf.py).

Zero-momentum-transfer (q=0) singlet excitations over the BZ mesh:

  A_{kia,k'jb} = delta_kk' delta_ij delta_ab (e_ka - e_ki)
                 + 2 (k i a | k' j b) - a_x (k i j | k' a b) [+ fxc]

The matvec builds the k-diagonal (non-hermitian) transition density,
runs it through the SAME FFT J/K engine as the ground state (with the
Ewald exxdiv probe removed — reference convention
pbc/tdscf/krhf.py:258: orbital energies and the response kernel both use
exxdiv=None), and projects back.  The complex Hermitian eigenproblem is
solved with the real Davidson by the standard doubling
[[Re A, -Im A], [Im A, Re A]].

Validation: nkpts=1 equals the molecular/supercell TDA; a 2x2x2 k-mesh
equals the Gamma-point supercell spectrum (tests/test_ktda.py).
"""
import numpy as np

from ...lib.linalg import davidson


def _jk_response(df, kpts, dm_t, AB=None, with_k=True):
    """FFT J/K of a NON-HERMITIAN k-diagonal transition density.

    The ground-state engine (pbc/df/fft.py get_jk_kpts) eigendecomposes
    the density — valid only for hermitian dm.  Here J keeps the complex
    transition density, and K uses the explicit low-rank factorization
    dm_t[k] = A_k @ B_k^H supplied in AB (occupied-rank columns)."""
    cell = df.cell
    mesh = df.mesh
    ngrid = int(np.prod(mesh))
    nk = len(kpts)
    ao_k = df._ao_on_grid_kpts()
    w = df.weight
    nao = cell.nao
    Gv = cell.get_Gv(mesh)
    G2 = np.einsum('ix,ix->i', Gv, Gv)
    coulG = np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30), 0.0)

    rho = np.zeros(ngrid, dtype=complex)
    for k in range(nk):
        dmao = ao_k[k] @ dm_t[k]
        rho += np.einsum('gi,gi->g', dmao, ao_k[k].conj())
    rho /= nk
    vr = np.fft.ifftn((coulG.reshape(mesh)
                       * np.fft.fftn(rho.reshape(mesh)))).ravel()
    vj = np.stack([w * np.einsum('gi,g,gj->ij', ao_k[k].conj(), vr,
                                 ao_k[k]) for k in range(nk)])
    if not with_k:
        return vj, None

    coords = np.asarray(df.grids_coords)
    vk = np.zeros((nk, nao, nao), dtype=complex)
    for k2 in range(nk):
        A, B = AB[k2]
        psiA = ao_k[k2] @ A                       # (ngrid, nr)
        psiB = ao_k[k2] @ B
        for k in range(nk):
            q = kpts[k2] - kpts[k]
            Gq2 = np.einsum('ix,ix->i', Gv + q, Gv + q)
            coulGq = np.where(Gq2 > 1e-12,
                              4.0 * np.pi / np.maximum(Gq2, 1e-30),
                              0.0).reshape(*mesh, 1)
            phase = np.exp(-1j * coords @ q)
            for o in range(psiA.shape[1]):
                uA = ao_k[k].conj() * (psiA[:, o] * phase)[:, None]
                uB = ao_k[k].conj() * (psiB[:, o] * phase)[:, None]
                uBG = np.fft.fftn(uB.reshape(*mesh, -1), axes=(0, 1, 2))
                vuB = np.fft.ifftn(uBG * coulGq,
                                   axes=(0, 1, 2)).reshape(ngrid, -1)
                vk[k] += (w / nk) * uA.T @ vuB.conj()
    return vj, vk


def mo_energy_exxdiv_none(mf):
    """Orbital energies recomputed without the Ewald exxdiv shift
    (reference pbc/scf/addons.py mo_energy_with_exxdiv_none)."""
    if mf.exxdiv is None:
        return [np.asarray(e) for e in mf.mo_energy]
    dm = mf.make_rdm1()
    h1 = np.asarray(mf.get_hcore())
    vj, vk = mf.with_df.get_jk_kpts(dm, True, True)
    fock = h1 + np.asarray(vj) - 0.5 * np.asarray(vk)
    out = []
    for k in range(mf.nkpts):
        c = np.asarray(mf.mo_coeff[k])
        out.append(np.einsum('pi,pq,qi->i', c.conj(), fock[k], c).real)
    return out


class KTDA:
    """Tamm-Dancoff singlet excitations on a k-point mesh."""

    nstates = 3
    conv_tol = 1e-7
    max_cycle = 80

    def __init__(self, mf):
        self._scf = mf
        self.cell = mf.cell
        self.e = None
        self.xy = None

    def _hybrid(self):
        mf = self._scf
        if hasattr(mf, 'xc'):
            from ...dft import xc as xc_mod
            return float(xc_mod.hybrid_coeff(mf.xc))
        return 1.0

    def gen_matvec(self):
        mf = self._scf
        nk = mf.nkpts
        mo_e = mo_energy_exxdiv_none(mf)
        occ = [np.asarray(o) > 0 for o in mf.mo_occ]
        Co = [np.asarray(mf.mo_coeff[k])[:, occ[k]] for k in range(nk)]
        Cv = [np.asarray(mf.mo_coeff[k])[:, ~occ[k]] for k in range(nk)]
        eo = [mo_e[k][occ[k]] for k in range(nk)]
        ev = [mo_e[k][~occ[k]] for k in range(nk)]
        sizes = [len(eo[k]) * len(ev[k]) for k in range(nk)]
        offs = np.concatenate([[0], np.cumsum(sizes)])
        ntot = int(offs[-1])
        hyb = self._hybrid()
        isks = hasattr(mf, 'xc')

        e_ia = np.concatenate(
            [(ev[k][None, :] - eo[k][:, None]).ravel() for k in range(nk)])

        def unpack(x):
            return [x[offs[k]:offs[k + 1]].reshape(len(eo[k]), len(ev[k]))
                    for k in range(nk)]

        def matvec(x):
            x = np.asarray(x)
            xs = unpack(x)
            # transition density per k (non-hermitian, complex),
            # with its low-rank factors for the exchange response
            dmov = np.stack([Co[k] @ xs[k] @ Cv[k].conj().T
                             for k in range(nk)])
            AB = [(Co[k], Cv[k] @ xs[k].conj().T) for k in range(nk)]
            vj, vk_resp = _jk_response(mf.with_df, mf.kpts, dmov,
                                       AB, with_k=hyb != 0.0)
            v = 2.0 * np.asarray(vj)
            if hyb != 0.0:
                v = v - hyb * np.asarray(vk_resp)
            if isks:
                v = v + self._fxc_response(dmov)
            out = np.empty_like(x)
            for k in range(nk):
                blk = Co[k].conj().T @ v[k] @ Cv[k]
                out[offs[k]:offs[k + 1]] = (
                    xs[k] * (ev[k][None, :] - eo[k][:, None]) + blk).ravel()
            return out

        return matvec, e_ia, unpack, ntot

    def _vxc_of(self, dm):
        """Bare XC matrix: strip J (and the hybrid K already folded into
        get_veff) from the KS effective potential."""
        mf = self._scf
        veff = np.asarray(mf.get_veff(dm))
        vj = np.asarray(mf.with_df.get_jk_kpts(dm, True, False)[0])
        vxc = veff - vj
        hyb = self._hybrid()
        if hyb != 0.0:
            _, vk = mf.get_jk(dm)
            vxc = vxc + 0.5 * hyb * np.asarray(vk)
        return vxc

    def _fxc_response(self, dmov):
        """XC kernel contribution, central difference of Vxc along the
        (hermitized) transition density."""
        mf = self._scf
        dm0 = np.asarray(mf.make_rdm1()).astype(complex)
        out = np.zeros_like(dmov)
        h = 1e-4
        dH = 0.5 * (dmov + dmov.conj().transpose(0, 2, 1))
        dM = -0.5j * (dmov - dmov.conj().transpose(0, 2, 1))
        for part, mul in ((dH, 1.0), (dM, 1.0j)):
            if not np.abs(part).max() > 0:
                continue
            vp = self._vxc_of(dm0 + h * part)
            vm = self._vxc_of(dm0 - h * part)
            out = out + mul * (vp - vm) / (2.0 * h)
        return out

    def kernel(self, nstates=None):
        n = nstates or self.nstates
        matvec_c, e_ia, unpack, ntot = self.gen_matvec()

        # complex Hermitian -> doubled real symmetric
        def matvec(z):
            z = np.asarray(z)
            y = matvec_c(z[:ntot] + 1j * z[ntot:])
            return np.concatenate([y.real, y.imag])

        hdiag = np.concatenate([e_ia, e_ia])
        n = min(n, ntot)
        nseek = min(2 * n, 2 * ntot)   # each physical root appears twice
        x0 = np.zeros((nseek, 2 * ntot))
        order = np.argsort(e_ia)
        for i in range(nseek):
            # real and imag slots of the doubled space are independent guesses
            x0[i, (i % 2) * ntot + order[i // 2]] = 1.0
        w, v, conv = davidson(matvec, x0, neig=nseek, tol=self.conv_tol,
                              hdiag=hdiag, max_cycle=self.max_cycle)
        w = np.asarray(w)
        # deduplicate the doubled spectrum
        es, xys = [], []
        for i in range(len(w)):
            if es and abs(w[i] - es[-1]) < 1e-9:
                continue
            es.append(w[i])
            vec = np.asarray(v[i])
            xys.append(unpack(vec[:ntot] + 1j * vec[ntot:]))
            if len(es) == n:
                break
        self.e = np.asarray(es)
        self.xy = xys
        return self.e

    run = kernel
