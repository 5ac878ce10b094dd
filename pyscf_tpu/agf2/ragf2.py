"""Restricted AGF2: auxiliary-space second-order Green's function theory.

Reference analog: pyscf/agf2/ragf2.py (kernel:39, build_se_part:121,
fock_loop:273, energies:346-430) with the C moment builder
lib/agf2/ragf2.c AGF2ee_vv_vev_islice replaced by two dense GEMM-shaped
einsums over the (x, i, j, a) quasi-MO integrals:

    vv_xy  = sum_ija [2 (xi|ja) - (xj|ia)] (yi|ja)
    vev_xy = sum_ija [2 (xi|ja) - (xj|ia)] (e_i + e_j - e_a) (yi|ja)

followed by the moment-conserving Cholesky compression. The Dyson problem
is the dense eigenvalue problem of the extended Fock matrix
[[F, V], [V+, diag(e)]]; the chemical potential is tuned by the same
binary-search + scalar-shift optimization as the reference (chempot.py).
"""
import numpy as np
import jax.numpy as jnp
from scipy import optimize

from ..ao2mo import full as ao2mo_full


class Aux:
    """Auxiliary space: poles `energy` (naux,) + couplings (nphys, naux)."""

    def __init__(self, energy, coupling, chempot=0.0):
        self.energy = np.asarray(energy, dtype=float)
        self.coupling = np.asarray(coupling, dtype=float)
        self.chempot = chempot

    nphys = property(lambda self: self.coupling.shape[0])
    naux = property(lambda self: self.coupling.shape[1])

    def get_occupied(self):
        m = self.energy < self.chempot
        return Aux(self.energy[m], self.coupling[:, m], self.chempot)

    def get_virtual(self):
        m = self.energy >= self.chempot
        return Aux(self.energy[m], self.coupling[:, m], self.chempot)

    def eig(self, phys, chempot=0.0):
        n, na = self.nphys, self.naux
        h = np.zeros((n + na, n + na))
        h[:n, :n] = phys
        h[:n, n:] = self.coupling
        h[n:, :n] = self.coupling.T
        h[n:, n:] = np.diag(self.energy - chempot)
        return np.linalg.eigh(h)

    def remove_uncoupled(self, tol=1e-11):
        norm = np.linalg.norm(self.coupling, axis=0)
        m = norm >= tol
        return Aux(self.energy[m], self.coupling[:, m], self.chempot)


def combine(a, b, chempot=None):
    return Aux(np.concatenate([a.energy, b.energy]),
               np.concatenate([a.coupling, b.coupling], axis=1),
               a.chempot if chempot is None else chempot)


def binsearch_chempot(w, v, nphys, nelec, occupancy=2):
    nmo = v.shape[-1]
    sum0 = sum1 = 0.0
    for i in range(nmo):
        n = occupancy * float(v[:nphys, i] @ v[:nphys, i])
        sum0, sum1 = sum1, sum1 + n
        if i > 0 and sum0 <= nelec <= sum1:
            break
    if abs(sum0 - nelec) < abs(sum1 - nelec):
        homo, error = i - 1, nelec - sum0
    else:
        homo, error = i, nelec - sum1
    chempot = 0.5 * (w[homo] + w[homo + 1])
    return chempot, error


def minimize_chempot(se, fock, nelec, x0=0.0, tol=1e-6, maxiter=200):
    """Shift the auxiliary energies so the GF holds nelec electrons
    (reference chempot.minimize_chempot, TNC on the squared error)."""

    def objective(x):
        w, v = se.eig(fock, chempot=float(x))
        _, err = binsearch_chempot(w, v, se.nphys, nelec)
        return err ** 2

    opt = optimize.minimize(objective, x0=x0, method='TNC',
                            options={'maxfun': maxiter, 'ftol': tol ** 2,
                                     'xtol': tol ** 2, 'gtol': tol ** 2})
    se = Aux(se.energy - float(opt.x), se.coupling, se.chempot)
    w, v = se.eig(fock)
    se.chempot = binsearch_chempot(w, v, se.nphys, nelec)[0]
    return se, opt


def _cholesky_build(vv, vev, eps=1e-16):
    nmo = vv.shape[0]
    try:
        b = np.linalg.cholesky(vv).T
    except np.linalg.LinAlgError:
        w, v = np.linalg.eigh(vv)
        w[w < eps] = eps
        b = np.linalg.cholesky((v * w) @ v.T).T
    b_inv = np.linalg.inv(b)
    e, c = np.linalg.eigh(b_inv.T @ vev @ b_inv)
    c = b.T @ c[:nmo]
    return e, c


class RAGF2:
    """Restricted AGF2 (reference ragf2.RAGF2; default moment order)."""

    def __init__(self, mf, frozen=None):
        if frozen:
            raise NotImplementedError('frozen core in AGF2')
        self._scf = mf
        self.mol = mf.mol
        self.mo_energy = np.asarray(mf.mo_energy)
        self.mo_coeff = np.asarray(mf.mo_coeff)
        self.nmo = self.mo_energy.size
        self.nocc = self.mol.nelectron // 2
        self.conv_tol = 1e-7
        self.conv_tol_rdm1 = 1e-8
        self.conv_tol_nelec = 1e-6
        self.max_cycle = 50
        self.max_cycle_outer = 20
        self.max_cycle_inner = 50
        self.weight_tol = 1e-11
        self.diis_space = 8
        self.converged = False
        self.e_1b = None
        self.e_2b = None
        self.e_init = None
        self.gf = None
        self.se = None
        # MO integrals and core hamiltonian. With a density-fitted mean
        # field the MO ERIs come from the DF factorization (reference
        # agf2/dfragf2.py keeps B factors; at AGF2's O(nmo^5) moment cost
        # the assembled (nmo^4) tensor is the cheaper HBM-resident form).
        mo = self.mo_coeff
        nmo = self.nmo
        with_df = getattr(mf, 'with_df', None)
        if with_df is not None:
            self.eri = np.asarray(with_df.ao2mo(mo))
        else:
            self.eri = np.asarray(ao2mo_full(self.mol, mo)).reshape(
                nmo, nmo, nmo, nmo)
        self.h1e = mo.T @ np.asarray(mf.get_hcore()) @ mo
        self.e_hf = float(mf.e_tot)

    # ------------------------------------------------------------------
    def init_gf(self):
        chempot = 0.5 * (self.mo_energy[self.nocc - 1]
                         + self.mo_energy[self.nocc])
        return Aux(self.mo_energy, np.eye(self.nmo), chempot)

    def build_se_part(self, gf_occ, gf_vir):
        """Occupied (2h1p) self-energy part; swap args for virtual."""
        ci, ei = gf_occ.coupling, gf_occ.energy
        ca, ea = gf_vir.coupling, gf_vir.energy
        # quasi-MO integrals (x i | j a)
        q = jnp.einsum('xpqr,pi,qj,ra->xija', jnp.asarray(self.eri),
                       jnp.asarray(ci), jnp.asarray(ci), jnp.asarray(ca),
                       optimize=True)
        qs = q.transpose(0, 2, 1, 3)
        two = 2.0 * q - qs
        e_ija = (ei[:, None, None] + ei[None, :, None] - ea[None, None, :])
        vv = np.asarray(jnp.einsum('xija,yija->xy', two, q, optimize=True))
        vev = np.asarray(jnp.einsum('xija,ija,yija->xy', two,
                                    jnp.asarray(e_ija), q, optimize=True))
        e, c = _cholesky_build(vv, vev)
        se = Aux(e, c, chempot=gf_occ.chempot)
        return se.remove_uncoupled(self.weight_tol)

    def build_se(self, gf):
        se_occ = self.build_se_part(gf.get_occupied(), gf.get_virtual())
        se_vir = self.build_se_part(gf.get_virtual(), gf.get_occupied())
        return combine(se_occ, se_vir, chempot=gf.chempot)

    def make_rdm1(self, gf):
        occ = gf.get_occupied().coupling
        return 2.0 * occ @ occ.T

    def get_fock(self, gf=None, rdm1=None):
        if rdm1 is None:
            rdm1 = self.make_rdm1(gf)
        vj = np.einsum('pqrs,sr->pq', self.eri, rdm1, optimize=True)
        vk = np.einsum('psrq,sr->pq', self.eri, rdm1, optimize=True)
        return self.h1e + vj - 0.5 * vk

    def fock_loop(self, gf, se):
        from ..lib.diis import DIIS
        nelec = self.nocc * 2
        diis = DIIS(space=self.diis_space)
        fock = self.get_fock(gf)
        rdm1_prev = 0.0
        converged = False
        nerr = derr = 1.0
        for it1 in range(self.max_cycle_outer):
            se, _ = minimize_chempot(se, fock, nelec,
                                     tol=self.conv_tol_nelec,
                                     maxiter=self.max_cycle_inner)
            for it2 in range(self.max_cycle_inner):
                w, v = se.eig(fock)
                se.chempot, nerr = binsearch_chempot(w, v, self.nmo, nelec)
                gf = Aux(w, v[:self.nmo], chempot=se.chempot)
                rdm1 = self.make_rdm1(gf)
                fock = self.get_fock(rdm1=rdm1)
                fock = np.asarray(diis.update(
                    jnp.asarray(fock),
                    jnp.asarray(rdm1 - np.asarray(rdm1_prev))))
                if it2 > 0:
                    derr = np.max(np.abs(rdm1 - rdm1_prev))
                    if derr < self.conv_tol_rdm1:
                        break
                rdm1_prev = rdm1.copy()
            if derr < self.conv_tol_rdm1 and abs(nerr) < self.conv_tol_nelec:
                converged = True
                break
        return gf, se, converged

    # ------------------------------------------------------------------
    def energy_1body(self, gf):
        rdm1 = self.make_rdm1(gf)
        fock = self.get_fock(rdm1=rdm1)
        return 0.5 * np.sum(rdm1 * (self.h1e + fock)) + self.mol.energy_nuc()

    def energy_2body(self, gf, se):
        gf_occ = gf.get_occupied()
        se_vir = se.get_virtual()
        d = gf_occ.energy[:, None] - se_vir.energy[None, :]   # (l, k)
        m = gf_occ.coupling.T @ se_vir.coupling               # (l, k)
        # sum_l sum_k [sum_x v_xl v_xk]^2 / (e_l - e_k) * 2
        return 2.0 * float(np.sum(m * m / d))

    def energy_mp2(self, se):
        occ = self.mo_energy < se.chempot
        se_vir = se.get_virtual()
        vxk = se_vir.coupling[occ]
        d = self.mo_energy[occ][:, None] - se_vir.energy[None, :]
        return float(np.sum(vxk * vxk / d))

    # ------------------------------------------------------------------
    def kernel(self):
        from ..lib.diis import DIIS
        gf = self.init_gf()
        se = self.build_se(gf)
        self.e_init = self.energy_mp2(se)
        diis = DIIS(space=self.diis_space)
        e_prev = 0.0
        for it in range(self.max_cycle):
            gf, se, fock_conv = self.fock_loop(gf, se)
            e_1b = self.energy_1body(gf)
            se = self.build_se(gf)
            # DIIS on the separated occupied/virtual moments; the error
            # vector is the raw-moment difference between cycles, which
            # vanishes exactly at the AGF2 fixed point
            se_o, se_v = se.get_occupied(), se.get_virtual()
            raw = np.array([
                se_o.coupling @ se_o.coupling.T,
                se_v.coupling @ se_v.coupling.T,
                (se_o.coupling * se_o.energy[None]) @ se_o.coupling.T,
                (se_v.coupling * se_v.energy[None]) @ se_v.coupling.T])
            raw_prev = getattr(self, '_diis_prev_raw', raw)
            self._diis_prev_raw = raw.copy()
            dat = np.asarray(diis.update(jnp.asarray(raw),
                                         jnp.asarray(raw - raw_prev)))
            se_o2 = Aux(*_cholesky_build(dat[0], dat[2]), chempot=se.chempot)
            se_v2 = Aux(*_cholesky_build(dat[1], dat[3]), chempot=se.chempot)
            se = combine(se_o2, se_v2)
            e_2b = self.energy_2body(gf, se)
            e_tot = e_1b + e_2b
            if self.mol.verbose >= 4:
                print(f'AGF2 cycle {it+1}: E = {e_tot:.12f} '
                      f'dE = {e_tot - e_prev:.3e}')
            if abs(e_tot - e_prev) < self.conv_tol:
                self.converged = True
                break
            e_prev = e_tot
        self.e_1b, self.e_2b = e_1b, e_2b
        self.e_tot = e_1b + e_2b
        self.e_corr = self.e_tot - self.e_hf
        self.gf, self.se = gf, se
        return self.e_tot

    run = kernel

    # ------------------------------------------------------------------
    def ipagf2(self, nroots=3):
        gf_occ = self.gf.get_occupied()
        order = np.argsort(gf_occ.energy)[::-1][:nroots]
        e_ip = [-gf_occ.energy[i] for i in order]
        v_ip = [gf_occ.coupling[:, i] for i in order]
        return e_ip, v_ip

    def eaagf2(self, nroots=3):
        gf_vir = self.gf.get_virtual()
        order = np.argsort(gf_vir.energy)[:nroots]
        e_ea = [gf_vir.energy[i] for i in order]
        v_ea = [gf_vir.coupling[:, i] for i in order]
        return e_ea, v_ea
