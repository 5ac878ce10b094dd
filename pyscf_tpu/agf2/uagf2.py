"""Unrestricted AGF2 (auxiliary-space GF2 over two spin channels).

Reference analog: pyscf/agf2/uagf2.py (build_se_part:39, get_fock:134,
fock_loop:169, energy_1body:267, energy_2body:295) with the C moment
builder lib/agf2/uagf2.c AGF2uee_vv_vev_islice replaced by dense einsums
over same-spin (antisymmetrized) and opposite-spin quasi-MO integrals:

    vv_xy  = ss * sum_ija [(xi|ja)-(xj|ia)](yi|ja) + os * sum_iJA (xi|JA)(yi|JA)
    vev_xy = same with (e_i + e_j - e_a) weights

Each spin channel keeps its own Green's function / self-energy Aux pair;
the Fock matrices couple through the Coulomb term only. The chemical
potential is tuned per spin with occupancy 1.
"""
import numpy as np
import jax.numpy as jnp

from .ragf2 import (Aux, combine, binsearch_chempot, _cholesky_build,
                    RAGF2)
from scipy import optimize


def _minimize_chempot1(se, fock, nelec, tol=1e-6, maxiter=200):
    """Occupancy-1 analog of ragf2.minimize_chempot."""

    def objective(x):
        w, v = se.eig(fock, chempot=float(x))
        _, err = binsearch_chempot(w, v, se.nphys, nelec, occupancy=1)
        return err ** 2

    opt = optimize.minimize(objective, x0=0.0, method='TNC',
                            options={'maxfun': maxiter, 'ftol': tol ** 2,
                                     'xtol': tol ** 2, 'gtol': tol ** 2})
    se = Aux(se.energy - float(opt.x), se.coupling, se.chempot)
    w, v = se.eig(fock)
    se.chempot = binsearch_chempot(w, v, se.nphys, nelec, occupancy=1)[0]
    return se


class UAGF2:
    """Unrestricted AGF2 (reference agf2.UAGF2; default moment order).

    Accepts a (DF-)UHF mean field; with density fitting the MO ERIs come
    from the DF factorization (reference agf2/dfuagf2.py)."""

    def __init__(self, mf, frozen=None):
        if frozen:
            raise NotImplementedError('frozen core in AGF2')
        self._scf = mf
        self.mol = mf.mol
        self.mo_energy = np.asarray(mf.mo_energy)      # (2, nmo)
        self.mo_coeff = np.asarray(mf.mo_coeff)        # (2, nao, nmo)
        self.nmo = self.mo_energy.shape[1]
        self.nelec = tuple(self.mol.nelec)
        self.conv_tol = 1e-7
        self.conv_tol_rdm1 = 1e-8
        self.conv_tol_nelec = 1e-6
        self.max_cycle = 50
        self.max_cycle_outer = 20
        self.max_cycle_inner = 50
        self.weight_tol = 1e-11
        self.diis_space = 8
        self.converged = False
        self.e_1b = self.e_2b = self.e_init = None
        self.gf = self.se = None

        ca, cb = self.mo_coeff
        with_df = getattr(mf, 'with_df', None)
        if with_df is not None:
            self.eri_aa = np.asarray(with_df.ao2mo((ca, ca, ca, ca)))
            self.eri_ab = np.asarray(with_df.ao2mo((ca, ca, cb, cb)))
            self.eri_bb = np.asarray(with_df.ao2mo((cb, cb, cb, cb)))
        else:
            from ..ao2mo import general as ao2mo_general
            eri_ao = self.mol.intor('int2e')
            self.eri_aa = np.asarray(ao2mo_general(eri_ao, (ca, ca, ca, ca)))
            self.eri_ab = np.asarray(ao2mo_general(eri_ao, (ca, ca, cb, cb)))
            self.eri_bb = np.asarray(ao2mo_general(eri_ao, (cb, cb, cb, cb)))
        h = np.asarray(mf.get_hcore())
        self.h1e = (ca.T @ h @ ca, cb.T @ h @ cb)
        self.e_hf = float(mf.e_tot)

    # ------------------------------------------------------------------
    def init_gf(self):
        gfs = []
        for s in range(2):
            no = self.nelec[s]
            e = self.mo_energy[s]
            chempot = 0.5 * (e[no - 1] + e[no])
            gfs.append(Aux(e, np.eye(self.nmo), chempot))
        return tuple(gfs)

    def _se_part_spin(self, eri_ss, eri_os, occ_s, vir_s, occ_o, vir_o):
        """2h1p self-energy moments of one spin channel (or 2p1h with
        occupied/virtual swapped)."""
        ci, ei = occ_s.coupling, occ_s.energy
        ca, ea = vir_s.coupling, vir_s.energy
        cI, eI = occ_o.coupling, occ_o.energy
        cA, eA = vir_o.coupling, vir_o.energy
        q = jnp.einsum('xpqr,pi,qj,ra->xija', jnp.asarray(eri_ss),
                       jnp.asarray(ci), jnp.asarray(ci), jnp.asarray(ca),
                       optimize=True)
        qos = jnp.einsum('xpqr,pi,qj,ra->xija', jnp.asarray(eri_os),
                         jnp.asarray(ci), jnp.asarray(cI), jnp.asarray(cA),
                         optimize=True)
        anti = q - q.transpose(0, 2, 1, 3)
        e_ss = (ei[:, None, None] + ei[None, :, None] - ea[None, None, :])
        e_os = (ei[:, None, None] + eI[None, :, None] - eA[None, None, :])
        vv = (np.asarray(jnp.einsum('xija,yija->xy', anti, q, optimize=True))
              + np.asarray(jnp.einsum('xija,yija->xy', qos, qos,
                                      optimize=True)))
        vev = (np.asarray(jnp.einsum('xija,ija,yija->xy', anti,
                                     jnp.asarray(e_ss), q, optimize=True))
               + np.asarray(jnp.einsum('xija,ija,yija->xy', qos,
                                       jnp.asarray(e_os), qos,
                                       optimize=True)))
        e, c = _cholesky_build(vv, vev)
        se = Aux(e, c, chempot=occ_s.chempot)
        return se.remove_uncoupled(self.weight_tol)

    def build_se(self, gf):
        gfo = [g.get_occupied() for g in gf]
        gfv = [g.get_virtual() for g in gf]
        ses = []
        for s, eri_ss in enumerate((self.eri_aa, self.eri_bb)):
            o = 1 - s
            eri_os = (self.eri_ab if s == 0
                      else self.eri_ab.transpose(2, 3, 0, 1))
            se_occ = self._se_part_spin(eri_ss, eri_os, gfo[s], gfv[s],
                                        gfo[o], gfv[o])
            se_vir = self._se_part_spin(eri_ss, eri_os, gfv[s], gfo[s],
                                        gfv[o], gfo[o])
            ses.append(combine(se_occ, se_vir, chempot=gf[s].chempot))
        return tuple(ses)

    def make_rdm1(self, gf):
        return tuple(g.get_occupied().coupling @ g.get_occupied().coupling.T
                     for g in gf)

    def get_fock(self, gf=None, rdm1=None):
        if rdm1 is None:
            rdm1 = self.make_rdm1(gf)
        da, db = rdm1
        vja = np.einsum('pqrs,sr->pq', self.eri_aa, da, optimize=True) \
            + np.einsum('pqrs,sr->pq', self.eri_ab, db, optimize=True)
        vjb = np.einsum('pqrs,sr->pq', self.eri_bb, db, optimize=True) \
            + np.einsum('pqrs,qp->rs', self.eri_ab, da, optimize=True)
        vka = np.einsum('psrq,sr->pq', self.eri_aa, da, optimize=True)
        vkb = np.einsum('psrq,sr->pq', self.eri_bb, db, optimize=True)
        return (self.h1e[0] + vja - vka, self.h1e[1] + vjb - vkb)

    def fock_loop(self, gf, se):
        from ..lib.diis import DIIS
        diis = DIIS(space=self.diis_space)
        fock = self.get_fock(gf)
        rdm1_prev = None
        converged = False
        derr = 1.0
        nerr = (1.0, 1.0)
        gf = list(gf)
        se = list(se)
        for it1 in range(self.max_cycle_outer):
            for s in range(2):
                se[s] = _minimize_chempot1(se[s], fock[s], self.nelec[s],
                                           tol=self.conv_tol_nelec,
                                           maxiter=self.max_cycle_inner)
            for it2 in range(self.max_cycle_inner):
                nerr = []
                for s in range(2):
                    w, v = se[s].eig(fock[s])
                    se[s].chempot, err = binsearch_chempot(
                        w, v, self.nmo, self.nelec[s], occupancy=1)
                    nerr.append(err)
                    gf[s] = Aux(w, v[:self.nmo], chempot=se[s].chempot)
                rdm1 = self.make_rdm1(gf)
                fock = self.get_fock(rdm1=rdm1)
                stack = np.array(fock)
                err = (np.array(rdm1) - np.array(rdm1_prev)
                       if rdm1_prev is not None else np.array(rdm1))
                stack = np.asarray(diis.update(jnp.asarray(stack),
                                               jnp.asarray(err)))
                fock = (stack[0], stack[1])
                if rdm1_prev is not None:
                    derr = max(np.abs(np.array(rdm1)
                                      - np.array(rdm1_prev)).max(), 0.0)
                    if derr < self.conv_tol_rdm1:
                        break
                rdm1_prev = tuple(d.copy() for d in rdm1)
            if derr < self.conv_tol_rdm1 and \
                    max(abs(e) for e in nerr) < self.conv_tol_nelec:
                converged = True
                break
        return tuple(gf), tuple(se), converged

    # ------------------------------------------------------------------
    def energy_1body(self, gf):
        rdm1 = self.make_rdm1(gf)
        fock = self.get_fock(rdm1=rdm1)
        e = sum(0.5 * np.sum(rdm1[s] * (self.h1e[s] + fock[s]))
                for s in range(2))
        return e + self.mol.energy_nuc()

    def _e2b_spin(self, gf_s, se_s):
        gf_occ = gf_s.get_occupied()
        se_vir = se_s.get_virtual()
        d = gf_occ.energy[:, None] - se_vir.energy[None, :]
        m = gf_occ.coupling.T @ se_vir.coupling
        return 2.0 * float(np.sum(m * m / d))

    def energy_2body(self, gf, se):
        return 0.5 * sum(self._e2b_spin(gf[s], se[s]) for s in range(2))

    def energy_mp2(self, se):
        e = 0.0
        for s in range(2):
            occ = self.mo_energy[s] < se[s].chempot
            se_vir = se[s].get_virtual()
            vxk = se_vir.coupling[occ]
            d = self.mo_energy[s][occ][:, None] - se_vir.energy[None, :]
            e += float(np.sum(vxk * vxk / d))
        return 0.5 * e

    # ------------------------------------------------------------------
    def kernel(self):
        from ..lib.diis import DIIS
        gf = self.init_gf()
        se = self.build_se(gf)
        self.e_init = self.energy_mp2(se)
        diis = DIIS(space=self.diis_space)
        e_prev = 0.0
        e_1b = e_2b = 0.0
        for it in range(self.max_cycle):
            gf, se, _fconv = self.fock_loop(gf, se)
            e_1b = self.energy_1body(gf)
            se = self.build_se(gf)
            raw = []
            for s in range(2):
                se_o, se_v = se[s].get_occupied(), se[s].get_virtual()
                raw += [se_o.coupling @ se_o.coupling.T,
                        se_v.coupling @ se_v.coupling.T,
                        (se_o.coupling * se_o.energy[None]) @ se_o.coupling.T,
                        (se_v.coupling * se_v.energy[None]) @ se_v.coupling.T]
            raw = np.array(raw)
            raw_prev = getattr(self, '_diis_prev_raw', raw)
            self._diis_prev_raw = raw.copy()
            dat = np.asarray(diis.update(jnp.asarray(raw),
                                         jnp.asarray(raw - raw_prev)))
            ses = []
            for s in range(2):
                o = 4 * s
                se_o2 = Aux(*_cholesky_build(dat[o + 0], dat[o + 2]),
                            chempot=se[s].chempot)
                se_v2 = Aux(*_cholesky_build(dat[o + 1], dat[o + 3]),
                            chempot=se[s].chempot)
                ses.append(combine(se_o2, se_v2))
            se = tuple(ses)
            e_2b = self.energy_2body(gf, se)
            e_tot = e_1b + e_2b
            if self.mol.verbose >= 4:
                print(f'UAGF2 cycle {it+1}: E = {e_tot:.12f} '
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
        es, vs = [], []
        for g in self.gf:
            go = g.get_occupied()
            es.extend((-go.energy).tolist())
            vs.extend(go.coupling.T)
        order = np.argsort(es)[:nroots]
        return [es[i] for i in order], [vs[i] for i in order]

    def eaagf2(self, nroots=3):
        es, vs = [], []
        for g in self.gf:
            gv = g.get_virtual()
            es.extend(gv.energy.tolist())
            vs.extend(gv.coupling.T)
        order = np.argsort(es)[:nroots]
        return [es[i] for i in order], [vs[i] for i in order]
