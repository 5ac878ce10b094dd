"""Restricted Hartree-Fock, TPU-native.

Analog of the reference's pyscf/scf/hf.py (kernel:49, SCF:1652, RHF:2480).
The SCF cycle is a jitted XLA step (Fock build + DIIS-extrapolated
diagonalization via canonical orthogonalization); the convergence loop runs
on host. The J/K build is dense MXU work: in-core ERI einsums
(reference _vhf.incore: scf/_vhf.py:283) or density-fitted contractions
(reference df/df_jk.py) — integral-direct Schwarz screening is replaced by
the DF-first design (SURVEY §7.5).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# nao threshold above which the one-dispatch fused SCF program is replaced
# by the staged host-driven loop (_kernel_staged). Default 0: the staged
# loop is the restricted-SCF default - the monolithic fused executable
# costs tens of minutes of XLA compile (200+ MB serialized), crashes the
# TPU worker on load at ~580 AO, and its only advantage (no per-cycle
# dispatch) is worth ~milliseconds. Set PYSCF_TPU_FUSED_MAX_NAO to a
# positive value to re-enable the fused program below that size.
FUSED_MAX_NAO = int(os.environ.get('PYSCF_TPU_FUSED_MAX_NAO', '0'))

from .. import __config__
from ..lib import parameters as param
from ..lib import logger
from ..lib.diis import DIIS
from ..lib.linalg import canonical_orth, eigh_gen


def get_hcore(mol):
    from ..ops.integrals.j1e import hcore_parts
    stv = hcore_parts(mol)     # device-resident screened S/T/V
    h = stv[1] + stv[2]
    if mol.has_ecp:
        h = h + mol.intor('ECPscalar')
    return h


def get_ovlp(mol):
    from ..ops.integrals.j1e import hcore_parts
    return hcore_parts(mol)[0]


@jax.jit
def dot_eri_dm(eri, dm):
    """J/K from a full in-core ERI tensor (chemists' (ij|kl)).

    Mirrors reference scf/hf.py:902 dot_eri_dm (s8-packed there; dense here —
    MXU-friendly full tensor contraction).
    """
    vj = jnp.einsum('ijkl,lk->ij', eri, dm)
    vk = jnp.einsum('ilkj,lk->ij', eri, dm)
    return vj, vk


@jax.jit
def _rhf_fock_step(h1e, vhf, dm, s1e, x):
    """One diagonalization step: F = h + vhf; returns (fock, grad-norm proxy)."""
    fock = h1e + vhf
    sdf = s1e @ dm @ fock
    err = sdf.T - sdf            # DIIS error (FDS - SDF)
    return fock, err


@jax.jit
def _density(c, occ):
    cocc = c * occ[None, :]
    return cocc @ c.T


def get_occ_rhf(mo_energy, nocc):
    """Aufbau occupation for RHF (2 electrons per lowest orbital)."""
    e = np.asarray(mo_energy)
    idx = np.argsort(e)
    occ = np.zeros_like(e)
    occ[idx[:nocc]] = 2.0
    return jnp.asarray(occ)


def energy_elec(dm, h1e, vhf):
    e1 = jnp.einsum('ij,ji->', h1e, dm)
    e2 = 0.5 * jnp.einsum('ij,ji->', vhf, dm)
    return (e1 + e2).real


class SCF:
    """Base mean-field driver. Subclasses provide get_veff/get_occ/make_rdm1."""

    conv_tol = getattr(__config__, 'scf_hf_SCF_conv_tol', 1e-10)
    conv_tol_grad = getattr(__config__, 'scf_hf_SCF_conv_tol_grad', None)
    max_cycle = getattr(__config__, 'scf_hf_SCF_max_cycle', 100)
    diis_space = getattr(__config__, 'scf_hf_SCF_diis_space', 8)
    diis_start_cycle = 1
    level_shift = 0.0
    init_guess = 'minao'
    lindep_thresh = 1e-8

    def __init__(self, mol):
        self.mol = mol
        self.verbose = mol.verbose
        self.converged = False
        self.e_tot = None
        self.mo_coeff = None
        self.mo_energy = None
        self.mo_occ = None
        self.chkfile = None
        self._eri = None
        self.with_df = None
        # jax.sharding.Mesh: shard the fused Fock build over devices
        # (DF-J/K over aux, XC over grid blocks); None = single device
        self.mesh = None

    # ---------------- integrals -------------------------------------
    def get_hcore(self, mol=None):
        return get_hcore(mol or self.mol)

    def get_ovlp(self, mol=None):
        return get_ovlp(mol or self.mol)

    def get_jk(self, mol=None, dm=None, hermi=1, with_j=True, with_k=True,
               omega=None):
        mol = mol or self.mol
        if getattr(self, 'with_sgx', None) is not None:
            return self.with_sgx.get_jk(dm, hermi=hermi, with_j=with_j,
                                        with_k=with_k)
        if self.with_df is not None:
            from ..df.df_jk import get_jk as df_get_jk
            dfobj = self.with_df if not omega else self._df_lr(abs(omega))
            co = None
            if getattr(self, '_co_dm', None) is dm:
                co = self._co_scaled
            return df_get_jk(dfobj, dm, with_j=with_j, with_k=with_k,
                             mo_coeff_occ=co)
        eri = self._get_eri(omega)
        dm = jnp.asarray(dm)
        if dm.ndim == 2:
            return dot_eri_dm(eri, dm)
        vj, vk = zip(*[dot_eri_dm(eri, d) for d in dm])
        return jnp.stack(vj), jnp.stack(vk)

    def _get_eri(self, omega=None):
        """Full in-core ERI; omega selects the erf(w r)/r long-range set."""
        if not omega:
            if self._eri is None:
                self._eri = self.mol.intor('int2e')
            return self._eri
        cache = getattr(self, '_eri_lr', None)
        if cache is None:
            cache = self._eri_lr = {}
        w = abs(omega)
        if w not in cache:
            from ..ops.integrals.int2e import int2e
            cache[w] = int2e(self.mol, omega=w)
        return cache[w]

    def _df_lr(self, omega):
        """DF factor with the erf(w r)/r metric (RSH long-range K)."""
        cache = getattr(self, '_df_lr_cache', None)
        if cache is None:
            cache = self._df_lr_cache = {}
        if omega not in cache:
            from ..df.df import DF
            cache[omega] = DF(self.mol, self.with_df.auxbasis,
                              omega=omega).build()
        return cache[omega]

    def _stash_occ_orbitals(self, mo_coeff, mo_occ):
        """Cache sqrt(occ)-scaled occupied orbitals for fast DF-K."""
        import numpy as _np
        occ = _np.asarray(mo_occ)
        if occ.ndim == 1:
            sel = occ > 0
            self._co_scaled = mo_coeff[:, sel] * jnp.sqrt(
                jnp.asarray(occ[sel]))[None, :]
        else:
            self._co_scaled = [
                mo_coeff[s][:, occ[s] > 0]
                * jnp.sqrt(jnp.asarray(occ[s][occ[s] > 0]))[None, :]
                for s in range(2)]

    def get_j(self, mol=None, dm=None, hermi=1):
        return self.get_jk(mol, dm, with_k=False)[0]

    def get_k(self, mol=None, dm=None, hermi=1):
        return self.get_jk(mol, dm, with_j=False)[1]

    # ---------------- RHF-specific pieces ----------------------------
    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        vj, vk = self.get_jk(mol, dm)
        return vj - 0.5 * vk

    def get_occ(self, mo_energy, mo_coeff=None):
        return get_occ_rhf(mo_energy, self.mol.nelectron // 2)

    def make_rdm1(self, mo_coeff=None, mo_occ=None):
        c = mo_coeff if mo_coeff is not None else self.mo_coeff
        o = mo_occ if mo_occ is not None else self.mo_occ
        return _density(c, o)

    def energy_elec(self, dm, h1e, vhf):
        return energy_elec(dm, h1e, vhf)

    def energy_nuc(self):
        return self.mol.energy_nuc()

    def energy_tot(self, dm, h1e, vhf):
        return float(self.energy_elec(dm, h1e, vhf)) + self.energy_nuc()

    def get_fock(self, h1e, s1e, vhf, dm, cycle=-1, diis=None):
        fock = h1e + vhf
        if diis is not None and cycle >= self.diis_start_cycle:
            sdf = s1e @ dm @ fock
            err = sdf.conj().T - sdf
            fock = diis.update(fock, err)
        if self.level_shift:
            sds = s1e @ dm @ s1e
            fock = fock + self.level_shift * (s1e - 0.5 * sds) \
                - 0.5 * self.level_shift * sds * 0  # RHF: shift virtuals
        return fock

    def eig(self, fock, s1e=None):
        return eigh_gen(fock, self._orth)

    # ---------------- init guesses ------------------------------------
    def get_init_guess(self, mol=None, key=None):
        mol = mol or self.mol
        key = key or self.init_guess
        if key == 'hcore' or key == '1e':
            return self.init_guess_by_1e(mol)
        if key == 'minao':
            try:
                from . import init_guess
                return jnp.asarray(init_guess.init_guess_by_minao(mol))
            except Exception:
                return self.init_guess_by_1e(mol)
        if key == 'atom':
            from . import init_guess
            return jnp.asarray(init_guess.init_guess_by_atom(mol))
        if key == 'huckel':
            from . import init_guess
            return jnp.asarray(init_guess.init_guess_by_huckel(mol))
        if key == 'mod_huckel':
            from . import init_guess
            return jnp.asarray(init_guess.init_guess_by_mod_huckel(mol))
        if key == 'sap':
            from . import init_guess
            return jnp.asarray(init_guess.init_guess_by_sap(mol))
        if key == 'chkfile' or key == 'chk':
            return self.init_guess_by_chkfile()
        raise NotImplementedError(f'init_guess {key}')

    def init_guess_by_chkfile(self, chkfile=None):
        """Resume from an HDF5 checkpoint (reference scf/hf.py:679)."""
        from ..lib import chkfile as chk
        data = chk.load_scf(chkfile or self.chkfile)
        mo_coeff = jnp.asarray(data['mo_coeff'])
        mo_occ = jnp.asarray(data['mo_occ'])
        return self.make_rdm1(mo_coeff, mo_occ)

    def update_from_chk(self, chkfile=None):
        from ..lib import chkfile as chk
        data = chk.load_scf(chkfile or self.chkfile)
        self.e_tot = float(data['e_tot'])
        self.mo_energy = jnp.asarray(data['mo_energy'])
        self.mo_coeff = jnp.asarray(data['mo_coeff'])
        self.mo_occ = jnp.asarray(data['mo_occ'])
        return self

    def dump_chk(self):
        if self.chkfile:
            from ..lib import chkfile as chk
            chk.dump_scf(self.mol, self.chkfile, self.e_tot or 0.0,
                         self.mo_energy, self.mo_coeff, self.mo_occ)

    def init_guess_by_1e(self, mol=None):
        mol = mol or self.mol
        h1e = self.get_hcore(mol)
        s1e = self.get_ovlp(mol)
        x = canonical_orth(s1e, self.lindep_thresh)
        mo_energy, mo_coeff = eigh_gen(h1e, x)
        mo_occ = self.get_occ(mo_energy, mo_coeff)
        return self.make_rdm1(mo_coeff, mo_occ)

    # ---------------- fused one-dispatch driver ------------------------
    _fused_kind = None      # 'restricted' on classes the fused driver covers

    def _fused_veff(self):
        """(key, veff_fn, veff_data) for the fused program, or None."""
        return None

    def _fused_ok(self):
        # instance-level monkey-patches (solvent/qmmm wrappers, smearing)
        # customize the cycle body -> use the legacy host loop for those
        patched = any(k in self.__dict__ for k in
                      ('get_veff', 'get_fock', 'get_occ', 'energy_elec',
                       'get_hcore'))
        return (self._fused_kind in ('restricted', 'unrestricted')
                and not patched
                and getattr(self, 'with_sgx', None) is None
                and not getattr(self, 'nlc', '')
                and self.level_shift == 0
                and getattr(self, 'sigma', None) in (None, 0))

    def _kernel_fused(self, dm0=None, _veff_res=None):
        from .fused import (build_restricted_program,
                            build_unrestricted_program, get_program)
        mol = self.mol
        log = logger.new_logger(self)
        t_start = time.time()
        conv_tol_grad = (np.sqrt(self.conv_tol)
                         if self.conv_tol_grad is None else self.conv_tol_grad)
        s1e = self.get_ovlp(mol)
        h1e = self.get_hcore(mol)
        self._orth = canonical_orth(s1e, self.lindep_thresh)
        log.timer('1e integrals + orthogonalizer')
        dm = jnp.asarray(dm0) if dm0 is not None else self.get_init_guess(mol)
        log.timer('initial guess')
        res = self._fused_veff() if _veff_res is None else _veff_res
        kind, veff_fn, veff_data = res[:3]
        veff_dm_fn = res[3] if len(res) > 3 else None
        log.timer('veff data (DF factor / grid AO values)')
        mixed = getattr(self, 'fused_mixed_precision', True)
        if self._fused_kind == 'restricted':
            nocc = mol.nelectron // 2
            key = (kind, mol.nao, nocc, self.diis_space, mixed)
            prog = get_program(mol, key, lambda: build_restricted_program(
                nocc, self.diis_space, veff_fn, veff_dm_fn,
                mixed_precision=mixed))
        else:
            na, nb = mol.nelec
            key = (kind, mol.nao, na, nb, self.diis_space, mixed)
            prog = get_program(mol, key, lambda: build_unrestricted_program(
                na, nb, self.diis_space, veff_fn, veff_dm_fn,
                mixed_precision=mixed))
        e_elec, done, ncyc, moe, moc, dm = prog(
            veff_data, h1e, s1e, self._orth, dm,
            self.conv_tol, conv_tol_grad, self.max_cycle)
        self.converged = bool(done)
        self.scf_cycles = int(ncyc)
        log.timer('fused SCF while_loop (%d cycles)' % int(ncyc))
        self.e_tot = float(e_elec) + self.energy_nuc()
        self.mo_energy = moe
        self.mo_coeff = moc
        self.mo_occ = self.get_occ(moe, moc)
        self._stash_occ_orbitals(moc, self.mo_occ)
        self.dump_chk()
        state = 'converged' if self.converged else 'NOT converged'
        log.note('SCF %s in %d cycles. E= %.14f (%.1fs)',
                 state, int(ncyc), self.e_tot, time.time() - t_start)
        return self.e_tot

    def _kernel_staged(self, dm0=None, _veff_res=None):
        """Host-driven mixed-precision SCF for large systems.

        Same cycle math as the fused program, but each cycle is one
        modest compiled dispatch: at nao >~ 500 the fused whole-loop
        executable crashes the TPU worker on load (round-4 (H2O)10
        failure), while per-cycle programs run fine. An f32 stage takes
        the density most of the way, then f64 cycles converge to
        conv_tol (measured at 580 AO: 0.7 s/f32 cycle, 3 s/f64 cycle).
        """
        from .fused import build_restricted_cycle, get_program
        mol = self.mol
        log = logger.new_logger(self)
        t_start = time.time()
        conv_tol_grad = (np.sqrt(self.conv_tol)
                         if self.conv_tol_grad is None else self.conv_tol_grad)
        s1e = jnp.asarray(self.get_ovlp(mol))
        h1e = jnp.asarray(self.get_hcore(mol))
        self._orth = canonical_orth(s1e, self.lindep_thresh)
        log.timer('1e integrals + orthogonalizer')
        dm = jnp.asarray(dm0) if dm0 is not None else self.get_init_guess(mol)
        log.timer('initial guess')
        res = self._fused_veff() if _veff_res is None else _veff_res
        kind, veff_fn, veff_data = res[:3]
        veff_dm_fn = res[3] if len(res) > 3 else None
        log.timer('veff data (DF factor)')
        nocc = mol.nelectron // 2
        key = ('staged', kind, mol.nao, nocc, self.diis_space)
        seed, cycle, finalize = get_program(
            mol, key, lambda: build_restricted_cycle(
                nocc, self.diis_space, veff_fn, veff_dm_fn))
        nao = mol.nao
        space = self.diis_space

        def run_stage(dt, co, veff_d, h1, s1, x, tol_e, tol_g, maxc, log_tag):
            fh = jnp.zeros((space, nao, nao), dt)
            eh = jnp.zeros((space, nao, nao), dt)
            e_last = 0.0
            conv = False
            for cyc in range(maxc):
                co, fh, eh, e_elec, gnorm = cycle(
                    veff_d, h1, s1, x, co, fh, eh, jnp.int32(cyc))
                e_elec, gnorm = map(float, np.asarray(
                    jnp.stack([e_elec.astype(jnp.float64),
                               gnorm.astype(jnp.float64)])))
                de = abs(e_elec - e_last)
                e_last = e_elec
                log.info('%s cycle= %d E_elec= %.12g delta_E= %.3g |g|= %.3g',
                         log_tag, cyc + 1, e_elec, de, gnorm)
                log.timer('%s cycle= %d' % (log_tag, cyc + 1))
                if de < tol_e and gnorm < tol_g:
                    conv = True
                    break
            return co, conv, cyc + 1

        mixed = getattr(self, 'fused_mixed_precision', True)
        co = seed(veff_data, h1e, self._orth, dm)
        ncyc = 0
        if mixed:
            f32 = jnp.float32
            from .fused import _cast_tree, _F32_GNORM, _F32_MAX_CYCLE
            d32 = _cast_tree(veff_data, f32)
            with jax.default_matmul_precision('highest'):
                co32, _, n32 = run_stage(
                    f32, co.astype(f32), d32, h1e.astype(f32),
                    s1e.astype(f32), self._orth.astype(f32),
                    1e-2, max(np.sqrt(self.conv_tol), _F32_GNORM),
                    _F32_MAX_CYCLE, 'f32')
            ok32 = bool(np.isfinite(np.asarray(co32)).all())
            if ok32:
                co = co32.astype(h1e.dtype)
                ncyc += n32
            del d32, co32
        co, conv, n64 = run_stage(
            h1e.dtype, co, veff_data, h1e, s1e, self._orth,
            self.conv_tol, conv_tol_grad, self.max_cycle, 'f64')
        ncyc += n64
        e_elec, moe, moc, dm = finalize(veff_data, h1e, self._orth, co)
        self.converged = conv
        self.scf_cycles = ncyc
        self.e_tot = float(e_elec) + self.energy_nuc()
        self.mo_energy = moe
        self.mo_coeff = moc
        self.mo_occ = self.get_occ(moe, moc)
        self._stash_occ_orbitals(moc, self.mo_occ)
        self.dump_chk()
        state = 'converged' if conv else 'NOT converged'
        log.note('SCF %s in %d cycles (staged). E= %.14f (%.1fs)',
                 state, ncyc, self.e_tot, time.time() - t_start)
        return self.e_tot

    # ---------------- driver ------------------------------------------
    def kernel(self, dm0=None, **kwargs):
        # verbose >= DEBUG falls back to the host loop (per-cycle prints);
        # verbose == INFO runs fused with per-phase timers
        if self._fused_ok() and self.verbose < param.VERBOSE_DEBUG:
            res = self._fused_veff()
            if res is not None:
                if (self._fused_kind == 'restricted'
                        and self.mol.nao > FUSED_MAX_NAO):
                    return self._kernel_staged(dm0, _veff_res=res)
                return self._kernel_fused(dm0, _veff_res=res)
        mol = self.mol
        log = logger.new_logger(self)
        t_start = time.time()
        if self.conv_tol_grad is None:
            conv_tol_grad = np.sqrt(self.conv_tol)
        else:
            conv_tol_grad = self.conv_tol_grad

        s1e = self.get_ovlp(mol)
        h1e = self.get_hcore(mol)
        self._orth = canonical_orth(s1e, self.lindep_thresh)
        log.timer('1e integrals + orthogonalizer')
        dm = jnp.asarray(dm0) if dm0 is not None else self.get_init_guess(mol)
        log.timer('initial guess')

        vhf = self.get_veff(mol, dm)
        e_tot = self.energy_tot(dm, h1e, vhf)
        log.info('init E= %.15g', float(e_tot))
        log.timer('initialize scf')

        diis = DIIS(self.diis_space) if self.diis_space else None
        scf_conv = False
        for cycle in range(self.max_cycle):
            dm_last, e_last = dm, e_tot
            fock = self.get_fock(h1e, s1e, vhf, dm, cycle, diis)
            mo_energy, mo_coeff = self.eig(fock, s1e)
            mo_occ = self.get_occ(mo_energy, mo_coeff)
            dm = self.make_rdm1(mo_coeff, mo_occ)
            self._stash_occ_orbitals(mo_coeff, mo_occ)
            self._co_dm = dm
            vhf = self.get_veff(mol, dm, dm_last, vhf)
            e_tot = self.energy_tot(dm, h1e, vhf)

            fock_c = h1e + vhf
            grad = self._scf_grad_norm(mo_coeff, mo_occ, fock_c)
            de = abs(e_tot - e_last)
            log.info('cycle= %d E= %.15g delta_E= %.3g |g|= %.3g',
                     cycle + 1, float(e_tot), de, grad)
            log.timer('cycle= %d' % (cycle + 1))
            self.e_tot = e_tot
            self.mo_energy = mo_energy
            self.mo_coeff = mo_coeff
            self.mo_occ = mo_occ
            self.dump_chk()      # per-cycle resume point (reference hf.py:204)
            if de < self.conv_tol and grad < conv_tol_grad:
                scf_conv = True
                break

        self.converged = scf_conv
        self.e_tot = e_tot
        self.mo_energy = mo_energy
        self.mo_coeff = mo_coeff
        self.mo_occ = mo_occ
        self.dump_chk()
        state = 'converged' if scf_conv else 'NOT converged'
        log.note('SCF %s. E= %.14f (%.1fs)', state, float(self.e_tot),
                 time.time() - t_start)
        return self.e_tot

    def _scf_grad_norm(self, mo_coeff, mo_occ, fock):
        occ = np.asarray(mo_occ) > 0
        co = mo_coeff[:, occ]
        cv = mo_coeff[:, ~occ]
        g = co.T @ fock @ cv
        return float(jnp.linalg.norm(g)) * 2 ** 0.5

    run = kernel

    def scf(self, dm0=None, **kwargs):
        return self.kernel(dm0, **kwargs)

    # ---------------- decorators --------------------------------------
    def density_fit(self, auxbasis=None):
        from ..df.df_jk import density_fit
        return density_fit(self, auxbasis)

    def COSX(self, auxbasis=None):
        """Seminumerical exchange (reference mf.COSX() / sgx.sgx_fit)."""
        from ..sgx import sgx_fit
        return sgx_fit(self, auxbasis)

    def newton(self):
        """Second-order (quasi-Newton) SCF (reference mf.newton())."""
        from ..soscf import newton
        return newton(self)

    def x2c(self):
        """Spin-free X2C-1e relativistic hcore (reference mf.x2c())."""
        from ..x2c import sfx2c1e
        return sfx2c1e(self)

    sfx2c1e = x2c

    def PCM(self, eps=78.3553, method='C-PCM'):
        from ..solvent.pcm import pcm_for_scf
        return pcm_for_scf(self, eps=eps, method=method)

    def to_rhf(self):
        return self

    # ---------------- analysis -----------------------------------------
    def dip_moment(self, mol=None, dm=None, unit='Debye'):
        mol = mol or self.mol
        if dm is None:
            dm = self.make_rdm1()
        r_ints = mol.intor('int1e_r')
        el = -jnp.einsum('xij,ji->x', r_ints, dm)
        nuc = jnp.einsum('a,ax->x', jnp.asarray(mol.charges, dtype=jnp.float64),
                         jnp.asarray(mol.coords))
        mu = np.asarray(el + nuc)
        if unit.lower().startswith('d'):
            mu = mu * param.DEBYE
        return mu

    def quad_moment(self, mol=None, dm=None):
        """Traceless quadrupole moment (au); reference scf/hf.py:1486."""
        mol = mol or self.mol
        if dm is None:
            dm = self.make_rdm1()
        from ..ops.eval_gto import eval_ao  # noqa: F401 (doc pointer)
        # <xy> integrals from dipole machinery: build r_i r_j via a
        # finite set of 1e integrals is not yet kerneled; use the grid
        from ..dft import gen_grid
        grids = gen_grid.Grids(mol).build()
        import numpy as _np
        from ..ops.eval_gto import eval_ao as _eval
        coords = _np.asarray(grids.coords)
        w = _np.asarray(grids.weights)
        ao = _np.asarray(_eval(mol, grids.coords, deriv=0))
        rho = _np.einsum('gi,ij,gj->g', ao, _np.asarray(dm), ao)
        el = -_np.einsum('g,gx,gy,g->xy', w, coords, coords, rho)
        z = _np.asarray(mol.charges, dtype=float)
        R = _np.asarray(mol.coords)
        nuc = _np.einsum('a,ax,ay->xy', z, R, R)
        q = el + nuc
        return 1.5 * q - 0.5 * _np.trace(q) * _np.eye(3)

    def analyze(self, verbose=None):
        """Population/dipole summary (reference scf/hf.py:1213)."""
        import numpy as _np
        pop, chg = self.mulliken_pop()
        mu = self.dip_moment()
        print('SCF summary: E_tot = %.12f  converged = %s'
              % (self.e_tot, self.converged))
        print('Mulliken charges:')
        for ia, c in enumerate(chg):
            print('  atom %d %-2s  charge % .5f'
                  % (ia, self.mol.elements_[ia], c))
        print('Dipole moment (Debye): %.5f %.5f %.5f  |mu| = %.5f'
              % (*mu, _np.linalg.norm(mu)))
        return pop, chg, mu

    def mulliken_pop(self, mol=None, dm=None, s=None):
        mol = mol or self.mol
        if dm is None:
            dm = self.make_rdm1()
        if s is None:
            s = self.get_ovlp(mol)
        pop = np.asarray(jnp.einsum('ij,ji->i', dm, s))
        chg = np.array(mol.charges, dtype=float)
        ao2atom = np.zeros(mol.nao, dtype=int)
        for l, g in mol.shell_groups.items():
            for off, ia in zip(g.ao_off, g.atom_ids):
                ao2atom[off:off + 2 * l + 1] = ia
        for i, p in enumerate(pop):
            chg[ao2atom[i]] -= p
        return pop, chg


class RHF(SCF):
    _fused_kind = 'restricted'

    def __init__(self, mol):
        if mol.nelectron % 2 != 0 or mol.spin != 0:
            raise RuntimeError('RHF requires closed-shell molecule; '
                               'use UHF/ROHF')
        super().__init__(mol)

    def _fused_veff(self):
        if self.with_df is not None:
            B = self.with_df.cderi
            mesh = self.mesh
            if mesh is not None:
                # aux axis sharded over the mesh; J/K partials psum over ICI
                from ..parallel.mesh import shard_put, df_jk_sharded
                B = shard_put(B, mesh, 0)
                jk_occ = df_jk_sharded(mesh, with_k_occ=True)
                jk_dm = df_jk_sharded(mesh, with_k_occ=False)

                def veff_fn(data, dm, co):
                    vj, vk = jk_occ(data['B'], dm, co)
                    vhf = vj - 0.5 * vk
                    return vhf, 0.5 * jnp.sum(vhf * dm)

                def veff_dm_fn(data, dm):
                    vj, vk = jk_dm(data['B'], dm, dm)
                    vhf = vj - 0.5 * vk
                    return vhf, 0.5 * jnp.sum(vhf * dm)

                key = ('rhf-df-mesh', B.shape, mesh.devices.size)
                return key, veff_fn, {'B': B}, veff_dm_fn

            from ..df.df_jk import DF_CHUNK_ELEMS, jk_chunked
            if B.size > DF_CHUNK_ELEMS:
                # large system: stream aux slices of the uncopied B
                # (bounds XLA HBM temps without doubling resident memory)
                def veff_fn(data, dm, co):
                    vj, vk = jk_chunked(data['B'], dm, co)
                    vhf = vj - 0.5 * vk
                    return vhf, 0.5 * jnp.sum(vhf * dm)

                def veff_dm_fn(data, dm):
                    vj, vk = jk_chunked(data['B'], dm, None)
                    vhf = vj - 0.5 * vk
                    return vhf, 0.5 * jnp.sum(vhf * dm)

                return (('rhf-df-chunked', B.shape), veff_fn,
                        {'B': B}, veff_dm_fn)

            def veff_fn(data, dm, co):
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dm)
                vj = jnp.einsum('p,pij->ij', rho, B)
                Bo = jnp.einsum('pij,jo->pio', B, co)
                vk = jnp.einsum('pio,pjo->ij', Bo, Bo)
                vhf = vj - 0.5 * vk
                return vhf, 0.5 * jnp.sum(vhf * dm)

            def veff_dm_fn(data, dm):
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dm)
                vj = jnp.einsum('p,pij->ij', rho, B)
                Bd = jnp.einsum('pil,lk->pik', B, dm)
                vk = jnp.einsum('pik,pkj->ij', Bd, B)
                vhf = vj - 0.5 * vk
                return vhf, 0.5 * jnp.sum(vhf * dm)

            return ('rhf-df', B.shape), veff_fn, {'B': B}, veff_dm_fn
        if self._eri is None:
            self._eri = self.mol.intor('int2e')
        eri = self._eri

        def veff_fn(data, dm, co):
            eri = data['eri']
            vj = jnp.einsum('ijkl,lk->ij', eri, dm)
            vk = jnp.einsum('ilkj,lk->ij', eri, dm)
            vhf = vj - 0.5 * vk
            return vhf, 0.5 * jnp.sum(vhf * dm)

        def veff_dm_fn(data, dm):
            return veff_fn(data, dm, None)

        return ('rhf-eri', eri.shape), veff_fn, {'eri': eri}, veff_dm_fn

    # post-HF constructors
    def MP2(self, **kwargs):
        from ..mp import MP2
        return MP2(self, **kwargs)

    def CCSD(self, **kwargs):
        from ..cc import CCSD
        return CCSD(self, **kwargs)

    def CCSDT(self, **kwargs):
        from ..cc import CCSDT
        return CCSDT(self, **kwargs)

    def CISD(self, **kwargs):
        from ..ci import CISD
        return CISD(self, **kwargs)

    def TDA(self, **kwargs):
        from ..tdscf import TDA
        return TDA(self, **kwargs)

    def TDHF(self, **kwargs):
        from ..tdscf import TDHF
        return TDHF(self, **kwargs)

    def Gradients(self):
        from ..grad import rhf as rhf_grad
        return rhf_grad.Gradients(self)

    def nuc_grad_method(self):
        return self.Gradients()

    def Hessian(self, **kwargs):
        from ..hessian import Hessian
        return Hessian(self, **kwargs)
