"""Fused SCF driver: the whole self-consistent loop as ONE compiled XLA
program (lax.while_loop), with device-side DIIS.

The reference iterates on the host, dispatching a dozen kernels per cycle
(scf/hf.py:170-207: get_fock, DIIS, eig, get_occ, make_rdm1, get_veff,
energy_elec). Here the cycle body — Fock build (J/K/XC), DIIS ring-buffer
extrapolation, generalized diagonalization via canonical orthogonalization,
aufbau occupation, density update, energy and gradient-norm convergence
test — is traced once into a single program that runs to convergence on
device in one dispatch. Convergence thresholds and max_cycle are runtime
scalars (no recompile when they change); programs are cached on the Mole
so repeated kernels on the same molecule are compile-free.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _diis_extrapolate(fh, eh, nval, newest=None):
    """DIIS solve over a (space, n, n) ring buffer with nval valid slots.

    Minimizes |sum_i c_i err_i| s.t. sum c_i = 1 (Pulay; reference
    lib/diis.py:244). Invalid slots are decoupled by identity rows so their
    coefficients vanish. The (space+1)^2 system is solved by eigh
    pseudo-inverse for robustness near convergence.
    """
    space = fh.shape[0]
    ef = eh.reshape(space, -1)
    G = ef @ ef.T
    valid = jnp.arange(space) < nval
    # drop stale slots whose error norm dwarfs the current best: keeping
    # a 1e-1-norm early vector next to 1e-6-norm converged ones makes G
    # condition ~1e10 and the extrapolation erratic (observed as periodic
    # energy blow-ups at (H2O)10 while |g| sat at 1e-5)
    norms2 = jnp.diagonal(G)
    best = jnp.min(jnp.where(valid, norms2, jnp.inf))
    valid = valid & (norms2 < 1e8 * jnp.maximum(best, 1e-300))
    vv = valid[:, None] & valid[None, :]
    eye = jnp.eye(space, dtype=G.dtype)
    G = jnp.where(vv, G, eye)
    # normalize for conditioning (reference scales by err norms)
    scale = jnp.sqrt(jnp.maximum(jnp.diagonal(G), jnp.finfo(G.dtype).tiny))
    scale = jnp.where(valid, scale, 1.0)
    G = G / (scale[:, None] * scale[None, :])
    # eliminate the sum-to-one constraint analytically: the stationary
    # point of |sum c_i e_i|^2 with sum c = 1 is c ∝ G^{-1} 1. This keeps
    # the eigenproblem on the unit-diagonal G alone - the classical
    # bordered (space+1) system mixes O(1/||err||) constraint rows with
    # O(||err||^2) G modes and NO eigh threshold is right for both
    # (measured: benzene DIIS stalled at |g|=5e-5 or spiked, depending
    # on the cutoff; this form converges like the exact solve).
    from ..lib.linalg import eigh as _eigh_r
    w, v = _eigh_r(G)
    thr = 1e-12 if G.dtype == jnp.float64 else 1e-6
    winv = jnp.where(jnp.abs(w) > thr, 1.0 / w, 0.0)
    ones = jnp.where(valid, 1.0 / scale, 0.0)
    y = v @ (winv * (v.T @ ones))
    c = jnp.where(valid, y / scale, 0.0)
    csum = jnp.sum(c)
    c = c / jnp.where(jnp.abs(csum) > 1e-12, csum, 1.0)
    # sanity fallback to the newest Fock: |c| huge (numerically degenerate
    # subspace) or sum(c)~0 (all error vectors at the noise floor, e.g.
    # an already-converged atom where G ~ 0 and y == 0)
    bad = (jnp.max(jnp.abs(c)) > 20.0) | (jnp.abs(csum) <= 1e-12)
    latest = (nval - 1) % space if newest is None else newest
    c_safe = jnp.zeros(space, dtype=G.dtype).at[latest].set(1.0)
    c = jnp.where(bad, c_safe, c)
    return jnp.tensordot(c, fh, axes=(0, 0))


# f32 pre-stage stop criteria. The energy delta in f32 bottoms out at
# eps32*|E| (~1e-5 for a 100-electron molecule) so it cannot gate the
# pre-stage; the orbital-gradient norm is scale-free and reliably reaches
# ~1e-4 in f32. A hard cycle cap guards against dithering at the plateau.
_F32_DE = 1e-2          # effectively: stop on gradient, not energy
_F32_GNORM = 1e-3
_F32_MAX_CYCLE = 30


def _cast_tree(tree, dt):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if (hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating))
        else a, tree)


def build_restricted_program(nocc, diis_space, veff_fn, veff_dm_fn=None,
                             mixed_precision=True):
    """One-dispatch restricted SCF.

    veff_fn(veff_data, dm, co) -> (vhf, e2) must be jit-traceable; co is the
    sqrt(occ)-scaled occupied-orbital factor with dm == co @ co.T exactly
    (J from dm, K/XC free to use either). e2 is the two-electron +
    exchange-correlation energy so that e_elec = tr(h dm) + e2.

    veff_dm_fn(veff_data, dm) -> (vhf, e2) builds the potential from the
    raw (non-idempotent) guess density; the loop is seeded by
    diagonalizing F(dm0) exactly like the reference's first cycle
    (scf/hf.py:170). Without it the seed falls back to the guess's
    natural orbitals, which both truncates fractional occupations and
    can hit jnp.linalg.eigh NaNs on degenerate guess spectra.

    mixed_precision: when the input data is f64, run a single-precision
    (f32) stage of the identical cycle body first and hand its converged
    orbitals to the f64 loop. On TPU f64 matmuls are software-emulated
    (~20-30x slower than f32 on the MXU), so most cycles run at f32 speed
    and only the last 2-4 refinement cycles pay f64 cost. The final
    energies/orbitals come from the f64 stage: golden-value accuracy is
    unchanged.

    Returns a jitted program
      program(veff_data, h1e, s1e, x, dm0, conv_tol, conv_tol_grad,
              max_cycle) -> (e_elec, converged, n_cycles, mo_energy,
                             mo_coeff, dm)
    """

    def eigh_gen(f, x):
        from ..lib.linalg import eigh as _eigh
        fp = x.T @ f @ x
        e, cp = _eigh(fp)
        return e, x @ cp

    def stage(veff_data, h1e, s1e, x, co0, conv_tol, conv_tol_grad,
              max_cycle, cyc0):
        """DIIS SCF loop at the dtype of its inputs; returns final state."""
        dt = h1e.dtype
        nao = h1e.shape[0]
        space = diis_space
        occ_scale = jnp.sqrt(jnp.asarray(2.0, dt))

        def body(st):
            cyc, done, e_prev, co, f_last, fh, eh = st
            dm = co @ co.T
            vhf, e2 = veff_fn(veff_data, dm, co)
            f = h1e + vhf
            e_elec = jnp.sum(h1e * dm) + e2
            sdf = s1e @ dm @ f
            err = sdf.T - sdf
            idx = jnp.mod(cyc - cyc0, space)
            fh = fh.at[idx].set(f)
            eh = eh.at[idx].set(err)
            f_d = _diis_extrapolate(fh, eh,
                                    jnp.minimum(cyc - cyc0 + 1, space),
                                    newest=idx)
            _, moc_n = eigh_gen(f_d, x)
            co_n = moc_n[:, :nocc] * occ_scale
            gnorm = jnp.linalg.norm(x.T @ err @ x)
            de = jnp.abs(e_elec - e_prev)
            done = (de < conv_tol) & (gnorm < conv_tol_grad)
            return (cyc + 1, done, e_elec, co_n, f, fh, eh)

        def cond(st):
            return (~st[1]) & (st[0] < max_cycle)

        init = (cyc0, jnp.bool_(False), jnp.asarray(0.0, dt), co0,
                jnp.zeros((nao, nao), dt),
                jnp.zeros((space, nao, nao), dt),
                jnp.zeros((space, nao, nao), dt))
        return jax.lax.while_loop(cond, body, init)

    @jax.jit
    def program(veff_data, h1e, s1e, x, dm0, conv_tol, conv_tol_grad,
                max_cycle):
        if veff_dm_fn is not None:
            # seed by diagonalizing the Fock of the untruncated guess
            vhf0, _ = veff_dm_fn(veff_data, dm0)
            _, moc0 = eigh_gen(h1e + vhf0, x)
            co0 = moc0[:, :nocc] * jnp.sqrt(2.0)
        else:
            # initial occupied factor from the guess's natural orbitals
            w0, u0 = jnp.linalg.eigh(dm0)
            co0 = (u0[:, ::-1][:, :nocc]
                   * jnp.sqrt(jnp.maximum(w0[::-1][:nocc], 0.0))[None, :])

        cyc0 = jnp.int32(0)
        if mixed_precision and h1e.dtype == jnp.float64:
            f32 = jnp.float32
            d32 = _cast_tree(veff_data, f32)
            # 'highest' = true-f32 MXU matmuls (multi-pass bf16); the
            # default fast mode plateaus at ~2e-3 relative error and the
            # pre-stage would never reach its gradient floor on TPU
            with jax.default_matmul_precision('highest'):
                cyc32, _, _, co32, _, _, _ = stage(
                    d32, h1e.astype(f32), s1e.astype(f32), x.astype(f32),
                    co0.astype(f32),
                    jnp.maximum(conv_tol, _F32_DE).astype(f32),
                    jnp.maximum(conv_tol_grad, _F32_GNORM).astype(f32),
                    jnp.minimum(max_cycle, _F32_MAX_CYCLE), cyc0)
            # universal backstop: if the f32 stage blew up (XC underflow,
            # functional-specific NaN edge), discard it and let the f64
            # stage start from the untouched guess — mixed precision must
            # never change what converges, only how fast
            ok32 = jnp.all(jnp.isfinite(co32))
            co0 = jnp.where(ok32, co32.astype(h1e.dtype), co0)
            cyc0 = jnp.where(ok32, cyc32, cyc0)

        cyc, done, _, _, f_last, _, _ = stage(
            veff_data, h1e, s1e, x, co0, conv_tol, conv_tol_grad,
            max_cycle + cyc0, cyc0)
        # extra diagonalization of the TRUE (un-extrapolated) converged Fock
        # for canonical mo_energy/mo_coeff (reference scf/hf.py:214-243),
        # then one final energy consistent with that density
        moe, moc = eigh_gen(f_last, x)
        co = moc[:, :nocc] * jnp.sqrt(2.0)
        dm = co @ co.T
        vhf, e2 = veff_fn(veff_data, dm, co)
        e_elec = jnp.sum(h1e * dm) + e2
        return e_elec, done, cyc, moe, moc, dm

    return program


def _occ_factor(dm, n):
    """co with co @ co.T ~= dm (top-n natural orbitals of the guess)."""
    w, u = jnp.linalg.eigh(dm)
    return u[:, ::-1][:, :n] * jnp.sqrt(jnp.maximum(w[::-1][:n], 0.0))[None, :]


def build_unrestricted_program(na, nb, diis_space, veff_fn,
                               veff_dm_fn=None, mixed_precision=True):
    """One-dispatch unrestricted SCF (UHF/UKS).

    veff_fn(veff_data, dma, dmb, coa, cob) -> (vhf (2,n,n), e2) traceable;
    co* are the occupied-orbital factors (occupation 1), dm_s == co_s co_s^T.
    veff_dm_fn(veff_data, dma, dmb) -> (vhf, e2) builds the potential from
    a (possibly non-idempotent) density; used once on the UNTRUNCATED
    initial guess so no guess information is lost to the rank-na/nb
    natural-orbital factorization (a truncated minao guess was observed to
    land open-shell systems in excited SCF basins).

    Returns a jitted program
      program(veff_data, h1e, s1e, x, dm0, conv_tol, conv_tol_grad,
              max_cycle) -> (e_elec, converged, n_cycles, mo_energy (2,n),
                             mo_coeff (2,n,n), dm (2,n,n))
    """

    def eigh_gen(f, x):
        from ..lib.linalg import eigh as _eigh
        fp = x.T @ f @ x
        e, cp = _eigh(fp)
        return e, x @ cp

    def make_fock_and_energy(veff_data, h1e, s1e):
        def err_of(dm, f):
            sdf = s1e @ dm @ f
            return sdf.T - sdf

        def fock_and_energy(coa, cob):
            dma = coa @ coa.T
            dmb = cob @ cob.T
            vhf, e2 = veff_fn(veff_data, dma, dmb, coa, cob)
            f = h1e[None] + vhf
            e_elec = jnp.sum(h1e * (dma + dmb)) + e2
            err = jnp.stack([err_of(dma, f[0]), err_of(dmb, f[1])])
            return f, e_elec, err
        return fock_and_energy

    def stage(veff_data, h1e, s1e, x, coa0, cob0, conv_tol, conv_tol_grad,
              max_cycle, cyc0):
        dt = h1e.dtype
        nao = h1e.shape[0]
        space = diis_space
        fock_and_energy = make_fock_and_energy(veff_data, h1e, s1e)

        def body(st):
            cyc, done, e_prev, coa, cob, fh, eh = st
            f, e_elec, err = fock_and_energy(coa, cob)
            idx = jnp.mod(cyc - cyc0, space)
            fh = fh.at[idx].set(f)
            eh = eh.at[idx].set(err)
            f_d = _diis_extrapolate(fh, eh,
                                    jnp.minimum(cyc - cyc0 + 1, space),
                                    newest=idx)
            _, ca = eigh_gen(f_d[0], x)
            _, cb = eigh_gen(f_d[1], x)
            coa_n = ca[:, :na]
            cob_n = cb[:, :nb]
            gnorm = jnp.sqrt(jnp.linalg.norm(x.T @ err[0] @ x) ** 2
                             + jnp.linalg.norm(x.T @ err[1] @ x) ** 2)
            de = jnp.abs(e_elec - e_prev)
            done = (de < conv_tol) & (gnorm < conv_tol_grad)
            return (cyc + 1, done, e_elec, coa_n, cob_n, fh, eh)

        def cond(st):
            return (~st[1]) & (st[0] < max_cycle)

        init = (cyc0, jnp.bool_(False), jnp.asarray(0.0, dt),
                coa0, cob0,
                jnp.zeros((space, 2, nao, nao), dt),
                jnp.zeros((space, 2, nao, nao), dt))
        return jax.lax.while_loop(cond, body, init)

    @jax.jit
    def program(veff_data, h1e, s1e, x, dm0, conv_tol, conv_tol_grad,
                max_cycle):
        if veff_dm_fn is not None:
            vhf0, _ = veff_dm_fn(veff_data, dm0[0], dm0[1])
            fp = jnp.einsum('ji,sjk,kl->sil', x, h1e[None] + vhf0, x)
            _, cpa = jnp.linalg.eigh(fp[0])
            _, cpb = jnp.linalg.eigh(fp[1])
            coa0 = (x @ cpa)[:, :na]
            cob0 = (x @ cpb)[:, :nb]
        else:
            coa0 = _occ_factor(dm0[0], na)
            cob0 = _occ_factor(dm0[1], nb)

        cyc0 = jnp.int32(0)
        if mixed_precision and h1e.dtype == jnp.float64:
            f32 = jnp.float32
            d32 = _cast_tree(veff_data, f32)
            with jax.default_matmul_precision('highest'):
                cyc32, _, _, coa32, cob32, _, _ = stage(
                    d32, h1e.astype(f32), s1e.astype(f32), x.astype(f32),
                    coa0.astype(f32), cob0.astype(f32),
                    jnp.maximum(conv_tol, _F32_DE).astype(f32),
                    jnp.maximum(conv_tol_grad, _F32_GNORM).astype(f32),
                    jnp.minimum(max_cycle, _F32_MAX_CYCLE), cyc0)
            # same non-finite backstop as the restricted program
            ok32 = jnp.all(jnp.isfinite(coa32)) & \
                jnp.all(jnp.isfinite(cob32))
            coa0 = jnp.where(ok32, coa32.astype(h1e.dtype), coa0)
            cob0 = jnp.where(ok32, cob32.astype(h1e.dtype), cob0)
            cyc0 = jnp.where(ok32, cyc32, cyc0)

        cyc, done, _, coa, cob, _, _ = stage(
            veff_data, h1e, s1e, x, coa0, cob0, conv_tol, conv_tol_grad,
            max_cycle + cyc0, cyc0)
        # extra diagonalization of the true Fock (reference hf.py:214-243)
        fock_and_energy = make_fock_and_energy(veff_data, h1e, s1e)
        f, _, _ = fock_and_energy(coa, cob)
        ea, ca = eigh_gen(f[0], x)
        eb, cb = eigh_gen(f[1], x)
        coa = ca[:, :na]
        cob = cb[:, :nb]
        f, e_elec, _ = fock_and_energy(coa, cob)
        dm = jnp.stack([coa @ coa.T, cob @ cob.T])
        return (e_elec, done, cyc, jnp.stack([ea, eb]), jnp.stack([ca, cb]),
                dm)

    return program


def build_restricted_cycle(nocc, diis_space, veff_fn, veff_dm_fn=None):
    """Single-cycle programs for the staged (host-driven) large-system SCF.

    The fused whole-loop program's executable grows with nao and at
    ~580 AO its load crashes the TPU worker; here each cycle is ONE
    modest compiled program (identical math: veff -> DIIS ring buffer ->
    extrapolated Fock -> generalized eigh -> new occupied factor), and
    the host drives convergence. Returns (seed, cycle, finalize).
    """

    def eigh_gen(f, x):
        from ..lib.linalg import eigh as _eigh
        fp = x.T @ f @ x
        e, cp = _eigh(fp)
        return e, x @ cp

    @jax.jit
    def seed(veff_data, h1e, x, dm0):
        """Occupied factor from diagonalizing F(guess density)."""
        if veff_dm_fn is not None:
            vhf0, _ = veff_dm_fn(veff_data, dm0)
            _, moc0 = eigh_gen(h1e + vhf0, x)
            co0 = moc0[:, :nocc] * jnp.sqrt(jnp.asarray(2.0, h1e.dtype))
        else:
            w0, u0 = jnp.linalg.eigh(dm0)
            co0 = (u0[:, ::-1][:, :nocc]
                   * jnp.sqrt(jnp.maximum(w0[::-1][:nocc], 0.0))[None, :])
        return co0

    @jax.jit
    def cycle(veff_data, h1e, s1e, x, co, fh, eh, cyc):
        dt = h1e.dtype
        dm = co @ co.T
        vhf, e2 = veff_fn(veff_data, dm, co)
        f = h1e + vhf
        e_elec = jnp.sum(h1e * dm) + e2
        sdf = s1e @ dm @ f
        err = sdf.T - sdf
        idx = jnp.mod(cyc, diis_space)
        fh = fh.at[idx].set(f)
        eh = eh.at[idx].set(err)
        f_d = _diis_extrapolate(fh, eh, jnp.minimum(cyc + 1, diis_space),
                                newest=idx)
        _, moc = eigh_gen(f_d, x)
        co_n = moc[:, :nocc] * jnp.sqrt(jnp.asarray(2.0, dt))
        gnorm = jnp.linalg.norm(x.T @ err @ x)
        return co_n, fh, eh, e_elec, gnorm

    @jax.jit
    def finalize(veff_data, h1e, x, co):
        """Canonical orbitals of the true converged Fock + final energy."""
        dm = co @ co.T
        vhf, _ = veff_fn(veff_data, dm, co)
        moe, moc = eigh_gen(h1e + vhf, x)
        co2 = moc[:, :nocc] * jnp.sqrt(jnp.asarray(2.0, h1e.dtype))
        dm2 = co2 @ co2.T
        vhf2, e22 = veff_fn(veff_data, dm2, co2)
        e_elec = jnp.sum(h1e * dm2) + e22
        return e_elec, moe, moc, dm2

    return seed, cycle, finalize


def get_program(mol, key, builder):
    """Per-molecule compiled-program cache."""
    cache = getattr(mol, '_scf_prog_cache', None)
    if cache is None:
        cache = mol._scf_prog_cache = {}
    if key not in cache:
        cache[key] = builder()
    return cache[key]
