"""Second-order SCF: device-resident augmented-Hessian Newton (CIAH).

Analog of the reference's co-iterative augmented-Hessian solver
(pyscf/soscf/newton_ah.py:470 kernel, :624 _CIAH_SOSCF), redesigned for
the TPU stack: the orbital-rotation energy E(kappa) is a pure JAX
function (orbitals rotated by expm(kappa), Fock/XC through the same
traceable veff closure the fused SCF driver uses), so

  g      = jax.grad(E)(0)            (exact orbital gradient)
  H @ v  = jax.jvp(grad E)(0; v)     (exact Hessian action, including the
                                      full JK/XC orbital response -- the
                                      reference hand-codes this in
                                      gen_g_hop, newton_ah.py:49-210)

Each macro iteration solves the augmented-Hessian eigenproblem
  [[0, g^T], [g, H]] (x0, x) = e (x0, x)
by Davidson with the jitted H action, applies the trust-region-scaled
step kappa = x / x0, and rebases the orbitals. Quadratically convergent
near the solution; the AH level shift keeps it robust far from it.
"""
import numpy as np
import jax
import jax.numpy as jnp


def _ah_davidson(g, hvp, trust, max_space=20, tol=1e-8):
    """Lowest eigenpair of the augmented Hessian [[0, g^T], [g, H]].

    Returns the Newton/AH step kappa (same shape as g). Davidson subspace
    on host, each H action is one jitted jvp on device (the analog of the
    reference's davidson_cc, newton_ah.py:270)."""
    n = g.size
    gn = np.linalg.norm(g)
    # basis of the AH space: vectors (x0, x) with x (n,)
    V = [np.concatenate([[1.0], np.zeros(n)])]
    if gn > 1e-14:
        V.append(np.concatenate([[0.0], g / gn]))

    def apply_ah(v):
        x0, x = v[0], v[1:]
        hx = np.asarray(hvp(jnp.asarray(x)))
        return np.concatenate([[g @ x], x0 * g + hx])

    AV = [apply_ah(v) for v in V]
    theta = 0.0
    for _ in range(max_space):
        m = len(V)
        Vm = np.stack(V)
        Am = Vm @ np.stack(AV).T
        Am = 0.5 * (Am + Am.T)
        w, c = np.linalg.eigh(Am)
        theta = w[0]
        u = Vm.T @ c[:, 0]
        Au = np.stack(AV).T @ c[:, 0]
        r = Au - theta * u
        if np.linalg.norm(r) < tol * max(1.0, abs(theta)):
            break
        # diagonal preconditioner ~ (diag(H) - theta); use a Fock-free
        # uniform guess (safe: Davidson only needs a direction)
        t = r / (1.0 + np.abs(r) * 0 + max(abs(theta), 1e-3))
        for v in V:
            t = t - (v @ t) * v
        nt = np.linalg.norm(t)
        if nt < 1e-12:
            break
        t = t / nt
        V.append(t)
        AV.append(apply_ah(t))
    x0, x = u[0], u[1:]
    if abs(x0) < 1e-8:
        step = x * (trust / max(np.linalg.norm(x), 1e-12))
    else:
        step = x / x0
        sn = np.linalg.norm(step)
        if sn > trust:
            step = step * (trust / sn)
    return step, theta


def newton(mf):
    """Wrap a mean-field with the augmented-Hessian Newton kernel.

    Requires a restricted mean-field the fused driver covers (RHF/RKS,
    in-core or DF, optionally mesh-sharded); other classes keep their
    original kernel."""
    if getattr(mf, '_fused_kind', None) != 'restricted':
        raise NotImplementedError(
            'newton(): augmented-Hessian SOSCF requires a restricted '
            'mean-field with a traceable veff (RHF/RKS)')

    def soscf_kernel(dm0=None, **kwargs):
        mol = mf.mol
        log = getattr(mf, 'log', None)
        s1e = jnp.asarray(mf.get_ovlp(mol))
        h1e = jnp.asarray(mf.get_hcore(mol))
        from ..lib.linalg import canonical_orth, eigh_gen
        x = canonical_orth(s1e, mf.lindep_thresh)
        res = mf._fused_veff()
        veff_dm_fn = res[3]
        data = res[2]
        dm = jnp.asarray(dm0) if dm0 is not None else \
            jnp.asarray(mf.get_init_guess(mol))
        vhf, _ = veff_dm_fn(data, dm)
        mo_e, mo_c = eigh_gen(h1e + vhf, x)
        mo_occ = mf.get_occ(mo_e, mo_c)
        occv = jnp.asarray(np.asarray(mo_occ, dtype=float))
        nocc = int((np.asarray(mo_occ) > 0).sum())
        nmo = mo_c.shape[1]
        nvir = nmo - nocc
        iv, io = np.meshgrid(np.arange(nvir), np.arange(nocc),
                             indexing='ij')

        @jax.jit
        def e_elec(kx, mo0):
            kap = jnp.zeros((nmo, nmo))
            kap = kap.at[nocc + iv.ravel(), io.ravel()].set(kx)
            kap = kap - kap.T
            u = jax.scipy.linalg.expm(kap)
            c = mo0 @ u
            dm_k = (c * occv[None, :]) @ c.T
            _, e2 = veff_dm_fn(data, dm_k)
            return jnp.sum(h1e * dm_k) + e2

        grad_fn = jax.jit(jax.grad(e_elec))
        zero = jnp.zeros(nocc * nvir)

        @jax.jit
        def hvp_fn(v, mo0):
            return jax.jvp(lambda k: grad_fn(k, mo0), (zero,), (v,))[1]

        mo0 = mo_c
        e_nuc = float(mol.energy_nuc())
        e_last = float(e_elec(zero, mo0)) + e_nuc
        trust = 0.4
        conv = False
        max_macro = getattr(mf, 'max_cycle', 50)
        for macro in range(max_macro):
            g = np.asarray(grad_fn(zero, mo0))
            gnorm = np.linalg.norm(g)
            if log is not None:
                log.info('Newton macro %d  E = %.12f  |g| = %.3e',
                         macro, e_last, gnorm)
            tol_g = getattr(mf, 'conv_tol_grad', None) or \
                np.sqrt(mf.conv_tol)
            if gnorm < tol_g:
                conv = True
                break
            step, _ = _ah_davidson(g, lambda v: hvp_fn(v, mo0), trust)
            e_new = float(e_elec(jnp.asarray(step), mo0)) + e_nuc
            if e_new > e_last + 1e-12 and trust > 0.05:
                trust *= 0.5          # reject-and-shrink
                continue
            trust = min(0.4, trust * 1.5)
            kap = np.zeros((nmo, nmo))
            kap[nocc + iv.ravel(), io.ravel()] = step
            kap = kap - kap.T
            import scipy.linalg
            mo0 = jnp.asarray(np.asarray(mo0) @ scipy.linalg.expm(kap))
            if abs(e_new - e_last) < mf.conv_tol and \
                    np.linalg.norm(step) < 1e-5:
                e_last = e_new
                conv = True
                break
            e_last = e_new
        # canonicalize: diagonalize the final Fock
        c = mo0
        dm_f = (c * occv[None, :]) @ c.T
        vhf_f, e2 = veff_dm_fn(data, dm_f)
        mo_e, mo_c = eigh_gen(h1e + vhf_f, x)
        mf.mo_energy = mo_e
        mf.mo_coeff = mo_c
        mf.mo_occ = mf.get_occ(mo_e, mo_c)
        mf.e_tot = float(jnp.sum(h1e * dm_f) + e2) + e_nuc
        g_final = np.asarray(grad_fn(zero, mo0))
        mf.converged = conv and np.linalg.norm(g_final) < 1e-4
        return mf.e_tot

    mf.kernel = soscf_kernel
    return mf
