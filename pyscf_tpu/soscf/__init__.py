"""Second-order SCF (analog of reference pyscf/soscf/newton_ah.py).

The reference's co-iterative augmented Hessian (CIAH) is replaced by
quasi-Newton (L-BFGS) minimization over occupied-virtual rotations with
the exact orbital gradient 4 F_ov — dense XLA Fock builds per step.
"""
import numpy as np
import scipy.linalg
import scipy.optimize
import jax.numpy as jnp


def newton(mf):
    """Wrap a converged-or-not mean-field with a robust SOSCF kernel."""
    kernel_orig = mf.kernel

    def soscf_kernel(dm0=None, **kwargs):
        mol = mf.mol
        s1e = mf.get_ovlp(mol)
        h1e = mf.get_hcore(mol)
        from ..lib.linalg import canonical_orth, eigh_gen
        x = canonical_orth(s1e, mf.lindep_thresh)
        mf._orth = x
        dm = jnp.asarray(dm0) if dm0 is not None else mf.get_init_guess(mol)
        # initial orbitals
        vhf = mf.get_veff(mol, dm)
        mo_e, mo_c = eigh_gen(h1e + vhf, x)
        mo_occ = mf.get_occ(mo_e, mo_c)
        occ = np.asarray(mo_occ) > 0
        nocc = int(occ.sum())
        mo0 = np.asarray(mo_c)
        nmo = mo0.shape[1]
        nvir = nmo - nocc

        state = {'mo': mo0}

        def fun(xk):
            kappa = np.zeros((nmo, nmo))
            kappa[:nocc, nocc:] = xk.reshape(nocc, nvir)
            kappa = kappa - kappa.T
            mo = state['mo'] @ scipy.linalg.expm(kappa)
            c = jnp.asarray(mo)
            occv = jnp.asarray((np.arange(nmo) < nocc) * 2.0)
            dm_k = (c * occv[None, :]) @ c.T
            vhf_k = mf.get_veff(mol, dm_k)
            e = mf.energy_tot(dm_k, h1e, vhf_k)
            fock = np.asarray(h1e + vhf_k)
            # with C' = C exp(kappa), kappa[occ,vir] = +K: dE/dK = -4 F_ov
            g = -4.0 * (mo[:, :nocc].T @ fock @ mo[:, nocc:])
            return float(e), g.ravel()

        # restart L-BFGS from a rebased orbital set: the first-order
        # expm chain rule is only accurate for small kappa
        gtol = max(np.sqrt(mf.conv_tol) * 0.1, 1e-7)
        for macro in range(30):
            res = scipy.optimize.minimize(
                fun, np.zeros(nocc * nvir), jac=True, method='L-BFGS-B',
                options={'maxiter': 12, 'gtol': gtol})
            kappa = np.zeros((nmo, nmo))
            kappa[:nocc, nocc:] = res.x.reshape(nocc, nvir)
            kappa = kappa - kappa.T
            state['mo'] = state['mo'] @ scipy.linalg.expm(kappa)
            if np.linalg.norm(res.jac) < gtol * 10 \
                    and np.linalg.norm(res.x) < 1e-6:
                break
        mo = state['mo']
        c = jnp.asarray(mo)
        occv = jnp.asarray((np.arange(nmo) < nocc) * 2.0)
        dm_f = (c * occv[None, :]) @ c.T
        vhf_f = mf.get_veff(mol, dm_f)
        mo_e, mo_c = eigh_gen(h1e + vhf_f, x)
        mf.mo_energy = mo_e
        mf.mo_coeff = mo_c
        mf.mo_occ = mf.get_occ(mo_e, mo_c)
        mf.e_tot = mf.energy_tot(dm_f, h1e, vhf_f)
        mf.converged = bool(res.success or
                            np.linalg.norm(res.jac) < 1e-4)
        return mf.e_tot

    mf.kernel = soscf_kernel
    return mf
