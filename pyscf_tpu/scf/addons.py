"""SCF addons (analog of reference pyscf/scf/addons.py + smearing.py)."""
import numpy as np
import jax.numpy as jnp


def remove_linear_dep_(mf, threshold=1e-8):
    """Raise the canonical-orthogonalization threshold (reference
    scf/addons.py remove_linear_dep_)."""
    mf.lindep_thresh = threshold
    return mf


def project_dm_nr2nr(mol1, dm1, mol2):
    """Project a density matrix from mol1's basis onto mol2's basis."""
    from ..ops.integrals.int1e import int1e_ovlp_cross
    s22 = np.asarray(mol2.intor('int1e_ovlp'))
    s21 = np.asarray(int1e_ovlp_cross(mol2, mol1))
    p = np.linalg.solve(s22, s21)
    return jnp.asarray(p @ np.asarray(dm1) @ p.T)


def project_mo_nr2nr(mol1, mo1, mol2):
    from ..ops.integrals.int1e import int1e_ovlp_cross
    s22 = np.asarray(mol2.intor('int1e_ovlp'))
    s21 = np.asarray(int1e_ovlp_cross(mol2, mol1))
    return jnp.asarray(np.linalg.solve(s22, s21 @ np.asarray(mo1)))


def smearing_(mf, sigma=0.01, method='fermi'):
    """Finite-temperature (smeared) occupations (reference scf/smearing.py).

    Replaces mf.get_occ with Fermi-Dirac or Gaussian smearing; adds the
    electronic entropy to mf.e_free bookkeeping.
    """
    from scipy.optimize import brentq
    is_uhf = mf.__class__.__name__.startswith('U')

    def fermi_occ(mo_energy, nelec, spin_factor):
        e = np.asarray(mo_energy)

        def ne_of_mu(mu):
            if method == 'fermi':
                f = 1.0 / (np.exp((e - mu) / sigma) + 1.0)
            else:
                from scipy.special import erfc
                f = 0.5 * erfc((e - mu) / sigma)
            return spin_factor * f.sum() - nelec

        lo, hi = e.min() - 10 * sigma - 1, e.max() + 10 * sigma + 1
        mu = brentq(ne_of_mu, lo, hi)
        if method == 'fermi':
            f = 1.0 / (np.exp((e - mu) / sigma) + 1.0)
        else:
            from scipy.special import erfc
            f = 0.5 * erfc((e - mu) / sigma)
        return spin_factor * f, mu

    if is_uhf:
        def get_occ(mo_energy, mo_coeff=None):
            na, nb = mf.mol.nelec
            fa, _ = fermi_occ(mo_energy[0], na, 1.0)
            fb, _ = fermi_occ(mo_energy[1], nb, 1.0)
            return jnp.asarray(np.stack([fa, fb]))
    else:
        def get_occ(mo_energy, mo_coeff=None):
            f, mf.mu = fermi_occ(mo_energy, mf.mol.nelectron, 2.0)
            return jnp.asarray(f)

    mf.get_occ = get_occ
    mf.sigma = sigma
    return mf


def convert_to_uhf(mf):
    """RHF -> UHF object carrying over the converged solution."""
    from .uhf import UHF
    umf = UHF(mf.mol)
    umf._eri = mf._eri
    if mf.mo_coeff is not None:
        umf.mo_coeff = jnp.stack([mf.mo_coeff, mf.mo_coeff])
        occ = np.asarray(mf.mo_occ)
        umf.mo_occ = jnp.asarray(np.stack([(occ > 0) * 1.0, (occ == 2) * 1.0]))
        umf.mo_energy = jnp.stack([mf.mo_energy, mf.mo_energy])
        umf.e_tot = mf.e_tot
        umf.converged = mf.converged
    return umf


def convert_to_ghf(mf):
    """RHF/UHF -> GHF object carrying over the converged solution
    (reference scf/addons.py convert_to_ghf): spatial orbitals become
    spin-blocked spinors sorted occupied-first by energy."""
    from .ghf import GHF
    gmf = GHF(mf.mol)
    gmf._eri = mf._eri
    if mf.mo_coeff is None:
        return gmf
    c = np.asarray(mf.mo_coeff)
    e = np.asarray(mf.mo_energy)
    o = np.asarray(mf.mo_occ)
    if c.ndim == 2:                      # RHF
        c = np.stack([c, c])
        e = np.stack([e, e])
        o = np.stack([(o > 0) * 1.0, (o == 2) * 1.0])
    nao, nmo = c.shape[1], c.shape[2]
    entries = []
    for s in range(2):
        for p in range(nmo):
            entries.append((e[s][p], s, p, o[s][p] > 0))
    entries.sort(key=lambda t: (not t[3], t[0]))
    cg = np.zeros((2 * nao, 2 * nmo))
    eg = np.zeros(2 * nmo)
    og = np.zeros(2 * nmo)
    for q, (ep, s, p, occ) in enumerate(entries):
        cg[s * nao:(s + 1) * nao, q] = c[s][:, p]
        eg[q] = ep
        og[q] = 1.0 if occ else 0.0
    gmf.mo_coeff = jnp.asarray(cg)
    gmf.mo_energy = jnp.asarray(eg)
    gmf.mo_occ = jnp.asarray(og)
    gmf.e_tot = mf.e_tot
    gmf.converged = mf.converged
    return gmf


def mom_occ_(mf, occorb, setocc):
    """Maximum-overlap-method occupations for delta-SCF excited states
    (reference scf/addons.py mom_occ:500). Replaces mf.get_occ so each
    cycle occupies the new MOs with the largest projection onto the
    span of the user-chosen reference occupation pattern, instead of
    aufbau — which keeps a non-aufbau hole (e.g. HOMO->LUMO promotion)
    from collapsing back to the ground state.

    occorb: reference MO coefficients ((nao,nmo) or (2,nao,nmo));
    setocc: target occupation pattern matching occorb. The instance-
    level get_occ override automatically routes SCF to the host loop
    (hf.py _fused_ok).
    """
    occorb = np.asarray(occorb)
    setocc = np.asarray(setocc, dtype=float)
    s1e = np.asarray(mf.get_ovlp())
    unrestricted = setocc.ndim == 2

    def _pick(c_ref_occ, c_new, nocc):
        p = c_ref_occ.T @ s1e @ np.asarray(c_new)   # (nref_occ, nmo)
        w = np.sum(p * p, axis=0)
        occ = np.zeros(c_new.shape[1])
        occ[np.argsort(w)[::-1][:nocc]] = 1.0
        return occ

    def get_occ(mo_energy, mo_coeff=None):
        import jax.numpy as jnp
        if mo_coeff is None:
            return type(mf).get_occ(mf, mo_energy)
        if unrestricted:
            occs = []
            for sp in range(2):
                ref = occorb[sp][:, setocc[sp] > 0]
                occs.append(_pick(ref, mo_coeff[sp], ref.shape[1]))
            return jnp.asarray(np.stack(occs))
        ref = occorb[:, setocc > 0]
        return jnp.asarray(2.0 * _pick(ref, mo_coeff, ref.shape[1]))

    mf.get_occ = get_occ
    return mf
