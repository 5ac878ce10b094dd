"""Spin-orbital (general) CCSD — covers GCCSD and UCCSD references.

Analog of reference pyscf/cc/gccsd.py / uccsd.py. Equations: Stanton,
Gauss, Watts, Bartlett, JCP 94, 4334 (1991), implemented as one jitted
XLA program over antisymmetrized spin-orbital integrals <pq||rs>.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..lib.diis import DIIS


def _spin_orbital_eris(mf):
    """Antisymmetrized <pq||rs> + fock diag in the spin-orbital basis."""
    from .. import ao2mo
    mol = mf.mol
    eri_ao = mf._eri if mf._eri is not None else mol.intor('int2e')
    mo_c = np.asarray(mf.mo_coeff)
    mo_e = np.asarray(mf.mo_energy)
    mo_o = np.asarray(mf.mo_occ)
    if mo_c.ndim == 2 and mo_c.shape[0] == 2 * mol.nao:
        # spinor coefficients (GHF / converted GHF / X2C): the chemist
        # MO ERI sums the alpha and beta AO blocks in every pair density
        return _spinor_eris(mol, eri_ao, mo_c, mo_e, mo_o)
    if mo_c.ndim == 2:              # RHF -> duplicate
        mo_c = np.stack([mo_c, mo_c])
        mo_e = np.stack([mo_e, mo_e])
        mo_o = np.stack([(mo_o > 0) * 1.0, (mo_o == 2) * 1.0])
    nmo = mo_c.shape[2]
    # spin orbitals sorted: occupied first (by energy), then virtuals
    entries = []
    for s in range(2):
        for p in range(nmo):
            entries.append((mo_e[s][p], s, p, mo_o[s][p] > 0))
    entries.sort(key=lambda t: (not t[3], t[0]))
    spins = np.array([e[1] for e in entries])
    orbs = np.array([e[2] for e in entries])
    energies = np.array([e[0] for e in entries])
    nocc = int(sum(1 for e in entries if e[3]))
    # spatial MO eri per spin-block pair
    c = [jnp.asarray(mo_c[0]), jnp.asarray(mo_c[1])]
    eri_sp = {}
    for s1 in range(2):
        for s2 in range(2):
            eri_sp[(s1, s2)] = np.asarray(ao2mo.general(
                eri_ao, (c[s1], c[s1], c[s2], c[s2])))
    nso = 2 * nmo
    # vectorized scatter: eri_mo[P,Q,R,S] = eri_sp[(sP,sR)][oP,oQ,oR,oS]
    # when sP==sQ and sR==sS, else 0
    eri_blk = np.stack([np.stack([eri_sp[(0, 0)], eri_sp[(0, 1)]]),
                        np.stack([eri_sp[(1, 0)], eri_sp[(1, 1)]])])
    sP = spins[:, None, None, None]
    sQ = spins[None, :, None, None]
    sR = spins[None, None, :, None]
    sS = spins[None, None, None, :]
    eri_mo = eri_blk[sP, sR,
                     orbs[:, None, None, None], orbs[None, :, None, None],
                     orbs[None, None, :, None], orbs[None, None, None, :]]
    eri_mo = eri_mo * ((sP == sQ) & (sR == sS))
    # physicists' antisymmetrized
    phys = eri_mo.transpose(0, 2, 1, 3)
    asym = phys - phys.transpose(0, 1, 3, 2)
    return jnp.asarray(asym), jnp.asarray(energies), nocc, spins, orbs


def _spinor_eris(mol, eri_ao, mo_c, mo_e, mo_o):
    """<PQ||RS> for general (possibly complex) 2-spinor coefficients."""
    nao = mol.nao
    order = np.lexsort((mo_e, ~(mo_o > 0)))
    c = mo_c[:, order]
    e = mo_e[order]
    occ = mo_o[order] > 0
    nocc = int(occ.sum())
    ca = jnp.asarray(c[:nao])
    cb = jnp.asarray(c[nao:])
    eri = jnp.asarray(np.asarray(eri_ao).reshape((nao,) * 4))
    half = (jnp.einsum('uvls,up,vq->pqls', eri, ca.conj(), ca)
            + jnp.einsum('uvls,up,vq->pqls', eri, cb.conj(), cb))
    full = (jnp.einsum('pqls,lr,sw->pqrw', half, ca.conj(), ca)
            + jnp.einsum('pqls,lr,sw->pqrw', half, cb.conj(), cb))
    phys = full.transpose(0, 2, 1, 3)
    asym = phys - phys.transpose(0, 1, 3, 2)
    nmo = c.shape[1]
    spins = np.zeros(nmo, dtype=int)
    orbs = np.arange(nmo)
    return asym, jnp.asarray(e), nocc, spins, orbs


@jax.jit
def _gccsd_energy(t1, t2, oovv):
    e = 0.25 * jnp.einsum('ijab,ijab->', oovv, t2)
    e += 0.5 * jnp.einsum('ijab,ia,jb->', oovv, t1, t1)
    return e


@jax.jit
def _gccsd_update(t1, t2, eris, mo_e, nocc_arr):
    """One spin-orbital CCSD iteration (SGWB Tables I-III), canonical f."""
    nocc = t1.shape[0]
    o = slice(0, nocc)
    v = slice(nocc, None)
    eo = mo_e[:nocc]
    ev = mo_e[nocc:]
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

    Fae = (jnp.einsum('mf,mafe->ae', t1, ovvv)
           - 0.5 * jnp.einsum('mnaf,mnef->ae', tau_t, oovv))
    Fmi = (jnp.einsum('ne,mnie->mi', t1, ooov)
           + 0.5 * jnp.einsum('inef,mnef->mi', tau_t, oovv))
    Fme = jnp.einsum('nf,mnef->me', t1, oovv)

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

    # T1
    t1new = (jnp.einsum('ie,ae->ia', t1, Fae)
             - jnp.einsum('ma,mi->ia', t1, Fmi)
             + jnp.einsum('imae,me->ia', t2, Fme)
             - jnp.einsum('nf,naif->ia', t1, ovov)
             - 0.5 * jnp.einsum('imef,maef->ia', t2, ovvv)
             - 0.5 * jnp.einsum('mnae,nmei->ia', t2, oovo))
    # T2
    Fae_mod = Fae - 0.5 * jnp.einsum('mb,me->be', t1, Fme)
    Fmi_mod = Fmi + 0.5 * jnp.einsum('je,me->mj', t1, Fme)
    # driving term <ab||ij> = conj(<ij||ab>) (complex Bloch orbitals;
    # no-op for real molecular integrals -- reference cc/gccsd.py:74)
    t2new = jnp.conj(oovv)
    tmp = jnp.einsum('ijae,be->ijab', t2, Fae_mod)
    t2new = t2new + tmp - tmp.transpose(0, 1, 3, 2)
    tmp = jnp.einsum('imab,mj->ijab', t2, Fmi_mod)
    t2new = t2new - tmp + tmp.transpose(1, 0, 2, 3)
    t2new = t2new + 0.5 * jnp.einsum('mnab,mnij->ijab', tau, Wmnij)
    t2new = t2new + 0.5 * jnp.einsum('ijef,abef->ijab', tau, Wabef)
    tmp = (jnp.einsum('imae,mbej->ijab', t2, Wmbej)
           - jnp.einsum('ie,ma,mbej->ijab', t1, t1, ovvo))
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    t2new = t2new + tmp
    tmp = jnp.einsum('ie,abej->ijab', t1, vvvo)
    t2new = t2new + tmp - tmp.transpose(1, 0, 2, 3)
    tmp = jnp.einsum('ma,mbij->ijab', t1, ovoo)
    t2new = t2new - tmp + tmp.transpose(0, 1, 3, 2)

    eia = eo[:, None] - ev[None, :]
    eijab = (eia[:, None, :, None] + eia[None, :, None, :])
    return t1new / eia, t2new / eijab


class GCCSD:
    conv_tol = 1e-8
    conv_tol_normt = 1e-6
    max_cycle = 100
    diis_space = 6

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.verbose = mf.mol.verbose
        self.frozen = frozen or 0
        self.converged = False
        self.e_corr = None

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + float(self.e_corr)

    def kernel(self):
        eris, mo_e, nocc, spins, orbs = _spin_orbital_eris(self._scf)
        self._so_map = (spins, orbs)
        nocc -= 2 * self.frozen
        if self.frozen:
            f2 = 2 * self.frozen
            eris = eris[f2:, f2:, f2:, f2:]
            mo_e = mo_e[f2:]
        nso = mo_e.shape[0]
        nvir = nso - nocc
        o = slice(0, nocc)
        v = slice(nocc, None)
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        t2 = jnp.conj(oovv) / eijab
        t1 = jnp.zeros((nocc, nvir), dtype=eris.dtype)
        emp2 = float(_gccsd_energy(t1, t2, oovv).real)
        if self.verbose >= 4:
            print(f'GMP2 E_corr = {emp2:.12f}')
        diis = DIIS(self.diis_space)
        e_last = emp2
        conv = False
        for it in range(self.max_cycle):
            t1n, t2n = _gccsd_update(t1, t2, eris, mo_e, jnp.asarray(nocc))
            normt = float(jnp.linalg.norm(t1n - t1)
                          + jnp.linalg.norm(t2n - t2))
            t1, t2 = diis.update((t1n, t2n), (t1n - t1, t2n - t2))
            e_corr = float(_gccsd_energy(t1, t2, oovv).real)
            de = e_corr - e_last
            e_last = e_corr
            if self.verbose >= 4:
                print(f'cycle {it + 1} E_corr = {e_corr:.12f} '
                      f'dE = {de:.3g} |t| = {normt:.3g}')
            if abs(de) < self.conv_tol and normt < self.conv_tol_normt:
                conv = True
                break
        self.converged = conv
        self.e_corr = e_corr
        self.t1, self.t2 = t1, t2
        self._eris_so = eris
        self._mo_e_so = mo_e
        self._nocc_so = nocc
        return self.e_corr, t1, t2

    run = kernel

    def solve_lambda(self, tol=None):
        """Λ amplitudes via the vjp fixed point (cc/gccsd_lambda.py)."""
        from . import gccsd_lambda as gl
        f = jnp.diag(jnp.asarray(self._mo_e_so))
        self.l1, self.l2, conv = gl.solve_lambda(
            self.t1, self.t2, f, self._eris_so,
            jnp.asarray(self._mo_e_so),
            tol=tol or max(self.conv_tol_normt, 1e-7),
            verbose=self.verbose)
        self.lambda_converged = conv
        return self.l1, self.l2

    def make_rdm1(self, ao_repr=False):
        """CCSD response 1-RDM (HF part + correlation correction).

        Spin-orbital basis by default; ao_repr=True returns the spatial
        AO density (spin-summed), reference cc/ccsd_rdm.py:make_rdm1."""
        from . import gccsd_lambda as gl
        if not hasattr(self, 'l1'):
            self.solve_lambda()
        f = jnp.diag(jnp.asarray(self._mo_e_so))
        g1, _ = gl.make_rdm12(self.t1, self.t2, self.l1, self.l2, f,
                              self._eris_so)
        nso = g1.shape[0]
        nocc = self._nocc_so
        dm_so = np.array(g1)
        dm_so[np.arange(nocc), np.arange(nocc)] += 1.0   # HF part
        if not ao_repr:
            return dm_so
        spins, orbs = self._so_map
        if self.frozen:
            f2 = 2 * self.frozen
            spins = spins[f2:]
            orbs = orbs[f2:]
            # frozen core still contributes its HF density
        mo_c = np.asarray(self._scf.mo_coeff)
        if mo_c.ndim == 2:
            mo_c = np.stack([mo_c, mo_c])
        C = np.stack([mo_c[s][:, p] for s, p in zip(spins, orbs)], axis=1)
        dm_ao = C @ dm_so @ C.T
        if self.frozen:
            for s, p in zip(*[m[:2 * self.frozen]
                              for m in self._so_map]):
                dm_ao += np.outer(mo_c[s][:, p], mo_c[s][:, p])
        return dm_ao

    def make_rdm2(self):
        from . import gccsd_lambda as gl
        if not hasattr(self, 'l1'):
            self.solve_lambda()
        f = jnp.diag(jnp.asarray(self._mo_e_so))
        _, g2 = gl.make_rdm12(self.t1, self.t2, self.l1, self.l2, f,
                              self._eris_so)
        return g2


UCCSD = GCCSD
