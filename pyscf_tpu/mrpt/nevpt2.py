"""Strongly-contracted NEVPT2 (SC-NEVPT2).

Reference analog: pyscf/mrpt/nevpt2.py (Sr/Si/Sijrs/Sijr/Srsi/Srs/Sij/Sir +
kernel), which evaluates each perturber class through hand-derived
contractions of 1- to 4-particle active-space density matrices (C kernels
lib/mcscf/fci_rdm.c, nevpt_contract.c).

TPU-native redesign: no explicit 3/4-PDM. Each strongly-contracted perturber
|Phi_mu> = P_mu H |Psi0> is built DIRECTLY as an active-space CI vector by
applying the class's second-quantized operators to the CAS ground state
(fci/ops.py primitives); class norms N_mu = <Phi|Phi> and Koopmans energies
e_mu = <Phi|H_act|Phi>/N - E0 then reduce to GEMMs over operator-applied
CI-vector matrices. A generic normal-ordering routine fixes every fermionic
sign mechanically, and the whole construction is validated against an exact
full-Fock-space projection in tests.

  E2 = - sum_mu N_mu / (delta_eps_mu + e_mu)

with delta_eps from canonicalized core/virtual orbital energies (Dyall H).
"""
import numpy as np

from ..fci import cistring, direct_spin1
from ..fci import ops as fops
from ..ao2mo import full as ao2mo_full


# ---------------------------------------------------------------------------
# generic second-quantized term engine
# ---------------------------------------------------------------------------

def _normal_order_sign_and_key(op_list):
    """op_list: [(tag, spin, dag, is_ext)] in H order (leftmost first).

    Moves external ops to the front in canonical sorted order, keeping the
    active ops' relative order. Returns (sign, ext_key, act_ops) or None if
    an external op is duplicated (vanishes).
    """
    ext = [(i, op) for i, op in enumerate(op_list) if op[3]]
    act = [(i, op) for i, op in enumerate(op_list) if not op[3]]
    keyed = sorted(ext, key=lambda x: (x[1][0], x[1][1], x[1][2]))
    ext_key = tuple((op[0], op[1], op[2]) for _, op in keyed)
    if len(set(ext_key)) != len(ext_key):
        return None
    # permutation: new order = [sorted ext indices] + [act indices in order]
    perm = [i for i, _ in keyed] + [i for i, _ in act]
    sign = 1
    for a in range(len(perm)):
        for b in range(a + 1, len(perm)):
            if perm[a] > perm[b]:
                sign = -sign
    act_ops = [(op[0], op[1], op[2]) for _, op in act]
    return sign, ext_key, act_ops


class _AppliedCache:
    """Operator-string-applied CI vectors, cached per (act op template).

    T[(ops key)] = (matrix (nact^k, ndet_out), nelec_out); active op slots
    run over all active labels.
    """

    def __init__(self, ci0, ncas, nelec):
        self.ci0 = np.asarray(ci0)
        self.ncas = ncas
        self.nelec = nelec
        self.cache = {}

    def get(self, act_ops):
        """act_ops: tuple of (slot, spin, dag); slots are 0..k-1 in order."""
        key = tuple(act_ops)
        if key in self.cache:
            return self.cache[key]
        k = len(act_ops)
        ncas = self.ncas
        if k == 0:
            mat = self.ci0.reshape(1, -1).copy()
            out = (mat, self.nelec)
        else:
            rows = []
            nelec_out = None
            for labels in np.ndindex(*([ncas] * k)):
                ops = [(labels[slot], spin, dag)
                       for (slot, spin, dag) in act_ops]
                v, ne = fops.apply_op(self.ci0, ncas, self.nelec, ops)
                nelec_out = ne
                rows.append(None if v is None else v.ravel())
            if not (0 <= nelec_out[0] <= ncas and 0 <= nelec_out[1] <= ncas):
                out = (None, nelec_out)     # sector does not exist
            else:
                nd = (cistring.num_strings(ncas, nelec_out[0])
                      * cistring.num_strings(ncas, nelec_out[1]))
                rows = [np.zeros(nd) if r is None else r for r in rows]
                out = (np.array(rows), nelec_out)
        self.cache[key] = out
        return out


def _class_contrib(terms, cache, h1cas, eri_cas, e0_act):
    """One perturber instance: terms = [(C, op_list)], with op_list entries
    (tag, spinvar, dag, is_ext) and spinvar in {'s','t'} (or fixed 0/1).

    Returns (norm, e_koopmans*norm) summed over external spin patterns.
    """
    ncas = cache.ncas
    phis = {}
    sector = {}
    for C, op_list in terms:
        C = np.asarray(C)
        spinvars = sorted({op[1] for op in op_list if isinstance(op[1], str)})
        assign_iter = (
            [dict(zip(spinvars, bits))
             for bits in np.ndindex(*([2] * len(spinvars)))]
            if spinvars else [dict()])
        for assign in assign_iter:
            resolved = []
            nact_ops = 0
            for (tag, sv, dag, is_ext) in op_list:
                spin = assign[sv] if isinstance(sv, str) else sv
                if is_ext:
                    resolved.append((tag, spin, dag, True))
                else:
                    # tag IS the coefficient-tensor dimension index
                    resolved.append((tag, spin, dag, False))
                    nact_ops += 1
            assert (sorted(op[0] for op in resolved if not op[3])
                    == list(range(nact_ops)))
            res = _normal_order_sign_and_key(resolved)
            if res is None:
                continue
            sign, ext_key, act_ops = res
            T, ne_out = cache.get(tuple(act_ops))
            if T is None:
                continue
            contrib = sign * (C.ravel() @ T)
            if ext_key in phis:
                assert sector[ext_key] == ne_out
                phis[ext_key] = phis[ext_key] + contrib
            else:
                phis[ext_key] = contrib
                sector[ext_key] = ne_out
    norm = 0.0
    h_num = 0.0
    for key, phi in phis.items():
        n = float(phi @ phi)
        if n < 1e-14:
            continue
        norm += n
        ne = sector[key]
        h2e = direct_spin1.absorb_h1e(h1cas, eri_cas, ncas, ne, 0.5)
        hphi = np.asarray(direct_spin1.contract_2e(
            h2e, phi.reshape(cistring.num_strings(ncas, ne[0]),
                             cistring.num_strings(ncas, ne[1])),
            ncas, ne)).ravel()
        h_num += float(phi @ hphi)
    return norm, h_num - e0_act * norm


# ---------------------------------------------------------------------------
# orbital canonicalization + integral setup
# ---------------------------------------------------------------------------

def _setup(mc):
    """Canonicalize core/virt orbitals against the generalized Fock; build
    MO-basis integral blocks. Mirrors reference mc.canonicalize_ +
    nevpt2._ERIS."""
    mol = mc.mol
    mf = mc._scf
    mo = np.asarray(mc.mo_coeff)
    nc, ncas = mc.ncore, mc.ncas
    nmo = mo.shape[1]
    nv = nmo - nc - ncas

    dm1_act = np.asarray(direct_spin1.make_rdm1(mc.ci, ncas, mc.nelecas))
    mo_core = mo[:, :nc]
    mo_act = mo[:, nc:nc + ncas]
    dm_core = 2.0 * mo_core @ mo_core.T
    dm_act = mo_act @ dm1_act @ mo_act.T
    hcore = np.asarray(mf.get_hcore())
    vj, vk = mf.get_jk(mol, dm_core + dm_act)
    # generalized Fock: J - K/2 of (2*core + active-RDM) density
    f_ao = hcore + np.asarray(vj) - 0.5 * np.asarray(vk)
    f = mo.T @ f_ao @ mo

    def _canon(block):
        if block.shape[0] == 0:
            return np.zeros(0), np.eye(0)
        w, u = np.linalg.eigh(block)
        return w, u

    eps_c, uc = _canon(f[:nc, :nc])
    eps_v, uv = _canon(f[nc + ncas:, nc + ncas:])
    mo_canon = mo.copy()
    mo_canon[:, :nc] = mo[:, :nc] @ uc
    mo_canon[:, nc + ncas:] = mo[:, nc + ncas:] @ uv

    eri_mo = np.asarray(ao2mo_full(mol, mo_canon))
    eri_mo = eri_mo.reshape(nmo, nmo, nmo, nmo)
    h_mo = mo_canon.T @ hcore @ mo_canon
    # core-dressed one-electron operator: h + sum_j [2(pq|jj) - (pj|jq)]
    heff = (h_mo + 2.0 * np.einsum('pqjj->pq', eri_mo[:, :, :nc, :nc])
            - np.einsum('pjjq->pq', eri_mo[:, :nc, :nc, :]))
    return mo_canon, eps_c, eps_v, h_mo, eri_mo, heff


def _sc_from_mo(eri, heff, eps_c, eps_v, nc, ncas, ci0, nelecas,
                verbose=False):
    """SC-NEVPT2 from MO-basis integrals with canonical core/virt energies.

    eri: full (nmo,nmo,nmo,nmo) chemists' MO integrals; heff: core-dressed
    one-electron matrix; returns (e_corr, {class: (norm, energy)})."""
    nmo = heff.shape[0]
    A = slice(nc, nc + ncas)
    ci0 = np.asarray(ci0)
    h1cas = heff[A, A]
    eri_cas = eri[A, A, A, A]
    cache = _AppliedCache(ci0, ncas, nelecas)
    h2e0 = direct_spin1.absorb_h1e(h1cas, eri_cas, ncas, nelecas, 0.5)
    hci0 = np.asarray(direct_spin1.contract_2e(h2e0, ci0, ncas, nelecas))
    e0_act = float(ci0.ravel() @ hci0.ravel())

    results = {}
    e_tot = 0.0
    co = np.arange(nc)
    vi = np.arange(nc + ncas, nmo)

    def _accum(name, pairs):
        norm_sum, e_sum = 0.0, 0.0
        for n, hn, de in pairs:
            if n < 1e-12:
                continue
            e_sum += -n / (de + hn / n)
            norm_sum += n
        results[name] = (norm_sum, e_sum)
        return e_sum

    # ---- Sijrs: no active operators; closed-form MP2-like sum
    if nc and len(vi):
        V = slice(nc + ncas, nmo)
        g = eri[V, :nc, V, :nc]                       # (r i | s j)
        d = (eps_v[:, None, None, None] + eps_v[None, None, :, None]
             - eps_c[None, :, None, None] - eps_c[None, None, None, :])
        num = g * (2.0 * g - g.transpose(0, 3, 2, 1))
        results['Sijrs'] = (float(num.sum()), float(-(num / d).sum()))
        e_tot += results['Sijrs'][1]
    else:
        results['Sijrs'] = (0.0, 0.0)

    # ---- Sr (-1)': one electron active -> virt r
    def _sr():
        for r in vi:
            terms = [
                (heff[r, A], [('r', 's', True, True), (0, 's', False, False)]),
                (eri[r, A, A, A],
                 [('r', 's', True, True), (1, 't', True, False),
                  (2, 't', False, False), (0, 's', False, False)]),
            ]
            n, hn = _class_contrib(terms, cache, h1cas, eri_cas, e0_act)
            yield n, hn, eps_v[r - nc - ncas]
    e_tot += _accum('Sr', _sr())

    # ---- Si (+1)': one electron core i -> active
    def _si():
        for i in co:
            terms = [
                (heff[A, i], [(0, 's', True, False), ('i', 's', False, True)]),
                (eri[A, i, A, A],
                 [(0, 's', True, False), (1, 't', True, False),
                  (2, 't', False, False), ('i', 's', False, True)]),
            ]
            n, hn = _class_contrib(terms, cache, h1cas, eri_cas, e0_act)
            yield n, hn, -eps_c[i]
    e_tot += _accum('Si', _si())

    # ---- Srs (-2): two active -> virt pair {r,s}
    def _srs():
        for ir, r in enumerate(vi):
            for s in vi[:ir + 1]:
                fac = 0.5 if r == s else 1.0
                # r==s: same tag so the Pauli-forbidden same-spin pattern
                # a+_ra a+_ra is detected as a duplicate and dropped
                ts = 'r' if r == s else 's2'
                terms = [(fac * eri[r, A, s, A],
                          [('r', 's', True, True), (ts, 't', True, True),
                           (1, 't', False, False), (0, 's', False, False)])]
                n, hn = _class_contrib(terms, cache, h1cas, eri_cas, e0_act)
                yield n, hn, eps_v[r - nc - ncas] + eps_v[s - nc - ncas]
    e_tot += _accum('Srs', _srs())

    # ---- Sij (+2): core pair {i,j} -> two active
    def _sij():
        for ii, i in enumerate(co):
            for j in co[:ii + 1]:
                fac = 0.5 if i == j else 1.0
                tj = 'i' if i == j else 'j'
                terms = [(fac * eri[A, i, A, j],
                          [(0, 's', True, False), (1, 't', True, False),
                           (tj, 't', False, True), ('i', 's', False, True)])]
                n, hn = _class_contrib(terms, cache, h1cas, eri_cas, e0_act)
                yield n, hn, -eps_c[i] - eps_c[j]
    e_tot += _accum('Sij', _sij())

    # ---- Srsi (-1): core i -> virt pair {r,s}, one active removed
    def _srsi():
        for ir, r in enumerate(vi):
            for s in vi[:ir + 1]:
                fac = 0.5 if r == s else 1.0
                ts = 'r' if r == s else 's2'
                for i in co:
                    terms = [
                        (fac * eri[r, i, s, A],
                         [('r', 's', True, True), (ts, 't', True, True),
                          (0, 't', False, False), ('i', 's', False, True)]),
                        (fac * eri[r, A, s, i],
                         [('r', 's', True, True), (ts, 't', True, True),
                          ('i', 't', False, True), (0, 's', False, False)]),
                    ]
                    n, hn = _class_contrib(terms, cache, h1cas, eri_cas,
                                           e0_act)
                    yield (n, hn, eps_v[r - nc - ncas]
                           + eps_v[s - nc - ncas] - eps_c[i])
    e_tot += _accum('Srsi', _srsi())

    # ---- Sijr (+1): core pair {i,j} -> virt r, one active added
    def _sijr():
        for r in vi:
            for ii, i in enumerate(co):
                for j in co[:ii + 1]:
                    fac = 0.5 if i == j else 1.0
                    tj = 'i' if i == j else 'j'
                    terms = [
                        (fac * eri[r, i, A, j],
                         [('r', 's', True, True), (0, 't', True, False),
                          (tj, 't', False, True), ('i', 's', False, True)]),
                        (fac * eri[A, i, r, j],
                         [(0, 's', True, False), ('r', 't', True, True),
                          (tj, 't', False, True), ('i', 's', False, True)]),
                    ]
                    n, hn = _class_contrib(terms, cache, h1cas, eri_cas,
                                           e0_act)
                    yield (n, hn, eps_v[r - nc - ncas]
                           - eps_c[i] - eps_c[j])
    e_tot += _accum('Sijr', _sijr())

    # ---- Sir (0): core i -> virt r, active-number conserving
    def _sir():
        for r in vi:
            for i in co:
                terms = [
                    (np.array(heff[r, i]),
                     [('r', 's', True, True), ('i', 's', False, True)]),
                    (eri[r, i, A, A],
                     [('r', 's', True, True), (0, 't', True, False),
                      (1, 't', False, False), ('i', 's', False, True)]),
                    (eri[r, A, A, i],
                     [('r', 's', True, True), (1, 't', True, False),
                      ('i', 't', False, True), (0, 's', False, False)]),
                ]
                n, hn = _class_contrib(terms, cache, h1cas, eri_cas, e0_act)
                yield n, hn, eps_v[r - nc - ncas] - eps_c[i]
    e_tot += _accum('Sir', _sir())

    if verbose:
        for k, (n, e) in results.items():
            print(f'NEVPT2 {k:6s} norm = {n:16.12f}  e = {e:16.12f}')
        print(f'NEVPT2 E2 = {e_tot:.12f}')
    return e_tot, results


def sc_nevpt2(mc, verbose=None):
    """SC-NEVPT2 correlation energy on top of converged CASCI/CASSCF.

    Returns (e_corr, per-class dict {name: (norm, energy)}); reference
    goldens: mrpt/test/test_nevpt2.py (H14 chain per-class values)."""
    _, eps_c, eps_v, _, eri_mo, heff = _setup(mc)
    vb = verbose if verbose is not None else getattr(mc, 'verbose', 0) >= 4
    return _sc_from_mo(eri_mo, heff, eps_c, eps_v, mc.ncore, mc.ncas,
                       mc.ci, mc.nelecas, verbose=vb)


class NEVPT:
    """SC-NEVPT2 driver (reference analog: mrpt/nevpt2.py NEVPT class)."""

    def __init__(self, mc):
        self._mc = mc
        self.e_corr = None
        self.classes = None

    def kernel(self):
        self.e_corr, self.classes = sc_nevpt2(self._mc)
        return self.e_corr
