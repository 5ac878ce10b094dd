"""Full (non-abelian) point-group machinery: operations, character
tables, MO irrep labels, and symmetry-adapted bases.

Reference analog: pyscf/symm/basis.py + symm/param.py hardcode character
tables and SALC coefficients per group and adapt SCF only in D2h
subgroups.  Here everything is COMPUTED from the molecule:

  1. all point-group operations are found by candidate generation
     (rotations / reflections / improper rotations about the geometric
     candidate axes) + verification + closure under multiplication;
  2. conjugacy classes by numerical matching;
  3. the character table by Burnside's class-algebra method: the class
     sums act as scalars omega_i = |C_i| chi_i / d in each irrep and the
     structure constants give commuting matrices whose common
     eigenvectors are exactly those scalars;
  4. complex-conjugate irrep pairs (Cn, Cnh, Sn, T, Th) are merged into
     their real 2-dimensional form (the labels chemistry uses);
  5. Mulliken names (a/b/e/t, 1/2 subscripts, g/u, '/'') are assigned
     from the characters of the principal rotation, perpendicular C2 /
     vertical mirror, inversion, sigma_h, and S4 classes.

MO labels come from projector weights p_G = sum_R w_G(R) <phi|U_R|phi>
with U_R the AO representation (atom permutation x real Wigner-D), which
is basis-set exact — degenerate partners each give p_G = 1.
"""
import numpy as np

from . import (_is_symmetry_op, _atom_permutation, _candidate_axes,
               _rot, _reflection, detect_symm, wigner_d_real, TOL)


# ---------------------------------------------------------------- ops --
def _round_key(R):
    return tuple(np.round(np.asarray(R), 6).ravel())


def _op_matcher(ops):
    """ops list -> fn(R) = index of the op closest to R (tolerant match).

    Exact rounded-key dicts mis-key elements whose entries land near a
    rounding boundary on noisy geometries; nearest-neighbor matching under
    TOL is robust (advisor finding, round 4)."""
    arr = np.stack([np.asarray(R) for R in ops])        # (n, 3, 3)

    def match(R):
        d = np.abs(arr - np.asarray(R)[None]).max(axis=(1, 2))
        j = int(np.argmin(d))
        if d[j] > 1e-4:
            raise KeyError('group operation not found (closure hole); '
                           'max-abs deviation %.2e' % d[j])
        return j
    return match


def full_group_ops(coords, charges):
    """All point-group operations (3x3 orthogonal matrices) of the
    centered molecule, by candidate verification + closure."""
    coords = np.asarray(coords, float)
    charges = np.asarray(charges)
    ops = {_round_key(np.eye(3)): np.eye(3)}

    def try_add(R):
        k = _round_key(R)
        if k not in ops and _is_symmetry_op(coords, charges, R):
            ops[k] = R

    try_add(-np.eye(3))
    for ax in _candidate_axes(coords, charges):
        for n in range(2, 9):
            R = _rot(ax, 2 * np.pi / n)
            try_add(R)
            try_add(_reflection(ax) @ R)      # S_n about ax
        try_add(_reflection(ax))
    # closure (products of verified ops are symmetry ops automatically,
    # but numerically re-keyed to dedupe)
    changed = True
    while changed:
        changed = False
        cur = list(ops.values())
        for A in cur:
            for B in cur:
                C = A @ B
                k = _round_key(C)
                if k not in ops:
                    ops[k] = C
                    changed = True
        if len(ops) > 200:          # safety (icosahedral + noise)
            break
    return list(ops.values())


def conjugacy_classes(ops):
    """List of lists of op indices."""
    n = len(ops)
    match = _op_matcher(ops)
    unassigned = set(range(n))
    classes = []
    while unassigned:
        i = min(unassigned)
        cls = set()
        for g in ops:
            cls.add(match(g @ ops[i] @ g.T))
        classes.append(sorted(cls))
        unassigned -= cls
    return classes


# ------------------------------------------------------- characters ----
def character_table(ops, classes):
    """(nirrep, nclass) complex character table via Burnside's method."""
    n = len(ops)
    nc = len(classes)
    match = _op_matcher(ops)
    cls_of = np.empty(n, dtype=int)
    for ic, cls in enumerate(classes):
        for i in cls:
            cls_of[i] = ic
    # structure constants n_ijk: C_i C_j = sum_k n_ijk C_k
    N = np.zeros((nc, nc, nc))
    for ic, cls in enumerate(classes):
        for i in cls:
            for j in range(n):
                k = match(ops[i] @ ops[j])
                N[ic, cls_of[j], cls_of[k]] += 1
    for kc in range(nc):
        N[:, :, kc] /= len(classes[kc])
    # common eigenvectors of the commuting A_i = N[i]
    rng = np.random.default_rng(7)
    A = np.einsum('i,ijk->jk', rng.standard_normal(nc), N)
    _, vecs = np.linalg.eig(A)
    # each eigenvector, normalized to omega_E = 1, gives omega_i
    iE = next(ic for ic, cls in enumerate(classes)
              if np.allclose(ops[cls[0]], np.eye(3)))
    chars = []
    sizes = np.array([len(c) for c in classes], float)
    for r in range(nc):
        v = vecs[:, r]
        v = v / v[iE]
        d2 = n / np.sum(np.abs(v) ** 2 / sizes)
        d = np.sqrt(d2)
        chi = d * v / sizes
        chars.append(chi)
    chars = np.array(chars)
    # dims should be near-integers; clean tiny numerics
    return chars


def _merge_conjugates(chars):
    """Merge complex-conjugate irrep rows into real 2d reps.

    Returns (real char rows (for display), weight rows w used in
    projectors: w[G, class] = sum_members d_m conj(chi_m))."""
    nirr = chars.shape[0]
    used = np.zeros(nirr, bool)
    rows = []
    for r in range(nirr):
        if used[r]:
            continue
        chi = chars[r]
        if np.abs(chi.imag).max() < 1e-6:
            rows.append((chi.real.copy(), [r]))
            used[r] = True
            continue
        # find the conjugate partner
        for s in range(r + 1, nirr):
            if not used[s] and np.allclose(chars[s], chi.conj(),
                                           atol=1e-6):
                rows.append(((chi + chars[s]).real, [r, s]))
                used[r] = used[s] = True
                break
        else:
            # unpaired complex row (numerical noise) -> realify alone
            rows.append((chi.real.copy(), [r]))
            used[r] = True
    return rows


# ------------------------------------------------------------ naming ---
def _classify_class(R):
    """('E'|'i'|'C'|'S'|'sigma', order n or 0, axis)"""
    d = np.linalg.det(R)
    if d > 0:
        c = (np.trace(R) - 1.0) / 2.0
        th = np.arccos(np.clip(c, -1, 1))
        if th < 1e-6:
            return ('E', 0, None)
        n = int(round(2 * np.pi / th))
        w, v = np.linalg.eig(R)
        ax = np.real(v[:, np.argmin(np.abs(w - 1.0))])
        return ('C', n, ax / np.linalg.norm(ax))
    c = (np.trace(R) + 1.0) / 2.0
    th = np.arccos(np.clip(c, -1, 1))
    if th < 1e-6:
        w, v = np.linalg.eig(R)
        ax = np.real(v[:, np.argmin(np.abs(w + 1.0))])
        return ('sigma', 0, ax / np.linalg.norm(ax))
    if abs(th - np.pi) < 1e-6:
        return ('i', 0, None)
    n = int(round(2 * np.pi / th))
    w, v = np.linalg.eig(R)
    ax = np.real(v[:, np.argmin(np.abs(w + 1.0))])
    return ('S', n, ax / np.linalg.norm(ax))


def _mulliken_names(group, ops, classes, rows):
    """Assign Mulliken symbols to the merged-real irrep rows."""
    kinds = [_classify_class(ops[c[0]]) for c in classes]
    iE = next(i for i, k in enumerate(kinds) if k[0] == 'E')
    i_inv = next((i for i, k in enumerate(kinds) if k[0] == 'i'), None)
    # principal rotation class: proper rotation of max order
    rot_cls = [(i, k[1]) for i, k in enumerate(kinds) if k[0] == 'C']
    i_prin, n_prin = (None, 0)
    if rot_cls:
        i_prin, n_prin = max(rot_cls, key=lambda t: t[1])
    z = kinds[i_prin][2] if i_prin is not None else np.array([0, 0, 1.])
    cubic = sum(1 for i, k in enumerate(kinds)
                if k[0] == 'C' and k[1] == 3) >= 1 and \
        sum(len(classes[i]) for i, k in enumerate(kinds)
            if k[0] == 'C' and k[1] == 3) >= 8
    # sigma_h: mirror with normal || principal axis
    i_sh = next((i for i, k in enumerate(kinds) if k[0] == 'sigma'
                 and abs(abs(k[2] @ z) - 1) < 1e-4), None)
    # C2' class: C2 with axis perp to principal
    i_c2p = next((i for i, k in enumerate(kinds) if k[0] == 'C'
                  and k[1] == 2 and abs(k[2] @ z) < 1e-4
                  and i != i_prin), None)
    # vertical mirror (normal perp to principal axis)
    i_sv = next((i for i, k in enumerate(kinds) if k[0] == 'sigma'
                 and abs(k[2] @ z) < 1e-4), None)
    i_s4 = next((i for i, k in enumerate(kinds)
                 if k[0] == 'S' and k[1] == 4), None)
    i_c4 = next((i for i, k in enumerate(kinds)
                 if k[0] == 'C' and k[1] == 4), None)
    # Cs: a' / a'' by the mirror character
    if len(classes) == 2 and any(k[0] == 'sigma' for k in kinds):
        isig = next(i for i, k in enumerate(kinds) if k[0] == 'sigma')
        return ["a'" if chi[isig] > 0 else "a''" for chi, _ in rows]
    # D2/D2h special case: three inequivalent C2 axes, labels b1/b2/b3 by
    # which C2 has character +1 (z -> b1, y -> b2, x -> b3; advisor r4)
    c2_classes = [(i, k[2]) for i, k in enumerate(kinds)
                  if k[0] == 'C' and k[1] == 2]
    is_d2 = (n_prin == 2 and len(c2_classes) == 3 and not cubic)

    def _nE_same_suffix(chi0):
        """2-dim irreps sharing chi0's g/u (or '/'') suffix — the set an
        E_k subscript must disambiguate within."""
        n = 0
        for chi, _ in rows:
            if int(round(chi[iE])) != 2:
                continue
            if i_inv is not None and chi[i_inv] * chi0[i_inv] < 0:
                continue
            if i_inv is None and i_sh is not None \
                    and chi[i_sh] * chi0[i_sh] < 0:
                continue
            n += 1
        return n
    names = []
    for chi, members in rows:
        d = int(round(chi[iE]))
        if cubic:
            base = {1: 'A', 2: 'E', 3: 'T', 4: 'G', 5: 'H'}[d]
            sub = ''
            isub = i_s4 if i_s4 is not None else i_c4
            if d in (1, 3) and isub is not None:
                sub = '1' if chi[isub] > 0 else '2'
            name = base + sub
        elif d == 1 and is_d2:
            plus = [(i, ax) for i, ax in c2_classes if chi[i] > 0.5]
            if len(plus) == 3:
                name = 'A'
            else:
                # b1/b2/b3 by the +1 axis: z-like, y-like, x-like
                ax = plus[0][1] if plus else np.array([0., 0., 1.])
                comp = int(np.argmax(np.abs(ax)))
                name = 'B' + {2: '1', 1: '2', 0: '3'}[comp]
        elif d == 1:
            base = 'A'
            if i_prin is not None and n_prin >= 2 and \
                    chi[i_prin] < -0.5:
                base = 'B'
            sub = ''
            isub = i_c2p if i_c2p is not None else i_sv
            if isub is not None:
                sub = '1' if chi[isub] > 0 else '2'
            name = base + sub
        else:
            base = {2: 'E', 3: 'T', 4: 'G', 5: 'H'}[d]
            sub = ''
            if d == 2 and i_prin is not None and n_prin >= 4 \
                    and _nE_same_suffix(chi) > 1:
                # E_k: chi(C_n) = 2 cos(2 pi k / n); subscript only when
                # the group has more than one 2-dim irrep (advisor r4:
                # C4v/D4h have a single E, conventionally unsubscripted)
                c = np.clip(chi[i_prin] / 2.0, -1, 1)
                k = int(round(n_prin * np.arccos(c) / (2 * np.pi)))
                sub = str(max(k, 1))
            name = base + sub
        if i_inv is not None:
            name += 'g' if chi[i_inv] > 0 else 'u'
        elif i_sh is not None and i_prin is not None and n_prin >= 3 \
                and not cubic:
            name += "'" if chi[i_sh] > 0 else "''"
        names.append(name.lower())
    # disambiguate duplicates (rare naming-collision fallback)
    seen = {}
    out = []
    for nm in names:
        if nm in seen:
            seen[nm] += 1
            out.append(f'{nm}#{seen[nm]}')
        else:
            seen[nm] = 0
            out.append(nm)
    return out


# --------------------------------------------------------- AO rep ------
def _ao_rep_from_R(mol, R, center):
    """AO representation matrix of an arbitrary point-group op R."""
    coords = np.asarray(mol.coords) - center
    charges = np.asarray(mol.charges)
    perm = _atom_permutation(coords, charges, R)
    nao = mol.nao
    M = np.zeros((nao, nao))
    dmats = {}
    for ish, sh in enumerate(mol._shells):
        l = sh.l
        if l not in dmats:
            dmats[l] = wigner_d_real(l, R)
        ja = perm[sh.atom_id]
        for jsh, sh2 in enumerate(mol._shells):
            if (sh2.atom_id == ja and sh2.l == l
                    and len(sh2.exps) == len(sh.exps)
                    and np.allclose(sh2.exps, sh.exps)
                    and np.allclose(sh2.coeffs, sh.coeffs)):
                break
        else:
            raise RuntimeError('shell image not found')
        o1, o2 = mol.ao_loc[ish], mol.ao_loc[jsh]
        n = 2 * l + 1
        M[o2:o2 + n, o1:o1 + n] = dmats[l]
    return M


class PointGroup:
    """Computed point group of a molecule: ops, classes, characters,
    Mulliken irrep names, AO representation."""

    def __init__(self, mol):
        self.mol = mol
        name, center, axes = detect_symm(mol)
        self.groupname = name
        self.center = center
        coords = np.asarray(mol.coords) - center
        charges = np.asarray(mol.charges)
        if name in ('SO3', 'Coov', 'Dooh'):
            # continuous groups: use a high finite axial subgroup for
            # labeling (C8v / D8h capture all practical basis irreps)
            raise NotImplementedError(
                'continuous groups: use the axial-label path in '
                'symm.label_orb_symm')
        self.ops = full_group_ops(coords, charges)
        self.order = len(self.ops)
        self.classes = conjugacy_classes(self.ops)
        chars = character_table(self.ops, self.classes)
        self.rows = _merge_conjugates(chars)
        self.irrep_names = _mulliken_names(name, self.ops, self.classes,
                                           self.rows)

    def ao_reps(self):
        if not hasattr(self, '_ao_reps'):
            self._ao_reps = [_ao_rep_from_R(self.mol, R, self.center)
                             for R in self.ops]
        return self._ao_reps

    def projector_weights(self):
        """w[G, iop]: sum_members d_m conj(chi_m(R)) / |G| per op."""
        cls_of = np.empty(self.order, dtype=int)
        for ic, cls in enumerate(self.classes):
            for i in cls:
                cls_of[i] = ic
        iE = next(ic for ic, cls in enumerate(self.classes)
                  if np.allclose(self.ops[cls[0]], np.eye(3)))
        W = []
        for chi, members in self.rows:
            dsum = chi[iE]
            d_each = dsum / len(members)
            w = d_each * chi[cls_of] / self.order
            W.append(w)
        return np.array(W)                       # (nirrep, nops)


def label_orb_symm_full(mol, mo_coeff, ovlp=None, tol=0.05):
    """Full-point-group irrep label per MO.

    Returns (groupname, labels). Degenerate partners each satisfy
    <phi|P_G|phi> = 1 for their irrep."""
    pg = PointGroup(mol)
    if ovlp is None:
        ovlp = np.asarray(mol.intor('int1e_ovlp'))
    mo = np.asarray(mo_coeff)
    reps = pg.ao_reps()
    # t[iop, imo] = <phi_i | U_R | phi_i>
    smo = ovlp @ mo
    t = np.array([np.einsum('ui,ui->i', smo, M @ mo) for M in reps])
    W = pg.projector_weights()                   # (nirrep, nops)
    p = W @ t                                    # (nirrep, nmo)
    labels = []
    for i in range(mo.shape[1]):
        j = int(np.argmax(p[:, i]))
        labels.append(pg.irrep_names[j]
                      if abs(p[j, i] - 1.0) < tol else '?')
    return pg.groupname, labels


def symm_adapted_basis_full(mol):
    """SALCs of the FULL point group: {irrep: (nao, n) orthonormal}."""
    pg = PointGroup(mol)
    reps = pg.ao_reps()
    W = pg.projector_weights()
    out = {}
    for name, w in zip(pg.irrep_names, W):
        P = sum(wi * M for wi, M in zip(w, reps))
        u, s, _ = np.linalg.svd(P)
        nkeep = int((s > 0.1).sum())
        if nkeep:
            out[name] = u[:, :nkeep]
    return pg.groupname, out
