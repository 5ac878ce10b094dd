"""Molecular point-group symmetry.

Reference analog: pyscf/symm/geom.py (detect_symm:188), symm/basis.py
(symm_adapted_basis), symm/addons.py (label_orb_symm).

Implements the standard flowchart: center-of-charge shift, inertia-tensor
classification (linear / spherical / symmetric / asymmetric top), search of
rotation axes / mirror planes / improper axes by permutation tests, group
naming, plus the computational pieces the rest of the stack consumes:
the largest abelian subgroup (D2h or below), AO representation matrices for
its operations (atom permutation x diagonal real-Ylm parities), irrep
projection of the AO basis and orbital symmetry labels.
"""
import itertools

import numpy as np

TOL = 1e-5

# character table rows for D2h and subgroups over the operation list
# (E, C2z, C2y, C2x, i, sxy(z), sxz(y), syz(x)); subgroup uses a subset.
D2H_OPS = ['E', 'C2z', 'C2y', 'C2x', 'i', 'sxy', 'sxz', 'syz']
D2H_IRREPS = {
    'Ag':  [1, 1, 1, 1, 1, 1, 1, 1],
    'B1g': [1, 1, -1, -1, 1, 1, -1, -1],
    'B2g': [1, -1, 1, -1, 1, -1, 1, -1],
    'B3g': [1, -1, -1, 1, 1, -1, -1, 1],
    'Au':  [1, 1, 1, 1, -1, -1, -1, -1],
    'B1u': [1, 1, -1, -1, -1, -1, 1, 1],
    'B2u': [1, -1, 1, -1, -1, 1, -1, 1],
    'B3u': [1, -1, -1, 1, -1, 1, 1, -1],
}
SUBGROUP_OPS = {
    'D2h': D2H_OPS,
    'D2': ['E', 'C2z', 'C2y', 'C2x'],
    'C2v': ['E', 'C2z', 'sxz', 'syz'],
    'C2h': ['E', 'C2z', 'i', 'sxy'],
    'C2': ['E', 'C2z'],
    'Cs': ['E', 'sxy'],
    'Ci': ['E', 'i'],
    'C1': ['E'],
}
SUBGROUP_IRREPS = {
    'D2h': ['Ag', 'B1g', 'B2g', 'B3g', 'Au', 'B1u', 'B2u', 'B3u'],
    'D2': ['A', 'B1', 'B2', 'B3'],
    'C2v': ['A1', 'A2', 'B1', 'B2'],
    'C2h': ['Ag', 'Bg', 'Au', 'Bu'],
    'C2': ['A', 'B'],
    'Cs': ["A'", 'A"'],
    'Ci': ['Ag', 'Au'],
    'C1': ['A'],
}
SUBGROUP_CHARS = {
    'D2h': [D2H_IRREPS[k] for k in SUBGROUP_IRREPS['D2h']],
    'D2': [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, 1, -1], [1, -1, -1, 1]],
    'C2v': [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, 1, -1], [1, -1, -1, 1]],
    'C2h': [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]],
    'C2': [[1, 1], [1, -1]],
    'Cs': [[1, 1], [1, -1]],
    'Ci': [[1, 1], [1, -1]],
    'C1': [[1]],
}


def _op_matrix(name):
    s = {'E': (1, 1, 1), 'C2z': (-1, -1, 1), 'C2y': (-1, 1, -1),
         'C2x': (1, -1, -1), 'i': (-1, -1, -1), 'sxy': (1, 1, -1),
         'sxz': (1, -1, 1), 'syz': (-1, 1, 1)}[name]
    return np.diag(s).astype(float)


def _rot(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return c * np.eye(3) + s * K + (1 - c) * np.outer(axis, axis)


def _reflection(normal):
    n = np.asarray(normal, float)
    n = n / np.linalg.norm(n)
    return np.eye(3) - 2.0 * np.outer(n, n)


def _is_symmetry_op(coords, charges, R, tol=TOL):
    """True if R maps the charge-weighted point set onto itself."""
    new = coords @ R.T
    used = np.zeros(len(coords), dtype=bool)
    for i, (x, z) in enumerate(zip(new, charges)):
        d = np.linalg.norm(coords - x, axis=1)
        cand = np.where((d < tol) & (charges == z) & ~used)[0]
        if len(cand) == 0:
            return False
        used[cand[0]] = True
    return True


def _atom_permutation(coords, charges, R, tol=TOL):
    new = coords @ R.T
    perm = np.zeros(len(coords), dtype=np.int64)
    for i, x in enumerate(new):
        d = np.linalg.norm(coords - x, axis=1)
        j = int(np.argmin(d))
        if d[j] > tol or charges[j] != charges[i]:
            raise RuntimeError('not a symmetry operation')
        perm[i] = j
    return perm


def _candidate_axes(coords, charges):
    """Candidate rotation axes / plane normals."""
    cands = [np.eye(3)[i] for i in range(3)]
    # inertia principal axes
    w = charges.astype(float)
    if len(coords) > 1:
        I = np.einsum('a,aij->ij', w,
                      (np.einsum('ai,ai->a', coords, coords)[:, None, None]
                       * np.eye(3)[None]
                       - np.einsum('ai,aj->aij', coords, coords)))
        _, v = np.linalg.eigh(I)
        cands += [v[:, i] for i in range(3)]
    # atom positions and pair midpoints / differences
    for x in coords:
        if np.linalg.norm(x) > TOL:
            cands.append(x / np.linalg.norm(x))
    for i, j in itertools.combinations(range(len(coords)), 2):
        if charges[i] != charges[j]:
            continue
        m = coords[i] + coords[j]
        if np.linalg.norm(m) > TOL:
            cands.append(m / np.linalg.norm(m))
        dvec = coords[i] - coords[j]
        if np.linalg.norm(dvec) > TOL:
            cands.append(dvec / np.linalg.norm(dvec))
    # deduplicate (axis ~ -axis)
    out = []
    for c in cands:
        if not any(min(np.linalg.norm(c - o), np.linalg.norm(c + o)) < 1e-4
                   for o in out):
            out.append(c)
    return out


def _max_rotation_order(coords, charges, axis, nmax=8):
    best = 1
    for n in range(2, nmax + 1):
        if _is_symmetry_op(coords, charges, _rot(axis, 2 * np.pi / n)):
            best = n
    return best


def detect_symm(atoms_or_mol, charges=None):
    """Detect the point group.

    Accepts a Mole or (coords (n,3) Bohr, charges). Returns
    (group_name, charge_center, axes (3,3) rows = standard x,y,z).
    """
    if charges is None:
        mol = atoms_or_mol
        coords = np.asarray(mol.coords, float)
        charges = np.asarray(mol.charges)
    else:
        coords = np.asarray(atoms_or_mol, float)
        charges = np.asarray(charges)
    w = charges.astype(float)
    center = w @ coords / w.sum()
    coords = coords - center
    natm = len(coords)

    if natm == 1:
        return 'SO3', center, np.eye(3)

    # linear?
    rnorm = np.linalg.norm(coords, axis=1)
    ref = coords[np.argmax(rnorm)]
    ref = ref / np.linalg.norm(ref)
    if all(np.linalg.norm(np.cross(ref, x)) < TOL for x in coords):
        has_i = _is_symmetry_op(coords, charges, -np.eye(3))
        axes = _frame_from_z(ref)
        return ('Dooh' if has_i else 'Coov'), center, axes

    # principal rotation axis
    best_axis, best_n = None, 1
    cands = _candidate_axes(coords, charges)
    orders = []
    for ax in cands:
        n = _max_rotation_order(coords, charges, ax)
        orders.append(n)
        if n > best_n:
            best_n, best_axis = n, ax
    ncn = sum(1 for n in orders if n >= 3)  # axes with order >= 3

    if best_n >= 3 and ncn >= 2:
        # cubic/icosahedral groups
        has_i = _is_symmetry_op(coords, charges, -np.eye(3))
        n5 = sum(1 for ax, n in zip(cands, orders) if n == 5)
        n4 = sum(1 for ax, n in zip(cands, orders) if n >= 4)
        if n5 >= 2:
            name = 'Ih' if has_i else 'I'
        elif n4 >= 2:
            name = 'Oh' if has_i else 'O'
        else:
            # T family: Td has S4 + sigma_d; Th has i
            if has_i:
                name = 'Th'
            else:
                ax4 = [ax for ax, n in zip(cands, orders) if n == 2]
                s4 = any(_is_symmetry_op(
                    coords, charges,
                    _rot(ax, np.pi / 2) @ _reflection(ax)) for ax in ax4)
                name = 'Td' if s4 else 'T'
        axes = _frame_from_z(best_axis)
        return name, center, axes

    if best_n == 1:
        # no rotation axis: Cs / Ci / C1
        if _is_symmetry_op(coords, charges, -np.eye(3)):
            return 'Ci', center, np.eye(3)
        for ax in cands:
            if _is_symmetry_op(coords, charges, _reflection(ax)):
                return 'Cs', center, _frame_from_z(ax)
        return 'C1', center, np.eye(3)

    n = best_n
    z = best_axis
    # C2 axes perpendicular to principal axis?
    perp_c2 = []
    for ax in cands:
        if abs(ax @ z) < 1e-4 and _is_symmetry_op(coords, charges,
                                                  _rot(ax, np.pi)):
            perp_c2.append(ax)
    sigma_h = _is_symmetry_op(coords, charges, _reflection(z))
    sigma_v = []
    for ax in cands:
        if abs(ax @ z) < 1e-4 and _is_symmetry_op(coords, charges,
                                                  _reflection(ax)):
            sigma_v.append(ax)
    s2n = _is_symmetry_op(coords, charges,
                          _rot(z, np.pi / n) @ _reflection(z))

    if len(perp_c2) >= 1:
        if sigma_h:
            name = f'D{n}h'
        elif len(sigma_v) >= 1:
            name = f'D{n}d'
        else:
            name = f'D{n}'
        axes = _frame_from_z(z, x=perp_c2[0])
    else:
        if sigma_h:
            name = f'C{n}h'
        elif len(sigma_v) >= 1:
            name = f'C{n}v'
            axes = _frame_from_z(z, x=None, sv=sigma_v[0])
            return name, center, axes
        elif s2n:
            name = f'S{2 * n}'
        else:
            name = f'C{n}'
        axes = _frame_from_z(z)
    return name, center, axes


def _frame_from_z(z, x=None, sv=None):
    """Right-handed orthonormal frame with given z (rows = x, y, z)."""
    z = np.asarray(z, float)
    z = z / np.linalg.norm(z)
    if x is not None:
        x = np.asarray(x, float)
        x = x - (x @ z) * z
        x = x / np.linalg.norm(x)
    elif sv is not None:
        # put the sigma_v plane as the xz plane: y = normal of the plane
        y = np.asarray(sv, float)
        y = y - (y @ z) * z
        y = y / np.linalg.norm(y)
        x = np.cross(y, z)
        return np.array([x, y, z])
    else:
        t = np.eye(3)[np.argmin(np.abs(z))]
        x = t - (t @ z) * z
        x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.array([x, y, z])


# ---------------------------------------------------------------------------
# abelian subgroup machinery for SCF labeling
# ---------------------------------------------------------------------------

def largest_abelian_subgroup(mol):
    """(subgroup name, ops present) testing D2h ops in the standard frame."""
    name, center, axes = detect_symm(mol)
    coords = (np.asarray(mol.coords) - center) @ axes.T
    charges = np.asarray(mol.charges)
    present = [op for op in D2H_OPS
               if _is_symmetry_op(coords, charges, _op_matrix(op))]
    pset = set(present)
    for g in ['D2h', 'D2', 'C2v', 'C2h', 'C2', 'Cs', 'Ci', 'C1']:
        ops = SUBGROUP_OPS[g]
        if set(ops) <= pset:
            # C2v needs C2z + both vertical planes; checked by subset
            return g, ops, center, axes
    return 'C1', ['E'], center, axes


def wigner_d_real(l, R):
    """(2l+1, 2l+1) matrix D with Y_lm(R^-1 u) = sum_m' D[m',m] Y_lm'(u),
    for real spherical harmonics and any orthogonal R."""
    from ..ops.integrals.cart2sph import _real_sph_harm
    rng = np.random.default_rng(12)
    u = rng.standard_normal((4 * (2 * l + 1), 3))
    u /= np.linalg.norm(u, axis=1)[:, None]
    Y = _real_sph_harm(l, u)                    # (2l+1, npts)
    Yr = _real_sph_harm(l, u @ R)               # Y(R^-1 u): rows m
    # solve Y.T D = Yr.T  ->  D[m', m]
    D, *_ = np.linalg.lstsq(Y.T, Yr.T, rcond=None)
    return D


def ao_rep_matrix(mol, op_name, center, axes):
    """AO-space representation of a D2h-subgroup operation.

    The operation is defined in the standard frame; AOs live in the original
    frame, so the orbital part uses R_orig = axes^T R axes via the real
    Wigner-D of each shell's angular momentum, combined with the atom
    permutation."""
    R = axes.T @ _op_matrix(op_name) @ axes
    coords = np.asarray(mol.coords) - center
    charges = np.asarray(mol.charges)
    perm = _atom_permutation(coords, charges, R)
    nao = mol.nao
    M = np.zeros((nao, nao))
    dmats = {l: wigner_d_real(l, R) for l in
             sorted({sh.l for sh in mol._shells})}
    for ish, sh in enumerate(mol._shells):
        ja = perm[sh.atom_id]
        # locate the matching shell on the image atom (same l, same exps)
        for jsh, sh2 in enumerate(mol._shells):
            if (sh2.atom_id == ja and sh2.l == sh.l
                    and len(sh2.exps) == len(sh.exps)
                    and np.allclose(sh2.exps, sh.exps)
                    and np.allclose(sh2.coeffs, sh.coeffs)):
                break
        else:
            raise RuntimeError('shell image not found')
        o1, o2 = mol.ao_loc[ish], mol.ao_loc[jsh]
        n = 2 * sh.l + 1
        M[o2:o2 + n, o1:o1 + n] = dmats[sh.l]
    return M


def label_orb_symm(mol, mo_coeff, ovlp=None, tol=1e-6):
    """Irrep label of each MO in the largest abelian subgroup.

    Returns (group name, list of labels). Mirrors reference
    symm.label_orb_symm for D2h-subgroup molecules.
    """
    group, ops, center, axes = largest_abelian_subgroup(mol)
    if ovlp is None:
        ovlp = np.asarray(mol.intor('int1e_ovlp'))
    mo = np.asarray(mo_coeff)
    reps = [ao_rep_matrix(mol, op, center, axes) for op in ops]
    chars = np.array([np.einsum('ui,uv,vw,wi->i', mo, ovlp, M, mo)
                      for M in reps])         # (nop, nmo)
    irreps = SUBGROUP_IRREPS[group]
    table = np.array(SUBGROUP_CHARS[group], dtype=float)  # (nirrep, nop)
    labels = []
    for i in range(mo.shape[1]):
        diffs = np.abs(table - chars[:, i][None, :]).max(axis=1)
        j = int(np.argmin(diffs))
        labels.append(irreps[j] if diffs[j] < 1e-2 else '?')
    return group, labels


def symm_adapted_basis(mol):
    """Projection of AOs onto irreps of the largest abelian subgroup.

    Returns (group, {irrep: (nao, n_i) orthonormal SALC coefficients}).
    Reference analog: symm/basis.py symm_adapted_basis.
    """
    group, ops, center, axes = largest_abelian_subgroup(mol)
    reps = [ao_rep_matrix(mol, op, center, axes) for op in ops]
    irreps = SUBGROUP_IRREPS[group]
    table = SUBGROUP_CHARS[group]
    nao = mol.nao
    out = {}
    for name, chi in zip(irreps, table):
        P = sum(c * M for c, M in zip(chi, reps)) / len(ops)
        # orthonormal basis of the projector's range
        u, s, _ = np.linalg.svd(P)
        nkeep = int((s > 0.1).sum())
        if nkeep:
            out[name] = u[:, :nkeep]
    return group, out
