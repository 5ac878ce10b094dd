"""Redundant internal coordinates for geometry optimization.

Reference analog: the geomeTRIC/pyberny engines the reference delegates
to (pyscf/geomopt/geometric_solver.py) — here native: bonds, angles and
dihedrals are auto-detected from covalent radii, the Wilson B matrix is
jax.jacobian of the coordinate functions (no hand-coded derivative
formulas), and a BFGS quasi-Newton runs in the redundant q space with
iterative back-transformation of the steps.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..data.elements import BRAGG_RADII
from ..lib.parameters import BOHR


def detect_internals(mol, bond_scale=1.35):
    """(bonds, angles, dihedrals) index tuples from covalent distances."""
    r = np.asarray(mol.coords)
    z = np.asarray(mol.charges, dtype=int)
    natm = mol.natm
    rad = np.array([BRAGG_RADII[int(zi)] / BOHR for zi in z])
    bonds = []
    for i in range(natm):
        for j in range(i + 1, natm):
            if np.linalg.norm(r[i] - r[j]) < bond_scale * (rad[i] + rad[j]):
                bonds.append((i, j))
    # connect disconnected fragments through the closest atom pair
    adj = {i: set() for i in range(natm)}
    for i, j in bonds:
        adj[i].add(j)
        adj[j].add(i)

    def component(seed):
        seen, todo = {seed}, [seed]
        while todo:
            k = todo.pop()
            for n in adj[k]:
                if n not in seen:
                    seen.add(n)
                    todo.append(n)
        return seen

    while True:
        comp = component(0)
        if len(comp) == natm:
            break
        rest = [i for i in range(natm) if i not in comp]
        best = min(((i, j) for i in comp for j in rest),
                   key=lambda t: np.linalg.norm(r[t[0]] - r[t[1]]))
        bonds.append(tuple(sorted(best)))
        adj[best[0]].add(best[1])
        adj[best[1]].add(best[0])

    angles = []
    for j in range(natm):
        nb = sorted(adj[j])
        for x in range(len(nb)):
            for y in range(x + 1, len(nb)):
                angles.append((nb[x], j, nb[y]))
    dihedrals = []
    for (j, k) in bonds:
        for i in sorted(adj[j] - {k}):
            for l in sorted(adj[k] - {j}):
                if i != l:
                    dihedrals.append((i, j, k, l))
    return bonds, angles, dihedrals


def q_func(bonds, angles, dihedrals):
    """Jittable x(natm,3) -> q(nq,) internal-coordinate map."""
    bonds = np.asarray(bonds, dtype=int).reshape(-1, 2)
    angles = np.asarray(angles, dtype=int).reshape(-1, 3)
    dihedrals = np.asarray(dihedrals, dtype=int).reshape(-1, 4)

    def q(x):
        vals = []
        for i, j in bonds:
            vals.append(jnp.linalg.norm(x[i] - x[j]))
        for i, j, k in angles:
            u = x[i] - x[j]
            v = x[k] - x[j]
            cos = (u @ v) / (jnp.linalg.norm(u) * jnp.linalg.norm(v))
            vals.append(jnp.arccos(jnp.clip(cos, -1 + 1e-10, 1 - 1e-10)))
        for i, j, k, l in dihedrals:
            b1 = x[j] - x[i]
            b2 = x[k] - x[j]
            b3 = x[l] - x[k]
            n1 = jnp.cross(b1, b2)
            n2 = jnp.cross(b2, b3)
            m = jnp.cross(n1, b2 / jnp.linalg.norm(b2))
            vals.append(jnp.arctan2(m @ n2, n1 @ n2))
        return jnp.stack(vals)

    return q


def optimize(mf_factory, mol, maxsteps=50, gtol=3e-4, trust=0.3):
    """Quasi-Newton minimization in redundant internal coordinates.

    Same driver contract as geomopt.optimize; returns (mol, energies).
    """
    mol = mol.copy()
    bonds, angles, dihedrals = detect_internals(mol)
    q = q_func(bonds, angles, dihedrals)
    jac = jax.jit(jax.jacobian(q))
    q_j = jax.jit(q)
    x = np.asarray(mol.coords).copy()
    nq = len(bonds) + len(angles) + len(dihedrals)
    # diagonal initial Hessian: 0.5 (bonds), 0.2 (angles), 0.1 (dihedrals)
    h = np.diag(np.concatenate([np.full(len(bonds), 0.5),
                                np.full(len(angles), 0.2),
                                np.full(len(dihedrals), 0.1)]))
    energies = []
    gq_prev = dq_prev = None

    def grad_x(m):
        mf = mf_factory(m)
        e = float(mf.e_tot)
        g = np.asarray(mf.Gradients().kernel())
        return e, g

    for step in range(maxsteps):
        m = mol.copy()
        m.set_geom_(x)
        e, gx = grad_x(m)
        energies.append(e)
        B = np.asarray(jac(jnp.asarray(x))).reshape(nq, -1)   # (nq, 3N)
        Bp = np.linalg.pinv(B.T, rcond=1e-7)                  # (nq, 3N)
        gq = Bp @ gx.ravel()
        if np.abs(gx).max() < gtol:
            break
        if gq_prev is not None:
            y = gq - gq_prev
            sden = float(dq_prev @ y)
            if sden > 1e-10:                                   # BFGS update
                hs = h @ dq_prev
                h = (h + np.outer(y, y) / sden
                     - np.outer(hs, hs) / float(dq_prev @ hs))
        dq = -np.linalg.solve(h + 1e-8 * np.eye(nq), gq)
        norm = np.linalg.norm(dq)
        if norm > trust:
            dq *= trust / norm
        # iterative back-transformation q + dq -> x
        q0 = np.asarray(q_j(jnp.asarray(x)))
        target = q0 + dq
        xn = x.copy()
        for it in range(25):
            Bc = np.asarray(jac(jnp.asarray(xn))).reshape(nq, -1)
            qc = np.asarray(q_j(jnp.asarray(xn)))
            dq_c = target - qc
            # wrap dihedral differences into (-pi, pi]
            nd = len(dihedrals)
            if nd:
                dq_c[-nd:] = (dq_c[-nd:] + np.pi) % (2 * np.pi) - np.pi
            if np.abs(dq_c).max() < 1e-10:
                break
            xn = xn + (np.linalg.pinv(Bc, rcond=1e-7) @ dq_c).reshape(-1, 3)
        gq_prev, dq_prev = gq, np.asarray(
            q_j(jnp.asarray(xn))) - q0
        nd = len(dihedrals)
        if nd:
            dq_prev[-nd:] = (dq_prev[-nd:] + np.pi) % (2 * np.pi) - np.pi
        x = xn
    mol.set_geom_(x)
    return mol, energies
