"""Z-matrix input and ghost atoms (reference gto/mole.py from_zmatrix:4007
and the GHOST-/X- dummy-atom conventions)."""
import math

import numpy as np

import pyscf_tpu as pt


def test_zmatrix_geometry_and_energy():
    zm = 'O; H 1 0.9584; H 1 0.9584 2 104.45'
    m1 = pt.M(atom=zm, basis='sto-3g', verbose=0)
    r01 = np.linalg.norm(m1.coords[1] - m1.coords[0]) * 0.529177210903
    v1 = m1.coords[1] - m1.coords[0]
    v2 = m1.coords[2] - m1.coords[0]
    ang = math.degrees(math.acos(
        float(v1 @ v2) / np.linalg.norm(v1) / np.linalg.norm(v2)))
    assert abs(r01 - 0.9584) < 1e-8
    assert abs(ang - 104.45) < 1e-8
    e1 = m1.RHF().kernel()
    th = math.radians(104.45)
    cart = (f'O 0 0 0; H 0.9584 0 0; '
            f'H {0.9584 * math.cos(th)} {0.9584 * math.sin(th)} 0')
    m2 = pt.M(atom=cart, basis='sto-3g', verbose=0)
    e2 = m2.RHF().kernel()
    assert abs(e1 - e2) < 1e-10      # energies are rotation invariant


def test_zmatrix_dihedral():
    # trans (180 deg) H2O2-like chain: dihedral places atom 4 out of plane
    zm = 'H; O 1 0.95; O 2 1.45 1 105; H 3 0.95 2 105 1 120'
    m = pt.M(atom=zm, basis='sto-3g', verbose=0)
    r = np.asarray(m.coords)
    # bond lengths survive the construction
    assert abs(np.linalg.norm(r[3] - r[2]) * 0.529177210903 - 0.95) < 1e-8
    # dihedral magnitude is 120 degrees
    b1, b2, b3 = r[1] - r[0], r[2] - r[1], r[3] - r[2]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    cosd = float(n1 @ n2) / (np.linalg.norm(n1) * np.linalg.norm(n2))
    assert abs(abs(math.degrees(math.acos(np.clip(cosd, -1, 1)))) -
               120.0) < 1e-6


def test_ghost_atoms_counterpoise():
    ma = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    ea = ma.RHF().kernel()
    mg = pt.M(atom='He 0 0 0; ghost-He 0 0 1.5', basis='cc-pvdz', verbose=0)
    assert mg.nelectron == 2
    assert mg.nao == 2 * ma.nao
    assert int(mg.charges[1]) == 0
    eg = mg.RHF().kernel()
    # extra (ghost) basis can only lower the variational energy
    assert eg < ea + 1e-12
    assert ea - eg < 0.01
    # X- prefix is the same ghost
    mx = pt.M(atom='He 0 0 0; X-He 0 0 1.5', basis='cc-pvdz', verbose=0)
    ex = mx.RHF().kernel()
    assert abs(ex - eg) < 1e-12
