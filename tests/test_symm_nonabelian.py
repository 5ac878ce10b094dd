"""Full point-group machinery: computed operations, character tables,
Mulliken names, MO labels (reference analog: symm/basis.py + param.py
hardcoded tables; here everything is derived numerically)."""
import math

import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.symm.nonabelian import (PointGroup, label_orb_symm_full,
                                       symm_adapted_basis_full)


def _nh3():
    r, zh = 0.9377, -0.3816
    atoms = [('N', (0, 0, 0.1))] + [
        ('H', (r * math.cos(2 * math.pi * k / 3),
               r * math.sin(2 * math.pi * k / 3), zh)) for k in range(3)]
    return pt.M(atom=atoms, basis='sto-3g', verbose=0)


def _ch4():
    a = 0.6276
    return pt.M(atom=f'C 0 0 0; H {a} {a} {a}; H {a} {-a} {-a}; '
                f'H {-a} {a} {-a}; H {-a} {-a} {a}',
                basis='sto-3g', verbose=0)


def test_c3v_group():
    pg = PointGroup(_nh3())
    assert pg.groupname == 'C3v'
    assert pg.order == 6
    assert len(pg.classes) == 3
    assert sorted(pg.irrep_names) == ['a1', 'a2', 'e']


def test_td_group():
    pg = PointGroup(_ch4())
    assert pg.groupname == 'Td'
    assert pg.order == 24
    assert len(pg.classes) == 5
    assert sorted(pg.irrep_names) == ['a1', 'a2', 'e', 't1', 't2']


def test_d6h_group():
    rc, rh = 1.39, 2.47
    atoms = []
    for k in range(6):
        th = math.pi * k / 3
        atoms.append(('C', (rc * math.cos(th), rc * math.sin(th), 0.0)))
        atoms.append(('H', (rh * math.cos(th), rh * math.sin(th), 0.0)))
    pg = PointGroup(pt.M(atom=atoms, basis='sto-3g', verbose=0))
    assert pg.groupname == 'D6h'
    assert pg.order == 24
    assert len(pg.classes) == 12
    names = set(pg.irrep_names)
    assert {'a1g', 'a2u', 'e1g', 'e2u', 'b1g'} <= names
    # all names carry g/u parity
    assert all(n[-1] in 'gu' for n in names)


def test_character_orthogonality():
    """Computed character rows satisfy the orthogonality relations."""
    pg = PointGroup(_ch4())
    sizes = np.array([len(c) for c in pg.classes], float)
    for i, (chi_i, mem_i) in enumerate(pg.rows):
        for j, (chi_j, mem_j) in enumerate(pg.rows):
            s = np.sum(sizes * chi_i * chi_j)
            expect = pg.order * (len(mem_i) if i == j else 0)
            assert abs(s - expect) < 1e-6


def test_salc_dimensions_td():
    """CH4/STO-3G: 9 AOs -> a1: {C1s, C2s, H-sym} = 3 columns,
    t2: {C p x3, H SALC x3} = 6 columns."""
    g, salcs = symm_adapted_basis_full(_ch4())
    assert g == 'Td'
    dims = {k: v.shape[1] for k, v in salcs.items()}
    assert dims.get('a1') == 3
    assert dims.get('t2') == 6
    assert sum(dims.values()) == 9


@pytest.mark.slow
def test_nh3_mo_labels():
    mol = _nh3()
    mf = mol.RHF()
    mf.conv_tol = 1e-10
    mf.kernel()
    g, labels = label_orb_symm_full(mol, np.asarray(mf.mo_coeff))
    assert g == 'C3v'
    # occupied: 1a1 2a1 1e 1e 3a1
    assert labels[:5].count('a1') == 3
    assert labels[:5].count('e') == 2
    assert '?' not in labels


@pytest.mark.slow
def test_ch4_mo_labels():
    mol = _ch4()
    mf = mol.RHF()
    mf.conv_tol = 1e-10
    mf.kernel()
    g, labels = label_orb_symm_full(mol, np.asarray(mf.mo_coeff))
    assert g == 'Td'
    assert labels[:5] == ['a1', 'a1', 't2', 't2', 't2']
    assert '?' not in labels
