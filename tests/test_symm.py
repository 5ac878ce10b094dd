"""Point-group detection + orbital symmetry labels
(reference analog: pyscf/symm/test/test_geom.py)."""
import math

import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.symm import detect_symm, label_orb_symm, symm_adapted_basis

c, s = math.cos, math.sin


def _group(atom):
    mol = pt.M(atom=atom, basis='sto-3g', verbose=0)
    return detect_symm(mol)[0]


def test_detect_symm():
    assert _group('O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587') == 'C2v'
    assert _group('C 0 0 0; O 0 0 1.16; O 0 0 -1.16') == 'Dooh'
    assert _group('C 0 0 0; O 0 0 1.12') == 'Coov'
    assert _group('C 0 0 0; H .63 .63 .63; H -.63 -.63 .63;'
                  'H -.63 .63 -.63; H .63 -.63 -.63') == 'Td'
    assert _group('S 0 0 0; F 1.56 0 0; F -1.56 0 0; F 0 1.56 0;'
                  'F 0 -1.56 0; F 0 0 1.56; F 0 0 -1.56') == 'Oh'
    assert _group('C 0 0 0.67; C 0 0 -0.67; H 0 0.92 1.23; H 0 -0.92 1.23;'
                  'H 0 0.92 -1.23; H 0 -0.92 -1.23') == 'D2h'
    nh3 = [('N', (0, 0, 0.11))] + [
        ('H', (0.9377 * c(2 * math.pi * k / 3),
               0.9377 * s(2 * math.pi * k / 3), -0.27)) for k in range(3)]
    assert _group(nh3) == 'C3v'
    bz = []
    for k in range(6):
        a = math.pi * k / 3
        bz.append(('C', (1.396 * c(a), 1.396 * s(a), 0.0)))
        bz.append(('H', (2.484 * c(a), 2.484 * s(a), 0.0)))
    assert _group(bz) == 'D6h'
    assert _group('He 0 0 0') == 'SO3'


def test_h2o_orbital_labels():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0, symmetry=True)
    assert mol.topgroup == 'C2v'
    assert mol.groupname == 'C2v'
    mf = pt.scf.RHF(mol)
    mf.kernel()
    grp, labels = label_orb_symm(mol, np.asarray(mf.mo_coeff))
    assert grp == 'C2v'
    # 1a1 2a1 1b 3a1 1b' pattern (B1/B2 naming is sigma-v-convention
    # dependent); no orbital may be unassigned
    assert '?' not in labels
    assert labels[0] == labels[1] == labels[3] == 'A1'
    assert {labels[2], labels[4]} == {'B1', 'B2'}
    grp2, salcs = symm_adapted_basis(mol)
    assert sum(v.shape[1] for v in salcs.values()) == mol.nao
    # SALCs block-diagonalize the Fock matrix
    dm = mf.make_rdm1()
    f = np.asarray(mf.get_hcore(mol) + mf.get_veff(mol, dm))
    for k1, v1 in salcs.items():
        for k2, v2 in salcs.items():
            blk = v1.T @ f @ v2
            if k1 != k2:
                assert np.abs(blk).max() < 1e-7
