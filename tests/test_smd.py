"""SMD solvation tests: CDS tensions hand-checked against the published
formulas; SCF wrapper stabilizes a polar solute in water."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.lib.parameters import BOHR
from pyscf_tpu.solvent.smd import (_switch, atomic_tensions, get_cds,
                                   sasa, smd_for_scf)


def test_cds_tensions_methane():
    mol = pt.M(atom='''C 0 0 0; H 0.629 0.629 0.629;
                       H -0.629 -0.629 0.629; H -0.629 0.629 -0.629;
                       H 0.629 -0.629 -0.629''', basis='sto-3g')
    coords_ang = np.asarray(mol.coords) * BOHR
    at = atomic_tensions(list(mol.raw_symbols), coords_ang, 0, 0, 0, True)
    rch = np.linalg.norm(coords_ang[1] - coords_ang[0])
    sw = _switch(rch, ('H', 'C'))
    assert abs(at[0] - 129.74) < 1e-10             # lone C: sigma_C
    assert abs(at[1] - (48.69 - 60.77 * sw)) < 1e-10
    a = sasa(mol)
    assert (a > 0).all()
    e_cds = get_cds(mol, 'water')
    assert 0 < e_cds * 627.509 < 10                # small positive kcal/mol


def test_smd_scf_water():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf0 = mol.RHF()
    mf0.init_guess = 'hcore'
    e_gas = mf0.kernel()
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    smd_for_scf(mf, 'water')
    e_smd = mf.kernel()
    dg = (e_smd - e_gas) * 627.509
    assert -15 < dg < 0                            # stabilizing, bounded


def test_smd_nonaqueous():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    e_w = get_cds(mol, 'water')
    e_b = get_cds(mol, 'benzene')
    assert e_w != e_b                              # descriptor dependence
