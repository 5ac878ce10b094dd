"""File-format tool tests (wfn export)."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.ops.eval_gto import eval_gto
from pyscf_tpu.tools import wfn_format


def test_wfn_primitive_expansion():
    """The cartesian-primitive expansion must reproduce the spherical-AO
    MO values pointwise (machine precision)."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='cc-pvdz')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    mo = np.asarray(mf.mo_coeff)
    centers, types, exps, prim = wfn_format.primitive_expansion(mol, mo)
    rng = np.random.RandomState(0)
    pts = rng.rand(25, 3) * 2 - 1
    mo_ref = np.asarray(eval_gto(mol, 'GTOval', pts)) @ mo
    t2t = {v: k for k, v in wfn_format._TYPE.items()}
    coords = np.asarray(mol.coords)
    mo_prim = np.zeros_like(mo_ref)
    for p in range(len(exps)):
        d = pts - coords[centers[p]]
        a, b, c = t2t[types[p]]
        g = (d[:, 0] ** a * d[:, 1] ** b * d[:, 2] ** c
             * np.exp(-exps[p] * np.sum(d * d, axis=1)))
        mo_prim += np.outer(g, prim[p])
    assert abs(mo_prim - mo_ref).max() < 1e-10


def test_wfn_write(tmp_path):
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    fn = str(tmp_path / 'h2.wfn')
    wfn_format.write_scf(fn, mf)
    txt = open(fn).read()
    assert 'GAUSSIAN' in txt
    assert 'END DATA' in txt
    assert 'OCC NO =    2.0000000' in txt


def test_fcidump_to_scf_roundtrip(tmp_path):
    """SCF rerun from a dumped FCIDUMP reproduces the original energy."""
    from pyscf_tpu.tools import fcidump
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    e0 = mf.kernel()
    fn = str(tmp_path / 'h2o.fcidump')
    fcidump.from_scf(mf, fn)
    e1, w, c, dm = fcidump.to_scf(fn)
    assert abs(e1 - float(e0)) < 1e-9


def test_fcidump_from_mcscf_roundtrip():
    """FCI on a re-read active-space dump reproduces the CASCI energy."""
    from pyscf_tpu.fci import direct_spin1
    from pyscf_tpu.mcscf import CASCI
    from pyscf_tpu.tools import fcidump
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    mc = CASCI(mf, 4, 4)
    e0, _, _ = mc.kernel()
    import tempfile, os
    fn = os.path.join(tempfile.mkdtemp(), 'cas.fcidump')
    fcidump.from_mcscf(mc, fn)
    d = fcidump.read(fn)
    na = (d['NELEC'] + d['MS2']) // 2
    e, _ = direct_spin1.kernel(d['H1'], d['H2'], d['NORB'],
                               (na, d['NELEC'] - na), ecore=d['ECORE'])
    assert abs(e - e0) < 1e-8
