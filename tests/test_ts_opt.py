"""P-RFO transition-state search: H + H2 exchange saddle point."""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.geomopt import optimize_ts


@pytest.mark.slow
def test_h3_exchange_ts():
    mol = pt.M(atom='H 0 0 -1.05; H 0 0 0.0; H 0 0 0.85',
               basis='sto-3g', spin=1, verbose=0)

    def factory(m):
        mf = m.UHF().density_fit()
        mf.conv_tol = 1e-11
        mf.kernel()
        assert mf.converged
        return mf

    ts, energies = optimize_ts(factory, mol, maxsteps=25, gtol=5e-4)
    assert ts._ts_grad_norm < 5e-4
    r = np.asarray(ts.coords)
    d01 = np.linalg.norm(r[1] - r[0])
    d12 = np.linalg.norm(r[2] - r[1])
    # symmetric saddle: equal H-H distances near 0.93 A = 1.76 bohr
    assert abs(d01 - d12) < 5e-3
    assert 1.5 < d01 < 2.1
    # exactly one negative curvature along the chain
    from pyscf_tpu.hessian import Hessian
    mf = factory(ts)
    h = np.asarray(Hessian(mf).kernel()).reshape(9, 9)
    w = np.linalg.eigvalsh(0.5 * (h + h.T))
    assert (w < -1e-4).sum() == 1
