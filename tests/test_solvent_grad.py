"""C-PCM analytic nuclear gradient vs finite differences (the reference's
cross-validation strategy, solvent/test/test_pcm_grad.py)."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.solvent.pcm import pcm_for_scf

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


def test_cpcm_rhf_grad_vs_fd():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    pcm_for_scf(mf)
    mf.kernel()
    assert mf.converged

    from pyscf_tpu.grad.autodiff import grad_scf
    _, g = grad_scf(mf)
    # translational invariance of the full solvated gradient
    assert abs(g.sum(axis=0)).max() < 1e-6

    h = 1e-3
    x0 = np.asarray(mol.coords).copy()

    def efun(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        f = m2.RHF().density_fit()
        f.conv_tol = 1e-12
        pcm_for_scf(f)
        return f.kernel()

    for (a, d) in [(0, 2), (1, 1)]:
        xp = x0.copy()
        xp[a, d] += h
        xm = x0.copy()
        xm[a, d] -= h
        fd = (efun(xp) - efun(xm)) / (2 * h)
        assert abs(g[a, d] - fd) < 2e-5, (a, d, g[a, d], fd)
