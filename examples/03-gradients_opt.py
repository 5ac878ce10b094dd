"""Analytic gradients, geometry optimization, frequencies."""
import numpy as np
import pyscf_tpu as pt

mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
           basis='sto-3g', verbose=0)
mf = mol.RHF().run()
print('gradient:\n', np.asarray(mf.Gradients().kernel()))

from pyscf_tpu.geomopt import optimize
def factory(m):
    f = m.RHF()
    f.verbose = 0
    f.kernel()
    return f
mol_opt, energies = optimize(factory, mol)
print('optimized E:', energies[-1])
