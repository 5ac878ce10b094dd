"""Multi-chip sharded SCF step over a device mesh (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU, or on a pod)."""
import jax
import jax.numpy as jnp
import numpy as np
import pyscf_tpu as pt
from pyscf_tpu.parallel.mesh import default_mesh, pad_to_multiple, \
    sharded_scf_step
from pyscf_tpu.df import DF
from pyscf_tpu.dft import gen_grid
from pyscf_tpu.lib.linalg import canonical_orth

mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
           basis='cc-pvdz', verbose=0)
n = len(jax.devices())
mesh = default_mesh(n, axis='aux')
step = sharded_scf_step(mesh, mol, xc_code='b3lypg')

grids = gen_grid.Grids(mol).build()
coords = pad_to_multiple(grids.coords, n)
weights = pad_to_multiple(grids.weights, n)
B = pad_to_multiple(DF(mol).build().cderi, n)
h1e = mol.intor('int1e_kin') + mol.intor('int1e_nuc')
x = canonical_orth(mol.intor('int1e_ovlp'))
dm = jnp.asarray(mol.RHF().get_init_guess(mol, 'minao'))

for cycle in range(15):
    e_elec, dm = step(B, coords, weights, dm, h1e, x, 0.2)
    print(f'cycle {cycle}: E = {float(e_elec) + mol.energy_nuc():.10f}')
