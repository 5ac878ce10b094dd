import time, json
T0 = time.time()
import os, sys
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # for _env
sys.path.insert(0, os.path.dirname(_HERE))     # repo root for pyscf_tpu
from _env import ensure_backend
ensure_backend()        # fall back to CPU if the TPU tunnel is down
import numpy as np
import jax
jax.devices()
import pyscf_tpu as pt

# compact (H2O)10: two stacked pentagonal rings (O-O ~ 2.8 A), a standard
# cluster motif; exact geometry is not pinned by the benchmark config
waters = []
import math
for ring, z0 in ((0, 0.0), (1, 2.8)):
    for k in range(5):
        th = 2*math.pi*k/5 + (math.pi/5 if ring else 0)
        Ox, Oy = 2.4*math.cos(th), 2.4*math.sin(th)
        waters.append((Ox, Oy, z0))
atoms = []
for (x, y, z) in waters:
    atoms.append(('O', (x, y, z)))
    atoms.append(('H', (x+0.7571, y, z+0.5861)))
    atoms.append(('H', (x-0.7571, y, z+0.5861)))
mol = pt.M(atom=atoms, basis='cc-pvtz', verbose=4)
print(f'{time.time()-T0:7.1f}s mol built: nao={mol.nao} natm={mol.natm}', flush=True)
mf = pt.scf.RHF(mol).density_fit()
mf.conv_tol = 1e-8
t0 = time.time()
mf.with_df.build()
print(f'{time.time()-T0:7.1f}s DF built: naux={mf.with_df.naux} ({time.time()-t0:.0f}s)', flush=True)
t0 = time.time()
e = mf.kernel()
dt = time.time()-t0
print(f'{time.time()-T0:7.1f}s SCF: E={e:.10f} conv={mf.converged} ({dt:.0f}s)', flush=True)
print(json.dumps({'config': '(H2O)10 RHF/cc-pVTZ DF', 'nao': mol.nao,
                  'naux': int(mf.with_df.naux), 'e_tot': e,
                  'converged': bool(mf.converged),
                  'wall_total_s': round(time.time()-T0, 1)}), flush=True)
