"""BASELINE config 5: diamond Gamma-point PBE with GDF (periodic integrals
+ k-point SCF path). Prints one JSON line with energy and wall times.

Golden cross-check: the GDF result must match the exact FFTDF result to
the Cholesky-factorization tolerance (tests/test_pbc.py
test_diamond_gamma_pbe_gdf); the LDA variant of this cell matches the
reference golden pyscf/pbc/dft/test/test_krks.py:112 to 1e-6.
"""
import time
import json

T0 = time.time()
import os, sys
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                      # for _env
sys.path.insert(0, os.path.dirname(_HERE))     # repo root for pyscf_tpu
from _env import ensure_backend  # noqa: E402
ensure_backend()        # fall back to CPU if the TPU tunnel is down
import jax  # noqa: E402
jax.devices()
from pyscf_tpu.pbc.gto import Cell  # noqa: E402
from pyscf_tpu.pbc.dft import RKS  # noqa: E402

DIAMOND = dict(
    atom='C 0 0 0; C 0.8917 0.8917 0.8917',
    a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834], [1.7834, 1.7834, 0]],
    basis='gth-szv', pseudo='gth-pade', verbose=0)

cell = Cell(mesh=[15] * 3, **DIAMOND).build()
print(f'{time.time()-T0:7.1f}s cell built: nao={cell.nao} '
      f'mesh={cell.mesh}', flush=True)

mf = RKS(cell, xc='pbe').density_fit()
mf.conv_tol = 1e-9
mf.init_guess = 'hcore'
t0 = time.time()
e_gdf = mf.kernel()
t_gdf = time.time() - t0
print(f'{time.time()-T0:7.1f}s GDF-PBE: E={e_gdf:.10f} '
      f'conv={mf.converged} ({t_gdf:.0f}s)', flush=True)

mf2 = RKS(cell, xc='pbe')
mf2.conv_tol = 1e-9
mf2.init_guess = 'hcore'
t0 = time.time()
e_fft = mf2.kernel()
t_fft = time.time() - t0
print(f'{time.time()-T0:7.1f}s FFTDF-PBE: E={e_fft:.10f} ({t_fft:.0f}s)',
      flush=True)

print(json.dumps({
    'config': 'diamond Gamma PBE + GDF (gth-szv, [15]^3 mesh)',
    'nao': cell.nao,
    'e_gdf': float(e_gdf),
    'e_fftdf': float(e_fft),
    'gdf_vs_fftdf': abs(float(e_gdf) - float(e_fft)),
    'converged': bool(mf.converged),
    't_gdf_scf_s': round(t_gdf, 1),
    't_fftdf_scf_s': round(t_fft, 1),
    'wall_total_s': round(time.time() - T0, 1),
}), flush=True)
