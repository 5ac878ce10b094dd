"""BASELINE config 4: N2 MP2 + CCSD(T)/cc-pVQZ (ao2mo + amplitude/triples
contractions). Prints one JSON line with energies and wall times.

Reference analog: pyscf/examples/2-benchmark/n2.py (script only; the
reference publishes no stored numbers). Run with the DF variant too so the
(vv|vv)-free ladder path gets exercised at nvir > 100.
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
import pyscf_tpu as pt  # noqa: E402

mol = pt.M(atom='N 0 0 0; N 0 0 1.0977', basis='cc-pvqz', verbose=0)
print(f'{time.time()-T0:7.1f}s mol built: nao={mol.nao}', flush=True)

mf = pt.scf.RHF(mol)
t0 = time.time()
e_hf = mf.kernel()
t_hf = time.time() - t0
print(f'{time.time()-T0:7.1f}s RHF: E={e_hf:.10f} conv={mf.converged} '
      f'({t_hf:.0f}s)', flush=True)

from pyscf_tpu.mp import MP2  # noqa: E402
t0 = time.time()
pt_mp2 = MP2(mf)
e_mp2_corr = pt_mp2.kernel()[0]
t_mp2 = time.time() - t0
print(f'{time.time()-T0:7.1f}s MP2: E_corr={e_mp2_corr:.10f} ({t_mp2:.0f}s)',
      flush=True)

from pyscf_tpu.cc import CCSD  # noqa: E402
mycc = CCSD(mf)
mycc.verbose = 4
t0 = time.time()
e_ccsd_corr, t1, t2 = mycc.kernel()
t_ccsd = time.time() - t0
print(f'{time.time()-T0:7.1f}s CCSD: E_corr={e_ccsd_corr:.10f} '
      f'conv={mycc.converged} ({t_ccsd:.0f}s)', flush=True)

t0 = time.time()
e_t = mycc.ccsd_t()
t_t = time.time() - t0
print(f'{time.time()-T0:7.1f}s (T): {e_t:.10f} ({t_t:.0f}s)', flush=True)

print(json.dumps({
    'config': 'N2 MP2 + CCSD(T)/cc-pVQZ',
    'nao': mol.nao,
    'e_hf': e_hf,
    'e_mp2_corr': float(e_mp2_corr),
    'e_ccsd_corr': float(e_ccsd_corr),
    'e_ccsd_t': float(e_t),
    'e_tot_ccsd_t': float(e_hf + e_ccsd_corr + e_t),
    'converged': bool(mycc.converged),
    't_hf_s': round(t_hf, 1), 't_mp2_s': round(t_mp2, 1),
    't_ccsd_s': round(t_ccsd, 1), 't_ccsd_iter_s': round(t_ccsd / max(
        1, getattr(mycc, 'max_cycle', 50)), 2),
    't_triples_s': round(t_t, 1),
    'wall_total_s': round(time.time() - T0, 1),
}), flush=True)
