"""Round-2 additions tour: CCSDT, ddCOSMO, Hückel guess, AutoAux, SCAN,
k-point TDA.

Run on CPU:  JAX_PLATFORMS=cpu python examples/07-ccsdt_solvent_ktda.py
"""
import numpy as np
import pyscf_tpu as pt

mol = pt.M(atom='O 0 0 0.1174; H 0 0.7572 -0.4696; H 0 -0.7572 -0.4696',
           basis='sto-3g', verbose=0)

# --- full CCSDT (oracle-certified spin-orbital equations) -------------
mf = mol.RHF()
mf.kernel()
cc = mf.CCSDT()
cc.verbose = 0
cc.kernel()
print(f'CCSDT     E_corr = {cc.e_corr:.10f}  E_tot = {cc.e_tot:.10f}')

# --- Hückel initial guess (on-the-fly atomic SCF + GWH) ---------------
mf2 = mol.RHF()
mf2.init_guess = 'huckel'
e = mf2.kernel()
print(f'RHF (huckel guess) E = {e:.10f}')

# --- AutoAux even-tempered fitting basis ------------------------------
from pyscf_tpu.df import autoaux
aux = autoaux(mol)
print('AutoAux aux functions per element:',
      {k: len(v) for k, v in aux.items()})
mf3 = mol.RHF().density_fit(auxbasis='autoaux')
print(f'DF-RHF (autoaux) E = {mf3.kernel():.10f}')

# --- ddCOSMO solvation ------------------------------------------------
from pyscf_tpu.solvent import ddcosmo_for_scf
mf4 = ddcosmo_for_scf(mol.RHF())
e_solv = mf4.kernel()
print(f'RHF + ddCOSMO E = {e_solv:.10f}  '
      f'dE_solv = {e_solv - e:.6f}')

# --- SCAN meta-GGA ----------------------------------------------------
mf5 = mol.RKS(xc='SCAN')
print(f'SCAN      E = {mf5.kernel():.10f}')

# --- k-point TDA ------------------------------------------------------
from pyscf_tpu.pbc.gto.cell import Cell
from pyscf_tpu.pbc.scf.khf import KRHF
from pyscf_tpu.pbc.tdscf import KTDA

cell = Cell(atom='H 0 0 0; H 0 0 1.1', a=np.diag([6.0, 6.0, 2.2]),
            basis='sto-3g', unit='bohr', mesh=[11, 11, 7],
            verbose=0).build()
kmf = KRHF(cell, kpts=cell.make_kpts([1, 1, 2]))
kmf.kernel()
td = KTDA(kmf)
e_exc = td.kernel(nstates=2)
print('KTDA excitation energies (Ha):', np.round(np.asarray(e_exc), 6))
