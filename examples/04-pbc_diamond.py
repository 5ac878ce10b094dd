"""Periodic boundary conditions: Gamma-point DFT on diamond."""
from pyscf_tpu.pbc.gto import Cell
from pyscf_tpu.pbc.dft import RKS

cell = Cell(atom='C 0 0 0; C 0.8917 0.8917 0.8917',
            a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834],
               [1.7834, 1.7834, 0]],
            basis='gth-szv', pseudo='gth-pade', verbose=4).build()
mf = RKS(cell, xc='lda,vwn')
mf.kernel()                          # ~ -10.2217
