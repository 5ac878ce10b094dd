#!/usr/bin/env python
"""Benchmark: benzene B3LYP/def2-SVP SCF time-to-converged (DF-JK + Becke-grid
XC), on whatever accelerator JAX finds (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: PySCF v2.14 on a 32-core CPU node for the same config measured at
~12 s time-to-converged (engineering estimate from the reference's
examples/2-benchmark timings scaled to this molecule; the reference cannot
execute in this container -- no prebuilt libcint and zero egress -- so the
estimate is documented here and will be re-measured when a reference
environment is available). vs_baseline = baseline_seconds / our_seconds
(>1 means faster than baseline).
"""
import json
import time

BASELINE_SECONDS = 12.0

BENZENE = '''
C  0.000000  1.396792  0.000000
C  1.209657  0.698396  0.000000
C  1.209657 -0.698396  0.000000
C  0.000000 -1.396792  0.000000
C -1.209657 -0.698396  0.000000
C -1.209657  0.698396  0.000000
H  0.000000  2.484212  0.000000
H  2.151390  1.242106  0.000000
H  2.151390 -1.242106  0.000000
H  0.000000 -2.484212  0.000000
H -2.151390 -1.242106  0.000000
H -2.151390  1.242106  0.000000
'''


def run_scf(mol):
    """Full time-to-converged: DF build + grids + SCF, fresh mf each call."""
    import pyscf_tpu as pt
    t0 = time.time()
    mf = pt.dft.RKS(mol, xc='b3lypg').density_fit()
    mf.conv_tol = 1e-8
    e = mf.kernel()
    dt = time.time() - t0
    return e, dt, mf.converged


def main():
    import pyscf_tpu as pt
    mol = pt.M(atom=BENZENE, basis='def2-svp', verbose=0)
    # first run pays jit compiles (cached per molecule/class shapes);
    # the warm run re-does ALL the physics (integrals, DF factorization,
    # grids, SCF to convergence) with compiled kernels
    e1, t_cold, conv1 = run_scf(mol)
    e2, t_warm, conv2 = run_scf(mol)
    assert conv2, 'SCF did not converge'
    assert abs(e1 - e2) < 1e-9, (e1, e2)
    print(json.dumps({
        'metric': 'benzene B3LYP/def2-SVP DF-RKS SCF time-to-converged',
        'value': round(t_warm, 3),
        'unit': 'seconds',
        'vs_baseline': round(BASELINE_SECONDS / t_warm, 3),
    }))


if __name__ == '__main__':
    main()
