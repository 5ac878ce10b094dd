#!/usr/bin/env python
"""Benchmark: benzene B3LYP/def2-SVP SCF time-to-converged (DF-JK + Becke-grid
XC), on whatever accelerator JAX finds (TPU under the driver).

Prints ONE JSON line with the headline metric plus a per-phase breakdown
(grids / AO-on-grid / DF factorization / 1e+guess / fused SCF loop) and an
MFU estimate for the fused SCF program (analytic FLOP model / measured
loop time / f32 MXU peak).

Baseline: PySCF v2.14 on a 32-core CPU node for the same config measured at
~12 s time-to-converged (engineering estimate from the reference's
examples/2-benchmark timings scaled to this molecule; the reference cannot
execute in this container -- no prebuilt libcint and zero egress -- so the
estimate is documented here and will be re-measured when a reference
environment is available). vs_baseline = baseline_seconds / our_seconds
(>1 means faster than baseline).

Protocol: the cold run pays every jit compile (kernels are cached across
processes via the persistent compilation cache) and populates the
per-geometry integral caches. The headline warm run is the steady-state
time-to-converged for a FRESH mean-field on the same geometry with the
DF geometry cache cleared, so it covers grid build + AO evaluation +
DF factorization + SCF to 1e-8 from the minao guess — everything a
whole-run baseline pays. warm_cached_s is the rerun with the per-Mole
DF/integral caches warm (what a geomopt/MD step sees).
"""
import json
import time

BASELINE_SECONDS = 12.0
V5E_F32_PEAK = 197e12      # TPU v5e bf16 peak is ~394 TF/s; f32 ~197 TF/s

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
    """Full time-to-converged: grids + SCF, fresh mf each call."""
    import pyscf_tpu as pt
    t0 = time.time()
    mf = pt.dft.RKS(mol, xc='b3lypg').density_fit()
    mf.conv_tol = 1e-8
    e = mf.kernel()
    dt = time.time() - t0
    return e, dt, mf


def scf_flops_per_cycle(nao, nocc, naux, ngrid):
    """Analytic FLOP model of one fused DF-RKS cycle (dominant matmuls):
    XC rho eval + vxc matrix (2 x ngrid x nao^2 GEMMs each, GGA carries
    4 AO derivative components through the rho contraction), DF J
    (2 GEMVs over aux), DF K via occupied orbitals, and the eigh."""
    xc = 2.0 * 2 * ngrid * nao ** 2 + 2.0 * 4 * ngrid * nao  # dmao+vmat
    j = 2 * 2.0 * naux * nao ** 2
    k = 2 * 2.0 * naux * nao ** 2 * nocc
    eig = 10.0 * nao ** 3
    return xc + j + k + eig


def main():
    import jax
    import pyscf_tpu as pt
    mol = pt.M(atom=BENZENE, basis='def2-svp', verbose=0)
    # cold run: pays jit compiles (persistent-cached) + integral caches
    e1, t_cold, _ = run_scf(mol)

    # phase breakdown on a fresh mean-field (integral caches warm,
    # DF factor deliberately rebuilt to time it)
    mf = pt.dft.RKS(mol, xc='b3lypg').density_fit()
    mf.conv_tol = 1e-8
    phases = {}
    t0 = time.time()
    mf.grids.build()
    phases['grids_build'] = time.time() - t0
    t0 = time.time()
    aod, weights = mf._numint.grid_ao(mol, mf.grids, 1)
    jax.block_until_ready(aod)
    phases['grid_ao_eval'] = time.time() - t0
    t0 = time.time()
    mol._df_cache.clear()           # time the actual factorization
    mf.with_df.reset(mol).build()
    jax.block_until_ready(mf.with_df.cderi)
    phases['df_factorization'] = time.time() - t0
    t0 = time.time()
    h1e = mf.get_hcore(mol)
    s1e = mf.get_ovlp(mol)
    dm0 = mf.get_init_guess(mol)
    jax.block_until_ready((h1e, s1e, dm0))
    phases['h1e_guess'] = time.time() - t0
    t0 = time.time()
    e_phase = mf.kernel(dm0=dm0)
    phases['fused_scf_loop'] = time.time() - t0
    ncyc = getattr(mf, 'scf_cycles', 0)

    # warm run: steady-state fresh-mf time-to-converged.  The DF factor is
    # rebuilt (geometry cache cleared) so the headline covers every phase a
    # whole-run baseline pays; the cheaper geometry-cached rerun (what a
    # geomopt/MD step or a second method on the same Mole sees) is reported
    # separately as warm_cached_s.
    mol._df_cache.clear()
    e2, t_warm, mf2 = run_scf(mol)
    _, t_warm_cached, _ = run_scf(mol)
    assert mf2.converged, 'SCF did not converge'
    assert abs(e1 - e2) < 1e-9, (e1, e2)
    assert abs(e_phase - e2) < 1e-7, (e_phase, e2)

    nao = mol.nao
    nocc = mol.nelectron // 2
    naux = mf.with_df.auxmol.nao
    ngrid = int(aod.shape[0] * aod.shape[-2])
    flops = scf_flops_per_cycle(nao, nocc, naux, ngrid) * max(ncyc, 1)
    mfu = flops / max(phases['fused_scf_loop'], 1e-9) / V5E_F32_PEAK

    print(json.dumps({
        'metric': 'benzene B3LYP/def2-SVP DF-RKS SCF time-to-converged',
        'value': round(t_warm, 3),
        'unit': 'seconds',
        'vs_baseline': round(BASELINE_SECONDS / t_warm, 3),
        'warm_cached_s': round(t_warm_cached, 3),
        'breakdown_s': {k: round(v, 3) for k, v in phases.items()},
        'cold_s': round(t_cold, 1),
        'scf_cycles': ncyc,
        'nao': nao, 'naux': naux, 'ngrid': ngrid,
        'scf_flop_model': flops,
        'mfu_vs_f32_peak': round(mfu, 6),
        'baseline_note': '12s = unmeasured engineering estimate for '
                         'PySCF v2.14 on 32 CPU cores (reference not '
                         'runnable in this container)',
    }))


if __name__ == '__main__':
    main()
