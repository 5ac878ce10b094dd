"""SCF stability analysis (analog of reference pyscf/scf/stability.py:41).

Internal RHF stability: the orbital-rotation Hessian in the real singlet
channel is A+B (the same matrices as linear response); external
(RHF->UHF) instability probes the triplet channel A-B... here built from
the full A/B of tdscf.get_ab.
"""
import numpy as np


def rhf_stability(mf, internal=True, external=True, verbose=None):
    from ..tdscf.rhf import get_ab
    a, b = get_ab(mf)
    nocc, nvir = a.shape[0], a.shape[1]
    nov = nocc * nvir
    amat = np.asarray(a).reshape(nov, nov)
    bmat = np.asarray(b).reshape(nov, nov)
    results = {}
    if internal:
        h = amat + bmat
        w = np.linalg.eigvalsh(h)
        results['internal_eig'] = w[0]
        results['internal_stable'] = bool(w[0] > -1e-7)
    if external:
        # triplet channel: A - B with the triplet coupling == A_t + ...
        # for real RHF -> UHF instability the relevant block is A - B
        h = amat - bmat
        w = np.linalg.eigvalsh(h)
        results['external_eig'] = w[0]
        results['external_stable'] = bool(w[0] > -1e-7)
    return results
