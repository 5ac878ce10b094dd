"""Spin operators on FCI vectors (reference analog: pyscf/fci/spin_op.py).

S^2 = S-S+ + Sz(Sz+1) evaluated with the determinant-level ladder
operators from ops.py; no link-table C kernels needed.
"""
import numpy as np

from . import ops
from .direct_spin1 import _unpack_nelec


def _splus(ci, norb, nelec):
    """S+ |ci> = sum_p a+_pa a_pb |ci>: (na,nb) -> (na+1, nb-1)."""
    na, nb = nelec
    out = None
    for p in range(norb):
        v, sector = ops.apply_op(ci, norb, (na, nb),
                                 [(p, 0, True), (p, 1, False)])
        if v is None:
            continue
        out = v if out is None else out + v
    return out, (na + 1, nb - 1)


def _sminus(ci, norb, nelec):
    """S- |ci> = sum_p a+_pb a_pa |ci>."""
    na, nb = nelec
    out = None
    for p in range(norb):
        v, sector = ops.apply_op(ci, norb, (na, nb),
                                 [(p, 1, True), (p, 0, False)])
        if v is None:
            continue
        out = v if out is None else out + v
    return out, (na - 1, nb + 1)


def contract_ss(ci, norb, nelec):
    """S^2 |ci> within the (na, nb) sector."""
    na, nb = _unpack_nelec(nelec)
    ci = np.asarray(ci)
    sz = 0.5 * (na - nb)
    out = (sz * sz + sz) * ci
    sp, sector = _splus(ci, norb, (na, nb))
    if sp is not None:
        sm, _ = _sminus(sp, norb, sector)
        if sm is not None:
            out = out + sm.reshape(ci.shape)
    return out


def spin_square(ci, norb, nelec):
    """(<S^2>, multiplicity 2S+1) for a normalized CI vector."""
    na, nb = _unpack_nelec(nelec)
    ci = np.asarray(ci)
    ss = float(np.sum(ci * contract_ss(ci, norb, (na, nb))))
    ss /= float(np.sum(ci * ci))
    s = 0.5 * (np.sqrt(4.0 * ss + 1.0) - 1.0)
    return ss, 2.0 * s + 1.0
