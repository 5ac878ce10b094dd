"""AO->MO integral transforms (analog of reference pyscf/ao2mo).

The reference's blocked HDF5 out-of-core machinery (ao2mo/outcore.py) is
replaced by dense MXU dot chains in HBM; s4/s8 symmetry packing is dropped
in favor of full tensors (TPU-friendly regular shapes).
"""
import jax
import jax.numpy as jnp


@jax.jit
def _full(eri, c):
    out = jnp.einsum('pqrs,pi->iqrs', eri, c)
    out = jnp.einsum('iqrs,qj->ijrs', out, c)
    out = jnp.einsum('ijrs,rk->ijks', out, c)
    return jnp.einsum('ijks,sl->ijkl', out, c)


@jax.jit
def _general(eri, c0, c1, c2, c3):
    out = jnp.einsum('pqrs,pi->iqrs', eri, c0)
    out = jnp.einsum('iqrs,qj->ijrs', out, c1)
    out = jnp.einsum('ijrs,rk->ijks', out, c2)
    return jnp.einsum('ijks,sl->ijkl', out, c3)


def full(eri_or_mol, mo_coeff, *args, **kwargs):
    """(ij|kl) in MO basis; accepts an ERI tensor or a Mole."""
    eri = _resolve_eri(eri_or_mol)
    return _full(eri, jnp.asarray(mo_coeff))


def general(eri_or_mol, mo_coeffs, *args, **kwargs):
    eri = _resolve_eri(eri_or_mol)
    cs = [jnp.asarray(c) for c in mo_coeffs]
    return _general(eri, *cs)


def kernel(eri_or_mol, mo_coeffs, *args, **kwargs):
    if isinstance(mo_coeffs, (tuple, list)):
        return general(eri_or_mol, mo_coeffs)
    return full(eri_or_mol, mo_coeffs)


def _resolve_eri(eri_or_mol):
    if hasattr(eri_or_mol, 'intor'):
        return eri_or_mol.intor('int2e')
    return jnp.asarray(eri_or_mol)


def restore(symmetry, eri, nao):
    """Symmetry-pack conversion. Only s1 (full) tensors are used internally;
    provided for API parity with reference ao2mo/addons.py restore."""
    eri = jnp.asarray(eri)
    if symmetry in (1, '1', 's1'):
        return eri.reshape(nao, nao, nao, nao)
    raise NotImplementedError('only s1 supported on TPU path')
