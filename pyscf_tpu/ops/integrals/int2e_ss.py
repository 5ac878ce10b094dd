"""Small-component (kinetic-balance) two-electron integrals for 4-component
Dirac-Hartree-Fock: the (SS|LL) and (SS|SS) Coulomb classes.

Reference analog: libcint's int2e_spsp1 / int2e_spsp1spsp2 spinor kernels
(reference pyscf/scf/dhf.py:523 get_jk_coulomb).  Here the spin separation
is done analytically,

  (sigma.p chi_mu)^+ (sigma.p chi_nu)
      = grad(chi_mu).grad(chi_nu) I_2 + i sigma.(grad(chi_mu) x grad(chi_nu)),

so everything reduces to SCALAR Cartesian-derivative ERIs

  G1[d,e]        = (d_d chi_mu d_e chi_nu | chi_ka chi_la)
  G2[d,e,f,g]    = (d_d chi_mu d_e chi_nu | d_f chi_ka d_g chi_la)

evaluated in the same McMurchie-Davidson Hermite engine as the
non-relativistic ERIs: the derivative acts on the E expansion tables only
(d/dx of a Cartesian Gaussian = 2a*(l+1-component) - l*(l-1-component)),
identical in structure to DerivPairClass (int2e.py) but applied to BOTH
bra functions.  The spin matrices are attached at assembly time in
scf/dhf.py.
"""
import numpy as np
import jax.numpy as jnp

from .hermite import cart_components, n_tuv
from .cart2sph import cart2sph
from .int2e import (PAIR_CHUNK, PairClass, _pair_data_kernel, _eri_chunk,
                    _sph)
from ..device import on_integral_device


class Deriv2PairClass:
    """Hermite pair data for (d_d chi_a)(d_e chi_b) of an (la,lb) class.

    E has the cart axis enlarged to 9*nca*ncb (derivative directions d,e
    major), with ntuv of order la+lb+2; reuses _eri_chunk unchanged.
    """

    def __init__(self, mol, la, lb, chunk=PAIR_CHUNK):
        ga, gb = mol.shell_groups[la], mol.shell_groups[lb]
        dat = (jnp.asarray(ga.exps), jnp.asarray(ga.coeffs),
               jnp.asarray(ga.coords),
               jnp.asarray(gb.exps), jnp.asarray(gb.coeffs),
               jnp.asarray(gb.coords))
        p, P, Epp = _pair_data_kernel(la + 1, lb + 1, *dat)
        Epm = _pair_data_kernel(la + 1, lb - 1, *dat)[2] if lb >= 1 else None
        Emp = _pair_data_kernel(la - 1, lb + 1, *dat)[2] if la >= 1 else None
        Emm = (_pair_data_kernel(la - 1, lb - 1, *dat)[2]
               if la >= 1 and lb >= 1 else None)
        nsa, Ka = ga.exps.shape
        nsb, Kb = gb.exps.shape
        m = nsa * nsb * Ka * Kb
        af = jnp.broadcast_to(ga.exps[:, None, :, None],
                              (nsa, nsb, Ka, Kb)).reshape(m)[:, None]
        bf = jnp.broadcast_to(gb.exps[None, :, None, :],
                              (nsa, nsb, Ka, Kb)).reshape(m)[:, None]
        nca, ncb = len(cart_components(la)), len(cart_components(lb))
        ntL = n_tuv(la + lb + 2)

        def resh(E, l1, l2):
            if E is None:
                return None
            n1, n2 = len(cart_components(l1)), len(cart_components(l2))
            return E.reshape(m, n1, n2, -1)

        Epp = resh(Epp, la + 1, lb + 1)
        Epm = resh(Epm, la + 1, lb - 1)
        Emp = resh(Emp, la - 1, lb + 1)
        Emm = resh(Emm, la - 1, lb - 1)
        idx = {l: {c: i for i, c in enumerate(cart_components(l))}
               for l in (la + 1, la - 1, lb + 1, lb - 1) if l >= 0}

        # (d_d chi_a)(d_e chi_b) = (2a*up_a - i_d*dn_a)(2b*up_b - j_e*dn_b)
        blocks = []
        for d in range(3):
            for e in range(3):
                cols = []
                for ca in cart_components(la):
                    row = []
                    upa = list(ca)
                    upa[d] += 1
                    dna = list(ca)
                    dna[d] -= 1
                    for cb in cart_components(lb):
                        upb = list(cb)
                        upb[e] += 1
                        dnb = list(cb)
                        dnb[e] -= 1
                        v = jnp.zeros((m, ntL))
                        t = Epp[:, idx[la + 1][tuple(upa)],
                                idx[lb + 1][tuple(upb)]]
                        v = v.at[..., :t.shape[-1]].add(4.0 * af * bf * t)
                        if cb[e] >= 1:
                            t = Epm[:, idx[la + 1][tuple(upa)],
                                    idx[lb - 1][tuple(dnb)]]
                            v = v.at[..., :t.shape[-1]].add(
                                -2.0 * cb[e] * af * t)
                        if ca[d] >= 1:
                            t = Emp[:, idx[la - 1][tuple(dna)],
                                    idx[lb + 1][tuple(upb)]]
                            v = v.at[..., :t.shape[-1]].add(
                                -2.0 * ca[d] * bf * t)
                        if ca[d] >= 1 and cb[e] >= 1:
                            t = Emm[:, idx[la - 1][tuple(dna)],
                                    idx[lb - 1][tuple(dnb)]]
                            v = v.at[..., :t.shape[-1]].add(
                                float(ca[d] * cb[e]) * t)
                        row.append(v)
                    cols.append(jnp.stack(row, axis=1))   # (m, ncb, ntL)
                blocks.append(jnp.stack(cols, axis=1))    # (m, nca, ncb, ntL)
        E = jnp.stack(blocks, axis=1)                     # (m, 9, nca, ncb, .)
        E = np.asarray(E.reshape(m, 9 * nca * ncb, ntL))
        p, P = np.asarray(p), np.asarray(P)

        self.la, self.lb = la, lb
        self.ga, self.gb = ga, gb
        self.m = m
        self.nc = E.shape[1]
        self.nt = ntL
        self.L = la + lb + 2
        nchunk = -(-m // chunk)
        pad = nchunk * chunk - m
        self.nchunk = nchunk
        self.chunk = chunk
        self.p = np.pad(p, (0, pad), constant_values=1.0).reshape(
            nchunk, chunk)
        self.P = np.pad(P, ((0, pad), (0, 0))).reshape(nchunk, chunk, 3)
        self.E = np.pad(E, ((0, pad), (0, 0), (0, 0))).reshape(
            nchunk, chunk, self.nc, ntL)

    @property
    def KK(self):
        return self.ga.nprim * self.gb.nprim

    def device_chunks(self):
        if not hasattr(self, '_dev'):
            self._dev = [(jnp.asarray(self.p[i]), jnp.asarray(self.P[i]),
                          jnp.asarray(self.E[i]))
                         for i in range(self.nchunk)]
        return self._dev


def _block2(pc1, pc2):
    """Generic class-pair block for any mix of (Deriv2)PairClass objects:
    -> numpy (nsa, nsb, nc1, nsc, nsd, nc2), primitives contracted."""
    L2 = getattr(pc2, 'L', pc2.la + pc2.lb)
    L1 = getattr(pc1, 'L', pc1.la + pc1.lb)
    acc = None
    for i in range(pc1.nchunk):
        row = []
        for j in range(pc2.nchunk):
            blk = _eri_chunk(L1, L2, pc1.nt, pc2.nt,
                             *pc1.device_chunks()[i], *pc2.device_chunks()[j])
            row.append(np.asarray(blk))
        row = np.concatenate(row, axis=2) if len(row) > 1 else row[0]
        acc = row if acc is None else np.concatenate([acc, row], axis=0)
    out = acc[:pc1.m, :, :pc2.m, :]
    out = out.reshape(pc1.ga.nshl, pc1.gb.nshl, pc1.KK, pc1.nc,
                      pc2.ga.nshl, pc2.gb.nshl, pc2.KK, pc2.nc)
    return out.sum(axis=(2, 6))


def _ao_ids(pc):
    ia = (pc.ga.ao_off[:, None] + np.arange(2 * pc.la + 1)).ravel()
    jb = (pc.gb.ao_off[:, None] + np.arange(2 * pc.lb + 1)).ravel()
    return ia, jb


@on_integral_device
def int2e_ssll(mol):
    """(3, 3, nao, nao, nao, nao): (d_d mu d_e nu | ka la)."""
    nao = mol.nao
    out = np.zeros((3, 3, nao, nao, nao, nao))
    ls = sorted(mol.shell_groups.keys())
    kets = {(lc, ld): PairClass(mol, lc, ld) for lc in ls for ld in ls}
    for la in ls:
        for lb in ls:
            dpc = Deriv2PairClass(mol, la, lb)
            nca, ncb = len(cart_components(la)), len(cart_components(lb))
            ia, jb = _ao_ids(dpc)
            for (lc, ld), pc2 in kets.items():
                ncc, ncd = (len(cart_components(lc)),
                            len(cart_components(ld)))
                blk = _block2(dpc, pc2)
                nsa, nsb = dpc.ga.nshl, dpc.gb.nshl
                nsc, nsd = pc2.ga.nshl, pc2.gb.nshl
                blk = blk.reshape(nsa, nsb, 3, 3, nca, ncb,
                                  nsc, nsd, ncc, ncd)
                blk = np.einsum('mp,nq,abxypqcdrs,kr,ls->xyambnckdl',
                                _sph(la), _sph(lb), blk, _sph(lc), _sph(ld),
                                optimize=True)
                kc, ld_ = _ao_ids(pc2)
                out[np.ix_(np.arange(3), np.arange(3), ia, jb, kc, ld_)] = \
                    blk.reshape(3, 3, ia.size, jb.size, kc.size, ld_.size)
    return out


@on_integral_device
def int2e_ssss(mol):
    """(3,3,3,3, nao, nao, nao, nao): (d_d mu d_e nu | d_f ka d_g la)."""
    nao = mol.nao
    out = np.zeros((3, 3, 3, 3, nao, nao, nao, nao))
    ls = sorted(mol.shell_groups.keys())
    pcs = {(l1, l2): Deriv2PairClass(mol, l1, l2) for l1 in ls for l2 in ls}
    for (la, lb), pc1 in pcs.items():
        nca, ncb = len(cart_components(la)), len(cart_components(lb))
        ia, jb = _ao_ids(pc1)
        for (lc, ld), pc2 in pcs.items():
            ncc, ncd = len(cart_components(lc)), len(cart_components(ld))
            blk = _block2(pc1, pc2)
            nsa, nsb = pc1.ga.nshl, pc1.gb.nshl
            nsc, nsd = pc2.ga.nshl, pc2.gb.nshl
            blk = blk.reshape(nsa, nsb, 3, 3, nca, ncb,
                              nsc, nsd, 3, 3, ncc, ncd)
            blk = np.einsum('mp,nq,abxypqcdwzrs,kr,ls->xywzambnckdl',
                            _sph(la), _sph(lb), blk, _sph(lc), _sph(ld),
                            optimize=True)
            kc, ld_ = _ao_ids(pc2)
            out[np.ix_(np.arange(3), np.arange(3), np.arange(3),
                       np.arange(3), ia, jb, kc, ld_)] = \
                blk.reshape(3, 3, 3, 3, ia.size, jb.size, kc.size, ld_.size)
    return out
