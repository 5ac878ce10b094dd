"""Spherically-averaged atomic RHF (analog of reference pyscf/scf/atom_hf.py
get_atm_nrhf / AtomSphAverageRHF).

Solves each element's ground-state restricted SCF with fractional,
spherically-averaged occupations: per angular momentum l the radial
problem is identical for every m, so the generalized eigenproblem is
solved once per l on the m-averaged Fock block and the density spreads
each shell's electrons evenly over its 2l+1 components.  Dense host
numpy — atoms are tiny; this feeds the 'atom'/'huckel' initial guesses,
not the hot path.
"""
import numpy as np

from ..data import elements
from ..gto.mole import Mole


def _l_occupations(conf, l, nrad):
    """Occupation per radial orbital of channel l (ascending energy)."""
    nele = float(conf[l]) if l < len(conf) else 0.0
    cap = 2.0 * (2 * l + 1)
    occ = np.zeros(nrad)
    for k in range(nrad):
        take = min(cap, nele)
        occ[k] = take
        nele -= take
        if nele <= 0:
            break
    return occ


def atom_sph_rhf(symb, basis, charge=0, max_cycle=100, conv_tol=1e-10,
                 ecp=None):
    """Spherically-averaged atomic RHF.

    Returns (e_tot, mo_energy, mo_coeff, mo_occ) with orbitals over the
    atom's full spherical-AO basis, shells expanded over m; mo_occ holds
    the per-orbital fractional occupations (summing to nelectron).
    """
    mol = Mole(atom=[(symb, (0.0, 0.0, 0.0))], basis=basis,
               unit='bohr', verbose=0, charge=charge, ecp=ecp).build()
    nao = mol.nao
    conf = list(elements.CONFIGURATION[elements.charge(symb)])
    # remove ECP core electrons from the configuration, innermost first
    ncore = mol.atom_nelec_core(0) if mol.has_ecp else 0
    if ncore:
        left = ncore
        # peel full shells innermost-first: 1s 2s2p 3s3p 3d 4s4p 4d 4f ...
        shells_seq = [(0, 2), (0, 2), (1, 6), (0, 2), (1, 6), (2, 10),
                      (0, 2), (1, 6), (2, 10), (3, 14), (0, 2), (1, 6)]
        for l, cap in shells_seq:
            if left <= 0:
                break
            take = min(cap, left, conf[l])
            conf[l] -= take
            left -= take

    s = np.asarray(mol.intor('int1e_ovlp'), dtype=np.float64)
    h = np.asarray(mol.intor('int1e_kin'), dtype=np.float64) \
        + np.asarray(mol.intor('int1e_nuc'), dtype=np.float64)
    eri = np.asarray(mol.intor('int2e'), dtype=np.float64)

    # shell bookkeeping per l: list of (shell ao offset) per channel
    chans = {}
    for sh, off in zip(mol._shells, mol.ao_loc[:-1]):
        chans.setdefault(sh.l, []).append(int(off))

    def fock(dm):
        vj = np.einsum('ijkl,lk->ij', eri, dm)
        vk = np.einsum('ikjl,lk->ij', eri, dm)
        return h + vj - 0.5 * vk

    # initial guess: core Hamiltonian
    dm = np.zeros((nao, nao))
    f = h
    e_prev = 0.0
    results = None
    for cycle in range(max_cycle):
        dm_new = np.zeros((nao, nao))
        e_orbs, c_orbs, occs = [], [], []
        for l, offs in sorted(chans.items()):
            nrad = len(offs)
            # m-averaged radial blocks
            fl = np.zeros((nrad, nrad))
            sl = np.zeros((nrad, nrad))
            for m in range(2 * l + 1):
                idx = np.asarray(offs) + m
                fl += f[np.ix_(idx, idx)]
                sl += s[np.ix_(idx, idx)]
            fl /= (2 * l + 1)
            sl /= (2 * l + 1)
            # generalized eig via canonical orthogonalization
            w, v = np.linalg.eigh(sl)
            keep = w > 1e-12
            x = v[:, keep] / np.sqrt(w[keep])[None, :]
            ev, u = np.linalg.eigh(x.T @ fl @ x)
            cl = x @ u                                # (nrad, nkept)
            occ_l = _l_occupations(conf, l, cl.shape[1])
            for k in range(cl.shape[1]):
                fr = occ_l[k] / (2 * l + 1)
                for m in range(2 * l + 1):
                    idx = np.asarray(offs) + m
                    dm_new[np.ix_(idx, idx)] += fr * np.outer(cl[:, k],
                                                              cl[:, k])
                    cfull = np.zeros(nao)
                    cfull[idx] = cl[:, k]
                    e_orbs.append(ev[k])
                    c_orbs.append(cfull)
                    occs.append(fr)
        dm = 0.5 * (dm + dm_new) if cycle else dm_new
        f = fock(dm)
        e_elec = float(np.einsum('ij,ji->', 0.5 * (h + f), dm))
        order = np.argsort(e_orbs)
        results = (e_elec,
                   np.asarray(e_orbs)[order],
                   np.asarray(c_orbs).T[:, order],
                   np.asarray(occs)[order])
        if abs(e_elec - e_prev) < conv_tol and cycle > 1:
            break
        e_prev = e_elec
    return results


def get_atm_nrhf(mol):
    """Atomic SCF for every distinct element of mol (reference
    scf/atom_hf.py:27).  Returns {symb: (e_hf, e, c, occ)}."""
    out = {}
    for ia in range(mol.natm):
        symb = mol.raw_symbols[ia]
        if symb in out:
            continue
        basis = mol.basis
        if isinstance(basis, dict):
            basis = basis.get(symb, basis.get('default'))
        ecp = mol.ecp
        if isinstance(ecp, dict):
            ecp = ecp.get(symb)
        out[symb] = atom_sph_rhf(symb, basis, ecp=ecp)
    return out
