"""Molecule/system description and AO-basis layout for the TPU integral engine.

TPU-native analog of the reference's pyscf/gto/mole.py (Mole: mole.py:3747,
build: mole.py:2476). Instead of libcint's flat _atm/_bas/_env tables
(mole.py:1031 make_env), shells are grouped per angular momentum into
padded SoA batches (exponents/coefficients/centers) that feed the batched
McMurchie-Davidson kernels in pyscf_tpu/ops/integrals — regular static
shapes for XLA, padding with zero-coefficient primitives.
"""
import math

import numpy as np

from ..data import elements
from ..lib import parameters as param
from . import basis as basis_mod


def gto_norm(l, expnt):
    """Radial normalization of a primitive r^l exp(-a r^2) Gaussian."""
    # 1/sqrt(int r^(2l+2) exp(-2a r^2) dr) = sqrt(2 (2a)^(l+1.5) / Gamma(l+1.5))
    return math.sqrt(2.0 * (2.0 * expnt) ** (l + 1.5) / math.gamma(l + 1.5))


class Shell:
    """One segmented contracted shell."""
    __slots__ = ('atom_id', 'l', 'exps', 'coeffs')

    def __init__(self, atom_id, l, exps, coeffs):
        self.atom_id = atom_id
        self.l = l
        self.exps = np.asarray(exps, dtype=np.float64)
        self.coeffs = np.asarray(coeffs, dtype=np.float64)


class ShellGroup:
    """All shells of one angular momentum, padded to a common nprim.

    Fields (numpy, converted to device arrays by the integral drivers):
      l          : angular momentum
      coords     : (ns, 3) shell centers (Bohr)
      exps       : (ns, K) exponents (padded with 1.0)
      coeffs     : (ns, K) normalized contraction coefficients (padded 0.0)
      ao_off     : (ns,) offset of first (spherical) AO of each shell
      atom_ids   : (ns,)
      shell_ids  : (ns,) index into mol's flat shell list
    """

    def __init__(self, l, shells, coords_of_atom, ao_offsets, shell_ids):
        self.l = l
        ns = len(shells)
        K = max(len(sh.exps) for sh in shells)
        self.nshl = ns
        self.nprim = K
        self.exps = np.ones((ns, K))
        self.coeffs = np.zeros((ns, K))
        self.coords = np.zeros((ns, 3))
        self.atom_ids = np.zeros(ns, dtype=np.int32)
        for i, sh in enumerate(shells):
            k = len(sh.exps)
            self.exps[i, :k] = sh.exps
            self.coeffs[i, :k] = sh.coeffs
            self.coords[i] = coords_of_atom[sh.atom_id]
            self.atom_ids[i] = sh.atom_id
        self.ao_off = np.asarray(ao_offsets, dtype=np.int32)
        self.shell_ids = np.asarray(shell_ids, dtype=np.int32)


def ghost_element(sym):
    """Underlying element symbol of a ghost-atom label, or None.

    'GHOST-O'/'ghost_O'/'ghostO'/'X-O' -> 'O'; bare 'X'/'GHOST'/'X2' ->
    '' (ghost with no implied element: basis must be given explicitly).
    Non-ghost labels -> None. Mirrors the reference's dummy-atom
    conventions (gto/mole.py is_ghost_atom / _charge)."""
    import re
    s = str(sym)
    u = s.upper()
    if u.startswith('GHOST'):
        m = re.match(r'([A-Za-z]+)', s[5:].lstrip('-_:'))
        return m.group(1).capitalize() if m else ''
    if u.startswith('X-'):
        m = re.match(r'([A-Za-z]+)', s[2:])
        return m.group(1).capitalize() if m else ''
    if re.match(r'X\d*$', u):
        return ''
    return None


def _zmat_to_cart(lines):
    """Internal (z-matrix) lines -> cartesian coords (input length unit).

    Each line: SYM [a r [b theta [c phi]]] with 1-based atom refs, theta/
    phi in degrees. Orientation conventions are this module's own (total
    energies are rotation invariant); reference analog gto/mole.py
    from_zmatrix."""
    coords = []
    for ln, toks in enumerate(lines):
        vals = toks[1:]
        if len(vals) == 0:
            coords.append(np.zeros(3))
            continue
        a = int(vals[0]) - 1
        r = float(vals[1])
        A = coords[a]
        if len(vals) == 2:
            coords.append(A + np.array([r, 0.0, 0.0]))
            continue
        b = int(vals[2]) - 1
        theta = float(vals[3]) * np.pi / 180.0
        B = coords[b]
        e1 = B - A
        e1 = e1 / np.linalg.norm(e1)
        if len(vals) == 4:
            # first out-of-line atom: any plane through A-B works
            trial = np.array([0.0, 0.0, 1.0])
            if abs(e1 @ trial) > 0.9:
                trial = np.array([0.0, 1.0, 0.0])
            n = np.cross(e1, trial)
            n = n / np.linalg.norm(n)
            m = np.cross(n, e1)
            coords.append(A + r * (np.cos(theta) * e1 + np.sin(theta) * m))
            continue
        c = int(vals[4]) - 1
        phi = float(vals[5]) * np.pi / 180.0
        C = coords[c]
        n = np.cross(e1, C - B)
        nn = np.linalg.norm(n)
        if nn < 1e-10:           # A,B,C collinear: plane is arbitrary
            trial = np.array([0.0, 0.0, 1.0])
            if abs(e1 @ trial) > 0.9:
                trial = np.array([0.0, 1.0, 0.0])
            n = np.cross(e1, trial)
            nn = np.linalg.norm(n)
        n = n / nn
        m = np.cross(n, e1)
        d = (np.cos(theta) * e1
             + np.sin(theta) * (np.cos(phi) * m + np.sin(phi) * n))
        coords.append(A + r * d)
    return np.array(coords, dtype=np.float64)


def _is_int(tok):
    try:
        int(tok)
        return True
    except ValueError:
        return False


def format_atom(atom, unit='angstrom'):
    """Parse atom input -> (symbols, raw_symbols, coords[natm,3] in Bohr).

    Accepts 'O 0 0 0; H 0 1 0', z-matrix strings ('O; H 1 0.96;
    H 1 0.96 2 104.5'), list [('O', (x,y,z)), ...] or
    [[charge, (x,y,z)], ...]. Ghost atoms: 'ghost-O' / 'X-O' carry O's
    basis with zero nuclear charge. Mirrors reference gto/mole.py:322
    format_atom (+ from_zmatrix:4007)."""
    if isinstance(atom, str):
        lines = []
        for seg in atom.replace('\n', ';').split(';'):
            seg = seg.strip()
            if seg and not seg.startswith('#'):
                lines.append(seg.replace(',', ' ').split())
        is_zmat = (len(lines) > 1 and len(lines[0]) == 1
                   and len(lines[1]) == 3 and _is_int(lines[1][1]))
        if is_zmat:
            coords = _zmat_to_cart(lines)
            entries = [(toks[0], xyz) for toks, xyz in zip(lines, coords)]
        else:
            entries = [(toks[0], [float(x) for x in toks[1:4]])
                       for toks in lines]
    else:
        entries = []
        for item in atom:
            sym, coord = item[0], item[1]
            if not isinstance(coord, (list, tuple, np.ndarray)):
                coord = item[1:4]
            entries.append((sym, [float(x) for x in coord]))
    symbols = []
    for s, _ in entries:
        g = ghost_element(s)
        symbols.append(g if g is not None else elements.std_symbol(s))
    raw_symbols = [str(s) for s, _ in entries]
    coords = np.array([c for _, c in entries], dtype=np.float64)
    if isinstance(unit, str):
        if unit.lower().startswith(('a', 'ang')):
            coords = coords / param.BOHR
        # bohr/au: no conversion
    else:
        coords = coords * unit
    return symbols, raw_symbols, coords


class Mole:
    """Molecular system: geometry, basis, electron counts, AO layout.

    Usage mirrors the reference (pyscf.M / gto.M, mole.py:108):
        mol = Mole(atom='O 0 0 0; H 0 1 0; H 0 0 1', basis='sto-3g').build()
    """

    def __init__(self, atom=None, basis='sto-3g', unit='angstrom',
                 charge=0, spin=0, verbose=3, max_memory=param.MAX_MEMORY,
                 cart=False, symmetry=False, nucmod=None, output=None,
                 ecp=None):
        self.atom = atom
        self.basis = basis
        self.ecp = ecp
        self.unit = unit
        self.charge = charge
        self.spin = spin            # 2S = nalpha - nbeta
        self.verbose = verbose
        self.max_memory = max_memory
        self.cart = cart
        self.symmetry = symmetry
        self._built = False

    _CACHE_ATTRS = ('_intor_cache', '_scf_prog_cache', '_aod_prog_cache',
                    '_grad_prog_cache', '_int_pair_cache', '_df_cache',
                    '_j3c_cache')

    def _drop_caches(self):
        for a in self._CACHE_ATTRS:
            if hasattr(self, a):
                delattr(self, a)

    def build(self, **kwargs):
        self._drop_caches()   # compiled programs bake in shell geometry
        for k, v in kwargs.items():
            setattr(self, k, v)
        self.elements_, self.raw_symbols, self.coords = format_atom(
            self.atom, self.unit)
        self.charges = np.array([elements.charge(s) for s in self.raw_symbols],
                                dtype=np.int32)
        self.natm = len(self.elements_)

        # effective core potentials (reference: Mole.ecp, gto/mole.py
        # make_ecp_env:1109). self.charges become EFFECTIVE charges
        # (Z - nelec_core), used by both energy_nuc and int1e_nuc, matching
        # the reference's convention (mole.atom_charge with ECP).
        self._ecp = {}
        if self.ecp:
            ecp_of = {}
            if isinstance(self.ecp, dict):
                for k, v in self.ecp.items():
                    ecp_of[k.capitalize()] = v
            for ia, sym in enumerate(self.elements_):
                name = (ecp_of.get(sym) if isinstance(self.ecp, dict)
                        else self.ecp)
                if name is None:
                    continue
                if isinstance(name, str):
                    entry = basis_mod.load_ecp(name, sym)
                else:
                    entry = name   # raw [nelec, pots] data
                if entry is None:
                    continue
                self._ecp[ia] = entry
                self.charges[ia] -= entry[0]

        # per-element basis resolution (raw symbol wins in dict lookups so
        # ghost labels can carry their own basis, reference format_basis)
        if isinstance(self.basis, dict):
            def elem_basis(sym, rawsym):
                b = self.basis.get(rawsym,
                                   self.basis.get(sym,
                                                  self.basis.get('default')))
                if isinstance(b, str):
                    if not sym:
                        raise ValueError(
                            f'ghost atom {rawsym!r}: a named basis needs '
                            'an element (use ghost-<El>, or give raw '
                            'basis data for this label)')
                    return basis_mod.load(b, sym)
                return b
        else:
            def elem_basis(sym, rawsym):
                if isinstance(self.basis, str):
                    if not sym:
                        raise ValueError(
                            f'ghost atom {rawsym!r}: a named basis needs '
                            'an element (use ghost-<El>, or a basis dict '
                            'keyed by this label)')
                    return basis_mod.load(self.basis, sym)
                return self.basis

        # expand into segmented normalized shells
        shells = []
        for ia, sym in enumerate(self.elements_):
            for raw in elem_basis(sym, self.raw_symbols[ia]):
                l = raw[0]
                prims = np.array(raw[1:], dtype=np.float64)
                exps = prims[:, 0]
                for col in range(1, prims.shape[1]):
                    cs = prims[:, col]
                    mask = cs != 0.0
                    if not mask.any():
                        continue
                    e, c = exps[mask], cs[mask]
                    # overlap matrix of radially-normalized primitives
                    ee = e[:, None] + e[None, :]
                    ss = (2.0 * np.sqrt(np.outer(e, e)) / ee) ** (l + 1.5)
                    # c are coefficients of normalized primitives; rescale so
                    # the contracted radial function is normalized, then fold
                    # in the primitive norms for the raw-monomial engine.
                    norm = (c @ ss @ c) ** -0.5
                    cfold = c * norm * np.array([gto_norm(l, ei) for ei in e])
                    shells.append(Shell(ia, l, e, cfold))
        self._shells = shells
        self.nbas = len(shells)

        # AO layout (spherical), shell order as given
        ao_loc = [0]
        for sh in shells:
            ao_loc.append(ao_loc[-1] + (2 * sh.l + 1))
        self.ao_loc = np.asarray(ao_loc, dtype=np.int32)
        self.nao = int(ao_loc[-1])

        # group shells by l
        self.lmax = max((sh.l for sh in shells), default=0)
        self.shell_groups = {}
        for l in range(self.lmax + 1):
            idx = [i for i, sh in enumerate(shells) if sh.l == l]
            if not idx:
                continue
            self.shell_groups[l] = ShellGroup(
                l, [shells[i] for i in idx], self.coords,
                [self.ao_loc[i] for i in idx], idx)

        # point-group detection (reference Mole.build symmetry branch,
        # gto/mole.py:2476 -> symm.detect_symm)
        self.topgroup = None
        self.groupname = None
        if self.symmetry:
            from .. import symm as symm_mod
            self.topgroup, _, _ = symm_mod.detect_symm(self)
            self.groupname = symm_mod.largest_abelian_subgroup(self)[0]

        self._built = True
        return self

    # ------------------------------------------------------------------
    @property
    def has_ecp(self):
        return bool(getattr(self, '_ecp', None))

    def ecp_by_atom(self):
        """{atom_index: [nelec_core, [[l, [[rpow, exp, c], ...]], ...]]}"""
        return getattr(self, '_ecp', {})

    def atom_nelec_core(self, ia):
        e = getattr(self, '_ecp', {}).get(ia)
        return e[0] if e else 0

    @property
    def nelectron(self):
        return int(self.charges.sum()) - self.charge

    @property
    def nelec(self):
        ne = self.nelectron
        nb = (ne - self.spin) // 2
        na = ne - nb
        if na - nb != self.spin:
            raise RuntimeError(
                f'electron number {ne} and spin {self.spin} inconsistent')
        return na, nb

    @property
    def multiplicity(self):
        return self.spin + 1

    def atom_coords(self, unit='Bohr'):
        if unit.lower().startswith('a'):
            return self.coords * param.BOHR
        return self.coords

    def atom_charges(self):
        return self.charges

    def atom_symbol(self, ia):
        return self.elements_[ia]

    def atom_charge(self, ia):
        return int(self.charges[ia])

    def energy_nuc(self):
        z = self.charges.astype(np.float64)
        r = self.coords
        d = np.linalg.norm(r[:, None, :] - r[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return 0.5 * float((z[:, None] * z[None, :] / d).sum())

    # ------------------------------------------------------------------
    def intor(self, name, **kwargs):
        """Integral dispatcher (analog of reference mole.py:3482 intor).

        Results are geometry-fixed; parameterless calls are cached on the
        molecule (cleared by copy/set_geom_)."""
        from ..ops.integrals import driver
        if kwargs:
            return driver.intor(self, name, **kwargs)
        cache = getattr(self, '_intor_cache', None)
        if cache is None:
            cache = self._intor_cache = {}
        if name not in cache:
            cache[name] = driver.intor(self, name)
        return cache[name]

    def intor_symmetric(self, name, **kwargs):
        return self.intor(name, **kwargs)

    def eval_gto(self, name, coords, **kwargs):
        from ..ops import eval_gto
        return eval_gto.eval_gto(self, name, coords, **kwargs)

    # ------------------------------------------------------------------
    def copy(self):
        import copy as _copy
        caches = {a: self.__dict__.pop(a) for a in self._CACHE_ATTRS
                  if a in self.__dict__}
        try:
            new = _copy.deepcopy(self)
        finally:
            self.__dict__.update(caches)
        return new

    def set_geom_(self, coords_bohr):
        """Update geometry in Bohr (same atom order), rebuild shell tables."""
        coords = np.asarray(coords_bohr, dtype=np.float64).reshape(-1, 3)
        self.atom = list(zip(self.raw_symbols, coords))
        unit_save, self.unit = self.unit, 'bohr'
        self.build()
        self.unit = unit_save
        return self

    def tostring(self):
        lines = [f'{s} {x:.10f} {y:.10f} {z:.10f}'
                 for s, (x, y, z) in zip(self.raw_symbols,
                                         self.coords * param.BOHR)]
        return '\n'.join(lines)

    # convenience constructors, mirroring mol.RHF() etc.
    def RHF(self, **kwargs):
        from ..scf import RHF
        return RHF(self, **kwargs)

    def UHF(self, **kwargs):
        from ..scf import UHF
        return UHF(self, **kwargs)

    def ROHF(self, **kwargs):
        from ..scf import ROHF
        return ROHF(self, **kwargs)

    def HF(self, **kwargs):
        from ..scf import HF
        return HF(self, **kwargs)

    def RKS(self, xc='lda,vwn', **kwargs):
        from ..dft import RKS
        return RKS(self, xc=xc, **kwargs)

    def UKS(self, xc='lda,vwn', **kwargs):
        from ..dft import UKS
        return UKS(self, xc=xc, **kwargs)

    def ROKS(self, xc='lda,vwn', **kwargs):
        from ..dft import ROKS
        return ROKS(self, xc=xc, **kwargs)

    def GKS(self, xc='lda,vwn', **kwargs):
        from ..dft import GKS
        return GKS(self, xc=xc, **kwargs)

    def KS(self, xc='lda,vwn', **kwargs):
        from ..dft import KS
        return KS(self, xc=xc, **kwargs)


def M(**kwargs):
    """Shortcut constructor, mirrors pyscf.M (reference gto/mole.py:108)."""
    return Mole(**kwargs).build()
