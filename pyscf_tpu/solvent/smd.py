"""SMD universal solvation model.

Reference analog: pyscf/solvent/smd.py (+ smd_experiment.py's pure
formulation of the CDS term; the reference's production path calls the
Fortran mnsol library). SMD = IEF-PCM electrostatics with SMD intrinsic
Coulomb radii + the cavity-dispersion-solvent-structure (CDS) term

  G_CDS = sum_k sigma_k(geometry, descriptors) SASA_k
          + sigma^M(descriptors) SASA_total

with the published atomic/bond surface tensions and COT switching
functions (Marenich, Cramer, Truhlar, JPC B 113, 6378 (2009) — public
parameterization). SASA uses the solvent-accessible surface (vdW radii
+ 0.4 A probe).
"""
import numpy as np

from ..lib.parameters import BOHR
from .pcm import PCM, VDW_RADII, gen_surface

HARTREE2KCAL = 627.509451

# solvent descriptor DB (mnsddb): name -> (n, alpha, beta, gamma, eps,
# phi, psi). A practical subset; arbitrary solvents via descriptors=.
SOLVENTS = {
    'water': (1.3328, 0.82, 0.35, 71.99, 78.355, 0.0, 0.0),
    'methanol': (1.3288, 0.43, 0.47, 22.07, 32.613, 0.0, 0.0),
    'ethanol': (1.3611, 0.37, 0.48, 21.97, 24.852, 0.0, 0.0),
    'acetonitrile': (1.3442, 0.07, 0.32, 28.66, 35.688, 0.0, 0.0),
    'dmso': (1.4793, 0.0, 0.88, 42.92, 46.826, 0.0, 0.0),
    'acetone': (1.3588, 0.04, 0.49, 23.46, 20.493, 0.0, 0.0),
    'dichloromethane': (1.4242, 0.1, 0.05, 27.2, 8.93, 0.0, 0.75),
    'chloroform': (1.4459, 0.15, 0.02, 26.67, 4.7113, 0.0, 0.75),
    'benzene': (1.5011, 0.0, 0.14, 40.62, 2.2706, 1.0, 0.0),
    'toluene': (1.4961, 0.0, 0.14, 40.2, 2.3741, 0.857, 0.0),
    'thf': (1.405, 0.0, 0.48, 39.44, 7.4257, 0.0, 0.0),
    'n-hexane': (1.3749, 0.0, 0.0, 17.89, 1.8819, 0.0, 0.0),
}

# SMD intrinsic Coulomb radii (Angstrom); others fall back to Bondi vdW
SMD_RADII = {1: 1.20, 6: 1.85, 7: 1.89, 8: 1.52, 9: 1.73, 14: 2.47,
             15: 2.12, 16: 2.49, 17: 2.38, 35: 3.06, 53: 2.74}

# atomic/bond surface tensions, cal/(mol A^2) (Marenich 2009 Tables 3-4)
SIGMA_WATER = {'H': 48.69, 'C': 129.74, ('H', 'C'): -60.77,
               ('C', 'C'): -72.95, ('O', 'C'): 68.69, ('N', 'C'): -48.22,
               ('N', 'C3'): 84.10, ('O', 'N'): 121.98, 'F': 38.18,
               'Cl': 9.82, 'Br': -8.72, 'S': -9.10, ('O', 'P'): 68.85}
SIGMA_N = {'C': 58.10, ('H', 'C'): -36.37, ('C', 'C'): -62.05,
           'O': -17.56, ('H', 'O'): -19.39, ('O', 'C'): -15.70,
           'N': 32.62, ('C', 'N'): -99.76, 'Cl': -24.31, 'Br': -35.42,
           'S': -33.17, 'Si': -18.04}
SIGMA_ALPHA = {'C': 48.10, 'O': 193.06, ('O', 'C'): 95.99,
               ('C', 'N'): 152.20, ('N', 'C'): -41.00}
SIGMA_BETA = {'C': 32.87, 'O': -43.79, ('O', 'O'): -128.16,
              ('O', 'N'): 79.13}
SIGMA_GAMMA, SIGMA_PHI2, SIGMA_PSI2, SIGMA_BETA2, GAMMA0 = \
    0.35, -4.19, -6.68, 0.0, 1.0

# COT switching (r_ZZ', dr) in Angstrom
R_ZZ = {('H', 'C'): (1.55, 0.3), ('H', 'O'): (1.55, 0.3),
        ('C', 'C'): (1.84, 0.3), ('C', 'N'): (1.84, 0.3),
        ('C', 'O'): (1.84, 0.3), ('C', 'F'): (1.84, 0.3),
        ('C', 'P'): (2.2, 0.3), ('C', 'S'): (2.2, 0.3),
        ('C', 'Cl'): (2.1, 0.3), ('C', 'Br'): (2.3, 0.3),
        ('C', 'I'): (2.6, 0.3), ('N', 'C'): (1.84, 0.3),
        ('N', 'C3'): (1.225, 0.065), ('O', 'C'): (1.33, 0.1),
        ('O', 'N'): (1.5, 0.3), ('O', 'O'): (1.8, 0.3),
        ('O', 'P'): (2.1, 0.3)}


def _switch(R, pair):
    r, dr = R_ZZ.get(pair, (0.0, 0.0))
    if dr == 0.0 or R >= r + dr:
        return 0.0
    return float(np.exp(dr / (R - dr - r)))


def atomic_tensions(symbols, coords_ang, n, alpha, beta, water):
    """Per-atom surface tensions sigma_k, cal/(mol A^2)."""
    def sig(key):
        if water:
            return SIGMA_WATER.get(key, 0.0)
        return (SIGMA_N.get(key, 0.0) * n + SIGMA_ALPHA.get(key, 0.0)
                * alpha + SIGMA_BETA.get(key, 0.0) * beta)

    natm = len(symbols)
    rij = np.linalg.norm(coords_ang[:, None] - coords_ang[None, :], axis=2)
    out = np.zeros(natm)
    for i, si in enumerate(symbols):
        if si not in ('H', 'C', 'N', 'O', 'F', 'Si', 'S', 'Cl', 'Br'):
            continue
        t = sig(si)
        if si == 'H':
            thc = sum(_switch(rij[i, j], ('H', 'C'))
                      for j, sj in enumerate(symbols) if sj == 'C')
            tho = sum(_switch(rij[i, j], ('H', 'O'))
                      for j, sj in enumerate(symbols) if sj == 'O')
            t += sig(('H', 'C')) * thc + sig(('H', 'O')) * tho
        elif si == 'C':
            tcc = sum(_switch(rij[i, j], ('C', 'C'))
                      for j, sj in enumerate(symbols)
                      if sj == 'C' and j != i)
            tcn = sum(_switch(rij[i, j], ('C', 'N'))
                      for j, sj in enumerate(symbols) if sj == 'N')
            t += sig(('C', 'C')) * tcc + sig(('C', 'N')) * tcn ** 2
        elif si == 'N':
            tnc = 0.0
            tnc3 = 0.0
            for j, sj in enumerate(symbols):
                if sj != 'C':
                    continue
                tk = sum(_switch(rij[j, k], ('C', sk))
                         for k, sk in enumerate(symbols)
                         if k not in (i, j))
                tnc += _switch(rij[i, j], ('N', 'C')) * tk ** 2
                tnc3 += _switch(rij[i, j], ('N', 'C3'))
            t += sig(('N', 'C')) * tnc ** 1.3 + sig(('N', 'C3')) * tnc3
        elif si == 'O':
            for other, key in (('C', ('O', 'C')), ('N', ('O', 'N')),
                               ('O', ('O', 'O')), ('P', ('O', 'P'))):
                ts = sum(_switch(rij[i, j], key)
                         for j, sj in enumerate(symbols)
                         if sj == other and j != i)
                t += sig(key) * ts
        out[i] = t
    return out


def sasa(mol, probe=0.4, n_ang=110):
    """Per-atom solvent-accessible surface areas, Angstrom^2."""
    radii_table = {z: VDW_RADII.get(z, 1.5) + probe
                   for z in set(int(c) for c in mol.charges)}
    pts, area, atom_ids = _surface_with_radii(mol, radii_table, n_ang)
    natm = mol.natm
    out = np.zeros(natm)
    for ia in range(natm):
        out[ia] = area[atom_ids == ia].sum() * BOHR ** 2
    return out


def _surface_with_radii(mol, radii_table_ang, n_ang):
    from ..dft.lebedev import lebedev_grid
    radii = np.array([radii_table_ang[int(z)] / BOHR
                      for z in mol.charges])
    leb_pts, leb_w = lebedev_grid(n_ang)
    pts_all, area_all, atom_all = [], [], []
    for ia in range(mol.natm):
        R = radii[ia]
        pts = mol.coords[ia] + R * leb_pts
        area = leb_w * 4.0 * np.pi * R * R
        keep = np.ones(len(pts), dtype=bool)
        for ja in range(mol.natm):
            if ja != ia:
                keep &= np.linalg.norm(pts - mol.coords[ja],
                                       axis=1) > radii[ja]
        pts_all.append(pts[keep])
        area_all.append(area[keep])
        atom_all.append(np.full(keep.sum(), ia))
    return (np.concatenate(pts_all), np.concatenate(area_all),
            np.concatenate(atom_all))


def get_cds(mol, solvent='water', descriptors=None):
    """CDS contribution in Hartree."""
    if descriptors is None:
        descriptors = SOLVENTS[solvent.lower()]
    n, alpha, beta, gamma, eps, phi, psi = descriptors
    water = solvent.lower() == 'water'
    coords_ang = np.asarray(mol.coords) * BOHR
    at = atomic_tensions(list(mol.raw_symbols), coords_ang, n, alpha,
                         beta, water)
    areas = sasa(mol)
    e = float(at @ areas) / 1000.0
    if not water:
        sig_m = (SIGMA_GAMMA * gamma / GAMMA0 + SIGMA_PHI2 * phi ** 2
                 + SIGMA_PSI2 * psi ** 2 + SIGMA_BETA2 * beta ** 2)
        e += sig_m * areas.sum() / 1000.0
    return e / HARTREE2KCAL


class SMD:
    """IEF-PCM(SMD radii) electrostatics + CDS."""

    def __init__(self, mol, solvent='water', descriptors=None, n_ang=110):
        self.mol = mol
        self.solvent = solvent
        self.descriptors = descriptors or SOLVENTS[solvent.lower()]
        eps = self.descriptors[4]
        # PCM cavity with SMD intrinsic Coulomb radii (scale=1)
        import copy
        pcm = PCM.__new__(PCM)
        self._init_pcm(pcm, mol, eps, n_ang)
        self.pcm = pcm
        self.e_cds = get_cds(mol, solvent, descriptors)

    @staticmethod
    def _init_pcm(pcm, mol, eps, n_ang):
        # rebuild PCM with SMD radii: temporarily patch the radii lookup
        radii_table = {int(z): SMD_RADII.get(int(z),
                                             VDW_RADII.get(int(z), 1.5))
                       for z in mol.charges}
        import pyscf_tpu.solvent.pcm as pcm_mod
        orig = pcm_mod.VDW_RADII
        try:
            pcm_mod.VDW_RADII = radii_table
            pcm.__init__(mol, eps=eps, n_ang=n_ang, scale=1.0,
                         method='IEF-PCM')
        finally:
            pcm_mod.VDW_RADII = orig

    def kernel(self, dm):
        """(e_solv_total, vfock): electrostatic + CDS energy."""
        e_el, vfock = self.pcm.kernel(dm)
        return e_el + self.e_cds, vfock


def smd_for_scf(mf, solvent='water', descriptors=None):
    """Attach SMD to a mean-field object (same double-counting
    bookkeeping as pcm_for_scf)."""
    smd = SMD(mf.mol, solvent, descriptors)
    mf.with_solvent = smd
    veff_orig = mf.get_veff
    eelec_orig = mf.energy_elec

    def get_veff(mol=None, dm=None, *args, **kwargs):
        v = veff_orig(mol, dm, *args, **kwargs)
        e_solv, vfock = smd.kernel(dm)
        mf._e_solvent = e_solv
        return v + vfock

    def energy_elec(dm, h1e, vhf):
        e_solv, vfock = smd.kernel(dm)
        e = eelec_orig(dm, h1e, vhf - vfock)
        return e + e_solv

    mf.get_veff = get_veff
    mf.energy_elec = energy_elec
    return mf
