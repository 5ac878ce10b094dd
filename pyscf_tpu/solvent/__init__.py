"""Implicit solvation (analog of reference pyscf/solvent)."""
from .pcm import PCM, pcm_for_scf, cosmo_for_scf
from .smd import SMD, smd_for_scf, get_cds
from .ddcosmo import DDCOSMO, ddcosmo_for_scf
from .ddpcm import DDPCM, ddpcm_for_scf
