"""QCSchema result export (analog of reference pyscf/tools/qcschema.py)."""
import json
import numpy as np

from ..lib.parameters import BOHR


def to_qcschema_dict(mf, method=None):
    """Minimal QCSchema AtomicResult-style dict for a converged mf."""
    mol = mf.mol
    out = {
        'schema_name': 'qcschema_output',
        'schema_version': 2,
        'molecule': {
            'symbols': list(mol.raw_symbols),
            'geometry': np.asarray(mol.coords).ravel().tolist(),  # Bohr
            'molecular_charge': int(mol.charge),
            'molecular_multiplicity': int(mol.spin) + 1,
        },
        'driver': 'energy',
        'model': {
            'method': method or getattr(mf, 'xc', 'HF'),
            'basis': mol.basis if isinstance(mol.basis, str) else 'custom',
        },
        'properties': {
            'return_energy': float(mf.e_tot),
            'scf_total_energy': float(mf.e_tot),
            'calcinfo_nbasis': int(mol.nao),
            'calcinfo_natom': int(mol.natm),
        },
        'success': bool(mf.converged),
        'return_result': float(mf.e_tot),
        'provenance': {'creator': 'pyscf_tpu'},
    }
    return out


def dump_qcschema(mf, filename, method=None):
    with open(filename, 'w') as f:
        json.dump(to_qcschema_dict(mf, method), f, indent=1)
