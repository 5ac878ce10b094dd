"""HDF5 checkpoint files (analog of reference pyscf/lib/chkfile.py:
load:28, dump:76, and scf/chkfile.py dump_scf)."""
import numpy as np


def dump(chkfile, key, value):
    """Save a (possibly nested dict of) array(s) under key."""
    import h5py
    with h5py.File(chkfile, 'a') as f:
        if key in f:
            del f[key]
        _write(f, key, value)


save = dump


def _write(group, key, value):
    if isinstance(value, dict):
        g = group.create_group(key)
        for k, v in value.items():
            _write(g, k, v)
    else:
        group[key] = np.asarray(value)


def load(chkfile, key):
    import h5py
    with h5py.File(chkfile, 'r') as f:
        if key not in f:
            return None
        return _read(f[key])


def _read(obj):
    import h5py
    if isinstance(obj, h5py.Group):
        return {k: _read(v) for k, v in obj.items()}
    return np.asarray(obj)


def dump_scf(mol, chkfile, e_tot, mo_energy, mo_coeff, mo_occ):
    """SCF checkpoint (reference scf/chkfile.py:28 dump_scf)."""
    dump(chkfile, 'scf', {
        'e_tot': float(e_tot),
        'mo_energy': np.asarray(mo_energy),
        'mo_coeff': np.asarray(mo_coeff),
        'mo_occ': np.asarray(mo_occ),
    })
    dump(chkfile, 'mol', {
        'coords': np.asarray(mol.coords),
        'charges': np.asarray(mol.charges),
    })


def load_scf(chkfile):
    return load(chkfile, 'scf')
