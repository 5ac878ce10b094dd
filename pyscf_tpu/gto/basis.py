"""Basis-set loading from the vendored JSON.gz tables.

Analog of the reference's pyscf/gto/basis/__init__.py (load:623, parse:507),
backed by pyscf_tpu/gto/basis_data/*.json.gz (converted public BSE data).
"""
import gzip
import json
import os
from functools import lru_cache

_DATA_DIR = os.path.join(os.path.dirname(__file__), 'basis_data')

# common alternate spellings -> normalized file stem
ALIAS = {
    'weigend': 'def2universaljkfit',
    'weigend+etb': 'def2universaljkfit',
    'def2universaljfit': 'def2universaljfit',
    'sto3g': 'sto3g',
    'minao': 'minao',
    'ccpvdz': 'ccpvdz',
}


def normalize_name(name):
    return (name.lower().replace('-', '').replace('_', '').replace(' ', '')
            .replace('*', 's'))


@lru_cache(maxsize=None)
def _load_file(stem):
    path = os.path.join(_DATA_DIR, stem + '.json.gz')
    if not os.path.exists(path):
        raise KeyError(f'Unknown basis set: {stem!r} '
                       f'(no file {path})')
    with gzip.open(path, 'rt') as f:
        return json.load(f)


def load(basis_name, symbol):
    """Return basis for one element: [[l, [exp, c1, ...], ...], ...]."""
    stem = normalize_name(basis_name)
    stem = ALIAS.get(stem, stem)
    data = _load_file(stem)
    if symbol not in data:
        raise KeyError(f'Element {symbol} not in basis {basis_name}')
    return [[s[0]] + [list(row) for row in s[1:]] for s in data[symbol]]


def available_basis():
    return sorted(f[:-8] for f in os.listdir(_DATA_DIR)
                  if f.endswith('.json.gz'))


# ---------------------------------------------------------------------------
# effective core potentials (reference: gto/basis/__init__.py load_ecp,
# parse_nwchem_ecp.py) backed by gto/ecp_data/*.json.gz
# ---------------------------------------------------------------------------
_ECP_DIR = os.path.join(os.path.dirname(__file__), 'ecp_data')


@lru_cache(maxsize=None)
def _load_ecp_file(stem):
    path = os.path.join(_ECP_DIR, stem + '.json.gz')
    if not os.path.exists(path):
        raise KeyError(f'Unknown ECP set: {stem!r} (no file {path})')
    with gzip.open(path, 'rt') as f:
        return json.load(f)


def load_ecp(ecp_name, symbol):
    """ECP for one element: [nelec_core, [[l, [[rpow, exp, c], ...]], ...]]
    with l = -1 the local channel. Returns None if the element has no ECP
    in this set (matching reference semantics for e.g. H with lanl2dz)."""
    data = _load_ecp_file(normalize_name(ecp_name))
    entry = data.get(symbol)
    if entry is None:
        return None
    nelec, pots = entry
    return [int(nelec), [[int(l), [list(r) for r in rows]]
                         for l, rows in pots]]


def available_ecp():
    if not os.path.isdir(_ECP_DIR):
        return []
    return sorted(f[:-8] for f in os.listdir(_ECP_DIR)
                  if f.endswith('.json.gz'))
