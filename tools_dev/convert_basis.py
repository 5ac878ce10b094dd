#!/usr/bin/env python
"""Convert NWChem-format basis-set data tables into pyscf_tpu's compact JSON.gz format.

The source tables are public scientific data (Basis Set Exchange exports, NWChem
format) shipped with the reference at /root/reference/pyscf/gto/basis/*.dat.
This script parses them with an independent parser and re-serializes only the
numerical data (exponents/contraction coefficients per element per angular
momentum) into one gzipped JSON file per basis set under
pyscf_tpu/gto/basis_data/.

Output format per file:
    { "<ElementSymbol>": [ [l, [exp, c1, c2, ...], [exp, c1, ...], ...], ... ] }

Composite shells (SP/SPD) are split into separate single-l entries.
"""
import gzip
import json
import os
import re
import sys

L_OF = {'S': 0, 'P': 1, 'D': 2, 'F': 3, 'G': 4, 'H': 5, 'I': 6, 'K': 7}

ELEMENTS = set("""H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr
Mn Fe Co Ni Cu Zn Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In Sn Sb
Te I Xe Cs Ba La Ce Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf Ta W Re Os Ir Pt
Au Hg Tl Pb Bi Po At Rn Fr Ra Ac Th Pa U Np Pu Am Cm Bk Cf Es Fm Md No Lr Rf Db
Sg Bh Hs Mt Ds Rg Cn Nh Fl Mc Lv Ts Og""".split())

FLOAT_RE = re.compile(r'[-+]?\d*\.\d+(?:[eEdD][-+]?\d+)?|[-+]?\d+\.?(?:[eEdD][-+]?\d+)?')


def _floats(line):
    return [float(tok.replace('D', 'e').replace('d', 'e'))
            for tok in FLOAT_RE.findall(line)]


def parse_nwchem(text):
    """Parse NWChem basis text -> {element: [[l, [e,c,...], ...], ...]}."""
    basis = {}
    cur = None          # (element, [l0, l1, ...]) for composite shells
    rows = []

    def flush():
        nonlocal cur, rows
        if cur is None or not rows:
            cur = None
            rows = []
            return
        elem, ls = cur
        ncol = max(len(r) for r in rows) - 1
        if len(ls) == 1 and ncol >= 1:
            # possibly general contraction: one l, many coeff columns
            shell = [ls[0]] + [r for r in rows]
            basis.setdefault(elem, []).append(shell)
        else:
            # composite SP/SPD: column k belongs to angular momentum ls[k]
            for k, l in enumerate(ls):
                shell = [l] + [[r[0], r[1 + k]] for r in rows]
                basis.setdefault(elem, []).append(shell)
        cur = None
        rows = []

    in_ecp = False
    for raw in text.splitlines():
        line = raw.split('#')[0].rstrip()
        if not line.strip():
            continue
        u = line.strip()
        if u.upper() == 'ECP':
            # ECP parameter block: handled by convert_ecp.py, and its rows
            # must NOT be parsed as basis shells
            flush()
            in_ecp = True
            continue
        if u.upper().startswith('END'):
            flush()
            in_ecp = False
            continue
        if in_ecp:
            continue
        if u.upper().startswith(('BASIS', 'ECP')):
            flush()
            continue
        toks = u.split()
        sym = toks[0].capitalize() if len(toks[0]) <= 2 else toks[0]
        if len(toks) == 2 and sym in ELEMENTS and toks[1].upper() in (
                'S', 'P', 'D', 'F', 'G', 'H', 'I', 'K', 'SP', 'SPD', 'SPDF'):
            flush()
            ls = [L_OF[c] for c in toks[1].upper()]
            cur = (sym, ls)
        else:
            vals = _floats(line)
            if vals and cur is not None:
                rows.append(vals)
    flush()
    return basis


def normalize_name(name):
    """'cc-pVTZ' -> 'ccpvtz'; '6-31G*' -> '631gs'."""
    return (name.lower().replace('-', '').replace('_', '').replace(' ', '')
            .replace('*', 's'))


def _dump(basis, out_dir, name):
    out = os.path.join(out_dir, normalize_name(name) + '.json.gz')
    with gzip.open(out, 'wt') as f:
        json.dump(basis, f)


def convert_all(src_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    n_ok, n_skip = 0, 0
    dirs = [src_dir, os.path.join(src_dir, 'pople-basis')]
    for d in dirs:
        for fn in sorted(os.listdir(d)):
            if not fn.endswith('.dat'):
                continue
            try:
                with open(os.path.join(d, fn)) as f:
                    basis = parse_nwchem(f.read())
            except Exception as e:
                print(f'SKIP {fn}: {e}')
                n_skip += 1
                continue
            if not basis:
                print(f'SKIP {fn}: empty')
                n_skip += 1
                continue
            _dump(basis, out_dir, fn[:-4])
            n_ok += 1
    # minao: Python-literal data file (element = [[l, [e, c], ...], ...])
    ns = {}
    with open(os.path.join(src_dir, 'minao.py')) as f:
        exec(compile(f.read(), 'minao.py', 'exec'), {'__builtins__': {}}, ns)
    minao = {k: v for k, v in ns.items() if isinstance(v, list)}
    _dump(minao, out_dir, 'minao')
    n_ok += 1
    print(f'converted {n_ok} basis sets, skipped {n_skip}')


if __name__ == '__main__':
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/pyscf/gto/basis'
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), '..', 'pyscf_tpu', 'gto', 'basis_data')
    convert_all(src, dst)
