#!/usr/bin/env python
"""Convert NWChem-format ECP data tables into pyscf_tpu's compact JSON.gz format.

The source tables are public scientific data (Stuttgart/LANL/CRENB/ccECP
effective-core-potential parameter sets, NWChem format) shipped with the
reference at /root/reference/pyscf/gto/basis/*.dat (ECP sections; format
documented in parse_nwchem_ecp.py). This script parses the ECP blocks with an
independent parser and re-serializes only the numerical data.

Output format per file (pyscf_tpu/gto/ecp_data/<name>.json.gz):
    { "<ElementSymbol>": [nelec_core,
                          [[l, [[r_power, exp, coef], ...]], ...]] }
with l = -1 for the local channel ("ul"), and U_l(r) =
sum_k coef_k * r^(r_power_k - 2) * exp(-exp_k * r^2).
"""
import gzip
import json
import os
import re
import sys

L_OF = {'S': 0, 'P': 1, 'D': 2, 'F': 3, 'G': 4, 'H': 5, 'I': 6, 'K': 7}

FLOAT_RE = re.compile(r'[-+]?\d*\.\d+(?:[eEdD][-+]?\d+)?|[-+]?\d+\.?(?:[eEdD][-+]?\d+)?')


def parse_nwchem_ecp(text):
    """Parse the ECP section(s) of an NWChem .dat file.

    Returns {element: [nelec, [[l, [[rpow, exp, c], ...]], ...]]}.
    """
    # isolate ECP sections: from a line that is exactly 'ECP' to 'END'/'ECP_END'
    lines = text.splitlines()
    in_ecp = False
    ecp_lines = []
    for raw in lines:
        line = raw.split('#')[0].rstrip()
        u = line.strip().upper()
        if u == 'ECP':
            in_ecp = True
            continue
        if in_ecp and (u.startswith('END') or u == 'ECP_END'):
            in_ecp = False
            continue
        if in_ecp and line.strip():
            ecp_lines.append(line.strip())

    out = {}
    cur_elem = None
    cur_l = None

    def get_entry(elem):
        if elem not in out:
            out[elem] = [0, {}]
        return out[elem]

    for line in ecp_lines:
        toks = line.split()
        if toks[0][0].isalpha():
            elem = toks[0].capitalize()
            if len(toks) >= 3 and toks[1].lower() == 'nelec':
                get_entry(elem)[0] = int(toks[2])
                cur_elem = elem
                cur_l = None
            elif len(toks) >= 2:
                key = toks[1].upper()
                cur_elem = elem
                if key == 'UL':
                    cur_l = -1
                elif key in L_OF:
                    cur_l = L_OF[key]
                else:
                    cur_l = None
            continue
        if cur_elem is None or cur_l is None:
            continue
        vals = [float(t.replace('D', 'e').replace('d', 'e'))
                for t in FLOAT_RE.findall(line)]
        if len(vals) >= 3 and vals[2] != 0.0:
            get_entry(cur_elem)[1].setdefault(cur_l, []).append(
                [int(vals[0]), vals[1], vals[2]])

    # normalize: dict-of-l -> sorted list; drop elements with no potentials
    result = {}
    for elem, (nelec, pots) in out.items():
        if not pots or nelec == 0:
            continue
        plist = [[l, rows] for l, rows in sorted(pots.items())]
        result[elem] = [nelec, plist]
    return result


def normalize_name(name):
    return (name.lower().replace('-', '').replace('_', '').replace(' ', '')
            .replace('*', 's'))


def convert_all(src_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    n_ok = 0
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith('.dat'):
            continue
        try:
            with open(os.path.join(src_dir, fn)) as f:
                ecp = parse_nwchem_ecp(f.read())
        except Exception as e:
            print(f'SKIP {fn}: {e}')
            continue
        if not ecp:
            continue
        outname = normalize_name(fn[:-4])
        with gzip.open(os.path.join(out_dir, outname + '.json.gz'), 'wt') as f:
            json.dump(ecp, f)
        print(f'{fn}: {len(ecp)} elements -> {outname}.json.gz')
        n_ok += 1
    print(f'{n_ok} ECP sets converted')


if __name__ == '__main__':
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/pyscf/gto/basis'
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), '..', 'pyscf_tpu', 'gto', 'ecp_data')
    convert_all(src, dst)
