#!/usr/bin/env python
"""Convert CP2K-format GTH basis sets and pseudopotentials (public data,
Goedecker-Teter-Hutter, PRB 54, 1703) into pyscf_tpu's JSON formats.

Basis -> pyscf_tpu/gto/basis_data/<name>.json.gz (same schema as molecular).
Pseudo -> pyscf_tpu/pbc/gto/pseudo_data/<name>.json.gz:
    {elem: {"zion": [n_s, n_p, ...], "rloc": float, "cloc": [...],
            "nl": [{"rl": float, "h": [[...]]}, ...]}}
"""
import gzip
import json
import os
import sys

SRC_B = '/root/reference/pyscf/pbc/gto/basis'
SRC_P = '/root/reference/pyscf/pbc/gto/pseudo'
DST_B = 'pyscf_tpu/gto/basis_data'
DST_P = 'pyscf_tpu/pbc/gto/pseudo_data'


def parse_cp2k_basis(text):
    lines = [ln for ln in text.splitlines()
             if ln.strip() and not ln.strip().startswith('#')]
    basis = {}
    i = 0
    while i < len(lines):
        header = lines[i].split()
        if len(header) < 2 or not header[0][0].isalpha():
            i += 1
            continue
        elem = header[0].capitalize()
        i += 1
        nsets = int(lines[i].split()[0])
        i += 1
        shells = []
        for _ in range(nsets):
            spec = [int(x) for x in lines[i].split()]
            i += 1
            lmin, lmax, nexp = spec[1], spec[2], spec[3]
            nshells = spec[4:4 + (lmax - lmin + 1)]
            rows = []
            for _ in range(nexp):
                rows.append([float(x) for x in lines[i].split()])
                i += 1
            col = 1
            for li, l in enumerate(range(lmin, lmax + 1)):
                for _ in range(nshells[li]):
                    shells.append([l] + [[r[0], r[col]] for r in rows])
                    col += 1
        basis[elem] = shells
    return basis


def parse_gth_pseudo(text):
    lines = [ln for ln in text.splitlines()
             if ln.strip() and not ln.strip().startswith('#')]
    out = {}
    i = 0
    while i < len(lines):
        header = lines[i].split()
        if not header or not header[0][0].isalpha():
            i += 1
            continue
        elem = header[0].capitalize()
        names = header[1:]
        i += 1
        nelec = [int(x) for x in lines[i].split()]
        i += 1
        loc = lines[i].split()
        rloc = float(loc[0])
        nloc = int(loc[1])
        cloc = [float(x) for x in loc[2:2 + nloc]]
        i += 1
        nprj = int(lines[i].split()[0])
        i += 1
        nl = []
        for _ in range(nprj):
            row = lines[i].split()
            rl = float(row[0])
            nl_i = int(row[1])
            hvals = [float(x) for x in row[2:]]
            i += 1
            # upper-triangle rows continue on subsequent lines
            h = [[0.0] * nl_i for _ in range(nl_i)]
            k = 0
            for a in range(nl_i):
                for b in range(a, nl_i):
                    if k >= len(hvals):
                        hvals += [float(x) for x in lines[i].split()]
                        i += 1
                    h[a][b] = h[b][a] = hvals[k]
                    k += 1
            nl.append({'rl': rl, 'h': h})
        # keep only the default (first/shortest alias) entry per element:
        # file convention: 'GTH-PADE-qN' specific first; plain 'GTH-PADE'
        # alias marks the default charge state.
        rec = {'nelec': nelec, 'rloc': rloc, 'cloc': cloc, 'nl': nl}
        for name in names:
            key = (elem, name.upper())
            out[key] = rec
        out[(elem, header[1].upper())] = rec
    return out


def main():
    os.makedirs(DST_P, exist_ok=True)
    # basis sets
    for fn in os.listdir(SRC_B):
        if not fn.endswith('.dat'):
            continue
        name = fn[:-4].lower().replace('-', '').replace('_', '')
        try:
            with open(os.path.join(SRC_B, fn)) as f:
                basis = parse_cp2k_basis(f.read())
        except Exception as e:
            print('SKIP basis', fn, e)
            continue
        if basis:
            with gzip.open(os.path.join(DST_B, name + '.json.gz'), 'wt') as f:
                json.dump(basis, f)
            print('basis', name, len(basis), 'elements')
    # pseudopotentials
    for fn in ('gth-pade.dat', 'gth-pbe.dat', 'gth-blyp.dat', 'gth-bp.dat'):
        path = os.path.join(SRC_P, fn)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            recs = parse_gth_pseudo(f.read())
        # store default alias table: {elem: rec} for the plain family name
        fam = fn[:-4].upper()           # e.g. GTH-PADE
        data = {}
        for (elem, name), rec in recs.items():
            if name == fam and elem not in data:
                data[elem] = rec
        # also store every named variant
        variants = {f'{elem}:{name}': rec for (elem, name), rec in recs.items()}
        outname = fn[:-4].lower().replace('-', '')
        with gzip.open(os.path.join(DST_P, outname + '.json.gz'), 'wt') as f:
            json.dump({'default': data, 'variants': variants}, f)
        print('pseudo', outname, len(data), 'elements')


if __name__ == '__main__':
    main()
