#!/usr/bin/env python
"""Extract Lebedev quadrature orbit parameters (public-domain numerical data,
Lebedev & Laikov) from the reference's data tables into a compact .npz.

Stored per order: list of (code, a, b, v) octahedral-orbit parameters.
The orbit generator itself is implemented independently in
pyscf_tpu/dft/lebedev.py.
"""
import re
import sys

import numpy as np

SRC = '/root/reference/pyscf/lib/dft/CxLebedevGrid.c'
OUT = 'pyscf_tpu/dft/lebedev_orbits.npz'


def parse(path):
    text = open(path).read()
    grids = {}
    for m in re.finditer(
            r'static int MakeAngularGrid_(\d+)\s*\(.*?\n\{(.*?)\n\}',
            text, re.S):
        order = int(m.group(1))
        body = m.group(2)
        a = b = 0.0
        rows = []
        for line in body.splitlines():
            line = line.strip()
            ma = re.match(r'a\s*=\s*([-\d.eE+]+)\s*;', line)
            mb = re.match(r'b\s*=\s*([-\d.eE+]+)\s*;', line)
            mv = re.match(r'v\s*=\s*([-\d.eE+]+)\s*;', line)
            mc = re.search(r'SphGenOh\([^,]+,\s*(\d+)\s*,', line)
            if ma:
                a = float(ma.group(1))
            elif mb:
                b = float(mb.group(1))
            elif mv:
                v = float(mv.group(1))
            elif mc:
                rows.append((int(mc.group(1)), a, b, v))
        if rows:
            grids[order] = np.array(rows)
    return grids


if __name__ == '__main__':
    grids = parse(SRC)
    np.savez_compressed(OUT, **{str(k): v for k, v in grids.items()})
    print('orders:', sorted(grids))
