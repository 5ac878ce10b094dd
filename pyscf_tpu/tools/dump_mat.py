"""Pretty matrix printing (analog of reference pyscf/tools/dump_mat.py)."""
import numpy as np


def dump_rec(stdout, m, row_labels=None, col_labels=None, ncol=5,
             digits=5, start=0):
    m = np.asarray(m)
    nrow, ncols = m.shape
    if row_labels is None:
        row_labels = [str(i + start) for i in range(nrow)]
    if col_labels is None:
        col_labels = [str(i + start) for i in range(ncols)]
    fmt = f'%{digits + 6}.{digits}f'
    for c0 in range(0, ncols, ncol):
        c1 = min(c0 + ncol, ncols)
        print(' ' * 10 + ''.join(f'{l:>{digits + 6}}'
                                 for l in col_labels[c0:c1]), file=stdout)
        for i in range(nrow):
            row = ''.join(fmt % m[i, j] for j in range(c0, c1))
            print(f'{row_labels[i]:<10}{row}', file=stdout)


def dump_tri(stdout, m, **kwargs):
    dump_rec(stdout, np.tril(np.asarray(m)), **kwargs)
