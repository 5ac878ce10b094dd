"""DIIS (Pulay mixing) — in-core, works on arbitrary pytrees of jnp arrays.

Analog of the reference's pyscf/lib/diis.py (DIIS:39, update:202,
extrapolate:244) without the HDF5 spill path: subspace vectors live in
device memory (HBM), sized by `space`.
"""
import jax.numpy as jnp
import numpy as np


class DIIS:
    def __init__(self, space=8, min_space=1):
        self.space = space
        self.min_space = min_space
        self._x = []       # flattened solution vectors
        self._err = []     # flattened error vectors
        self._shapes = None

    @staticmethod
    def _flatten(tree):
        # host-side: avoids one device compile per subspace size
        if isinstance(tree, (list, tuple)):
            return np.concatenate([np.asarray(t).ravel() for t in tree])
        return np.asarray(tree).ravel()

    def _unflatten(self, vec, template):
        if isinstance(template, (list, tuple)):
            out, off = [], 0
            for t in template:
                n = t.size
                out.append(jnp.asarray(vec[off:off + n].reshape(t.shape)))
                off += n
            return type(template)(out)
        return jnp.asarray(vec.reshape(template.shape))

    def update(self, x, err):
        """Push (x, err) and return the DIIS-extrapolated x."""
        xv = self._flatten(x)
        ev = self._flatten(err)
        self._x.append(xv)
        self._err.append(ev)
        if len(self._x) > self.space:
            self._x.pop(0)
            self._err.pop(0)
        n = len(self._x)
        if n < self.min_space + 1:
            return x
        E = np.stack(self._err)                       # (n, m)
        B = (E @ E.conj().T).real                     # small, host-side
        H = np.empty((n + 1, n + 1))
        H[:n, :n] = B
        H[n, :n] = H[:n, n] = -1.0
        H[n, n] = 0.0
        g = np.zeros(n + 1)
        g[n] = -1.0
        try:
            # scale for conditioning
            w, v = np.linalg.eigh(H)
            keep = np.abs(w) > 1e-14 * np.abs(w).max()
            c = (v[:, keep] * (1.0 / w[keep])) @ (v[:, keep].T @ g)
        except np.linalg.LinAlgError:
            return x
        xnew = np.stack(self._x).T @ c[:n]
        return self._unflatten(xnew, x)
