"""Gaussian cube-file generation (analog of reference pyscf/tools/cubegen.py)."""
import numpy as np

from ..lib.parameters import BOHR


class Cube:
    def __init__(self, mol, nx=80, ny=80, nz=80, margin=3.0):
        self.mol = mol
        coords = np.asarray(mol.coords)
        self.box_min = coords.min(axis=0) - margin
        self.box_max = coords.max(axis=0) + margin
        self.n = (nx, ny, nz)
        self.step = (self.box_max - self.box_min) / (np.array(self.n) - 1)

    def get_coords(self):
        xs = [np.linspace(self.box_min[d], self.box_max[d], self.n[d])
              for d in range(3)]
        g = np.meshgrid(*xs, indexing='ij')
        return np.stack([x.ravel() for x in g], axis=1)

    def write(self, field, filename, comment='cube file'):
        mol = self.mol
        field = np.asarray(field).reshape(self.n)
        with open(filename, 'w') as f:
            f.write(f'{comment}\npyscf_tpu cube\n')
            f.write(f'{mol.natm:5d} {self.box_min[0]:12.6f} '
                    f'{self.box_min[1]:12.6f} {self.box_min[2]:12.6f}\n')
            for d in range(3):
                v = [0.0, 0.0, 0.0]
                v[d] = self.step[d]
                f.write(f'{self.n[d]:5d} {v[0]:12.6f} {v[1]:12.6f} '
                        f'{v[2]:12.6f}\n')
            for ia in range(mol.natm):
                c = mol.coords[ia]
                z = int(mol.charges[ia])
                f.write(f'{z:5d} {float(z):12.6f} {c[0]:12.6f} '
                        f'{c[1]:12.6f} {c[2]:12.6f}\n')
            flat = field.ravel()
            for i in range(0, flat.size, 6):
                f.write(' '.join(f'{v:13.5e}' for v in flat[i:i + 6]) + '\n')


def density(mol, outfile, dm, nx=80, ny=80, nz=80):
    """Electron density on a cube grid."""
    import jax.numpy as jnp
    from ..ops.eval_gto import eval_ao
    cc = Cube(mol, nx, ny, nz)
    pts = cc.get_coords()
    rho = np.empty(pts.shape[0])
    dmj = jnp.asarray(dm)
    blk = 8192
    for i in range(0, pts.shape[0], blk):
        ao = eval_ao(mol, jnp.asarray(pts[i:i + blk]), deriv=0)
        rho[i:i + blk] = np.asarray(
            jnp.einsum('bi,ij,bj->b', ao, dmj, ao))
    cc.write(rho, outfile, 'Electron density')
    return rho


def orbital(mol, outfile, coeff, nx=80, ny=80, nz=80):
    """One molecular orbital on a cube grid."""
    import jax.numpy as jnp
    from ..ops.eval_gto import eval_ao
    cc = Cube(mol, nx, ny, nz)
    pts = cc.get_coords()
    val = np.empty(pts.shape[0])
    cj = jnp.asarray(coeff)
    blk = 8192
    for i in range(0, pts.shape[0], blk):
        ao = eval_ao(mol, jnp.asarray(pts[i:i + blk]), deriv=0)
        val[i:i + blk] = np.asarray(ao @ cj)
    cc.write(val, outfile, 'Molecular orbital')
    return val
