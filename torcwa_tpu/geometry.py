"""Differentiable level-set shape rasterization.

Functional parity with the reference geometry module
(/root/reference/torcwa/geometry.py:4-290): each primitive builds a signed
level-set function on a cell-centered grid and squashes it through
``sigmoid(edge_sharpness * level)``; boolean ops act pointwise on the
resulting occupancy rasters (union = max, intersection = min,
difference = min(A, 1-B)).

TPU-first notes: everything here is pure ``jnp`` elementwise math — it jits,
vmaps and differentiates cleanly.  Grids are built fresh per call (cheap,
fused by XLA).  The ``device`` kwarg is accepted for API compatibility with
the reference but ignored (JAX manages placement).
"""

import jax
import jax.numpy as jnp

__all__ = ['geometry', 'rcwa_geo']


def _grid(Lx, Ly, nx, ny, dtype):
    """Cell-centered sampling grid: x_i = (Lx/nx)*(i + 0.5).

    Matches /root/reference/torcwa/geometry.py:39-46 (meshgrid indexing='ij').
    """
    x = (Lx / nx) * (jnp.arange(nx, dtype=dtype) + 0.5)
    y = (Ly / ny) * (jnp.arange(ny, dtype=dtype) + 0.5)
    x_grid, y_grid = jnp.meshgrid(x, y, indexing='ij')
    return x, y, x_grid, y_grid


def _rot_coords(x_grid, y_grid, Cx, Cy, theta):
    """Coordinates in the frame rotated by ``theta`` about (Cx, Cy)."""
    ct, st = jnp.cos(theta), jnp.sin(theta)
    u = (x_grid - Cx) * ct + (y_grid - Cy) * st
    v = -(x_grid - Cx) * st + (y_grid - Cy) * ct
    return u, v


def _sigmoid(x):
    # jax.nn.sigmoid is overflow-safe in both value and gradient (the naive
    # 1/(1+exp(-x)) yields inf/inf = nan gradients for strongly negative x
    # at the edge-sharpness values used here).
    return jax.nn.sigmoid(x)


class geometry:
    """Instance-configured rasterizer (reference geometry.py:4-152)."""

    def __init__(self, Lx: float = 1., Ly: float = 1., nx: int = 100,
                 ny: int = 100, edge_sharpness: float = 1000., *,
                 dtype=jnp.float32, device=None):
        self.Lx = Lx
        self.Ly = Ly
        self.nx = nx
        self.ny = ny
        self.edge_sharpness = edge_sharpness
        self.dtype = dtype
        self.device = device  # accepted for API compat; unused

    def grid(self):
        """Update grid (reference geometry.py:39-46)."""
        self.x, self.y, self.x_grid, self.y_grid = _grid(
            self.Lx, self.Ly, self.nx, self.ny, self.dtype)

    def circle(self, R, Cx, Cy):
        """Occupancy raster of a circle (reference geometry.py:48-57)."""
        self.grid()
        level = 1. - jnp.sqrt(((self.x_grid - Cx) / R) ** 2
                              + ((self.y_grid - Cy) / R) ** 2)
        return _sigmoid(self.edge_sharpness * level)

    def ellipse(self, Rx, Ry, Cx, Cy, theta=0.):
        """Rotated ellipse (reference geometry.py:59-71)."""
        self.grid()
        u, v = _rot_coords(self.x_grid, self.y_grid, Cx, Cy,
                           jnp.asarray(theta, self.dtype))
        level = 1. - jnp.sqrt((u / Rx) ** 2 + (v / Ry) ** 2)
        return _sigmoid(self.edge_sharpness * level)

    def square(self, W, Cx, Cy, theta=0.):
        """Rotated square (reference geometry.py:73-85)."""
        return self.rectangle(W, W, Cx, Cy, theta)

    def rectangle(self, Wx, Wy, Cx, Cy, theta=0.):
        """Rotated rectangle (reference geometry.py:87-100)."""
        self.grid()
        u, v = _rot_coords(self.x_grid, self.y_grid, Cx, Cy,
                           jnp.asarray(theta, self.dtype))
        level = 1. - jnp.maximum(jnp.abs(u / (Wx / 2.)), jnp.abs(v / (Wy / 2.)))
        return _sigmoid(self.edge_sharpness * level)

    def rhombus(self, Wx, Wy, Cx, Cy, theta=0.):
        """Rotated rhombus; Wx/Wy are the diagonals (reference geometry.py:102-115)."""
        self.grid()
        u, v = _rot_coords(self.x_grid, self.y_grid, Cx, Cy,
                           jnp.asarray(theta, self.dtype))
        level = 1. - (jnp.abs(u / (Wx / 2.)) + jnp.abs(v / (Wy / 2.)))
        return _sigmoid(self.edge_sharpness * level)

    def super_ellipse(self, Wx, Wy, Cx, Cy, theta=0., power=2.):
        """Rotated super-ellipse (reference geometry.py:117-131)."""
        self.grid()
        u, v = _rot_coords(self.x_grid, self.y_grid, Cx, Cy,
                           jnp.asarray(theta, self.dtype))
        level = 1. - (jnp.abs(u / (Wx / 2.)) ** power
                      + jnp.abs(v / (Wy / 2.)) ** power) ** (1. / power)
        return _sigmoid(self.edge_sharpness * level)

    @staticmethod
    def union(A, B):
        """A U B (reference geometry.py:133-138)."""
        return jnp.maximum(A, B)

    @staticmethod
    def intersection(A, B):
        """A n B (reference geometry.py:140-145)."""
        return jnp.minimum(A, B)

    @staticmethod
    def difference(A, B):
        """A n B^c (reference geometry.py:147-152)."""
        return jnp.minimum(A, 1. - B)


class rcwa_geo:
    """Class-attribute-configured twin of :class:`geometry`.

    Mirrors the legacy interface (reference geometry.py:155-290, deprecated
    per the reference README) so example scripts port with an import change.
    """

    edge_sharpness = 100.
    Lx = 1.
    Ly = 1.
    nx = 100
    ny = 100
    dtype = jnp.float32
    device = None  # accepted for API compat; unused

    def __init__(self):
        pass

    @classmethod
    def _geo(cls):
        return geometry(cls.Lx, cls.Ly, cls.nx, cls.ny, cls.edge_sharpness,
                        dtype=cls.dtype)

    @classmethod
    def grid(cls):
        cls.x, cls.y, cls.x_grid, cls.y_grid = _grid(
            cls.Lx, cls.Ly, cls.nx, cls.ny, cls.dtype)

    @classmethod
    def circle(cls, R, Cx, Cy):
        cls.grid()
        return cls._geo().circle(R, Cx, Cy)

    @classmethod
    def ellipse(cls, Rx, Ry, Cx, Cy, theta=0.):
        cls.grid()
        return cls._geo().ellipse(Rx, Ry, Cx, Cy, theta)

    @classmethod
    def square(cls, W, Cx, Cy, theta=0.):
        cls.grid()
        return cls._geo().square(W, Cx, Cy, theta)

    @classmethod
    def rectangle(cls, Wx, Wy, Cx, Cy, theta=0.):
        cls.grid()
        return cls._geo().rectangle(Wx, Wy, Cx, Cy, theta)

    @classmethod
    def rhombus(cls, Wx, Wy, Cx, Cy, theta=0.):
        cls.grid()
        return cls._geo().rhombus(Wx, Wy, Cx, Cy, theta)

    @classmethod
    def super_ellipse(cls, Wx, Wy, Cx, Cy, theta=0., power=2.):
        cls.grid()
        return cls._geo().super_ellipse(Wx, Wy, Cx, Cy, theta, power)

    @classmethod
    def union(cls, A, B):
        return jnp.maximum(A, B)

    @classmethod
    def intersection(cls, A, B):
        return jnp.minimum(A, B)

    @classmethod
    def difference(cls, A, B):
        return jnp.minimum(A, 1. - B)
