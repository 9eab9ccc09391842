"""RCWA solver with a reference-compatible, differentiable API.

``rcwa`` mirrors the public surface of the reference solver class
(/root/reference/torcwa/rcwa.py:7-1306) — same method names, arguments and
physics conventions — so reference example scripts port with an import
change.  Internally it is a thin stateful shell over the pure functions in
:mod:`torcwa_tpu.core`: each heavy stage is a jitted pure function, so the
whole object works under ``jax.grad`` / inside a traced objective, and
repeated instantiations with the same shapes hit the jit cache.

Unit conventions (reference rcwa.py:17-21): Lorentz-Heaviside, c = 1,
exp(-j w t) time harmonics.
"""

import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ._constants import PI_REF, validate_sim_dtype, real_dtype_of
from . import core
from .core import bd_apply, bd_dense, bd_inv, bd_mul
from .ops.eig import Eig
from .ops import fourier
from . import fields as _fields

__all__ = ['rcwa']


# ---------------------------------------------------------------------------
# Jitted pipeline stages (module-level so the cache is shared across
# solver instances — reference-style sweeps create a fresh instance per
# point, e.g. Example3's 11x11 loop).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('order', 'dtype'))
def _jit_material_conv(grid, order, dtype):
    return fourier.material_conv(grid, order, dtype)


@functools.partial(jax.jit, static_argnames=(
    'broadening', 'backend', 'stable_grad', 'avoid_pinv', 'max_pinv'))
def _jit_patterned_layer(eps_conv, mu_conv, kx, ky, Vf, omega, thickness,
                         broadening, backend, stable_grad, avoid_pinv,
                         max_pinv):
    P, Q = core.pq_matrices(eps_conv, mu_conv, kx, ky)
    kz, E = core.eigen_decomposition(P, Q, broadening, backend, stable_grad)
    sol, instability = core.layer_smatrix(
        E, kz, P, Q, Vf, omega, thickness,
        avoid_pinv_instability=avoid_pinv, max_pinv_instability=max_pinv)
    return sol, instability


@functools.partial(jax.jit, static_argnames=('dtype',))
def _jit_homogeneous_layer(eps, mu, kx, ky, Vf, omega, thickness, dtype):
    return core.layer_smatrix_homogeneous(eps, mu, kx, ky, Vf, omega,
                                          thickness, dtype)


_jit_redheffer = jax.jit(core.redheffer_product)


def _is_scalar_like(v):
    """Homogeneity test mirroring rcwa.py:156-157."""
    if isinstance(v, (int, float, complex)):
        return True
    arr = np.asarray(v) if not isinstance(v, jnp.ndarray) else v
    return arr.ndim == 0 or (arr.ndim == 1 and arr.shape[0] == 1)


class rcwa:
    """Rigorous Coupled Wave Analysis (Fourier modal method), TPU-native.

    Parameters mirror the reference (rcwa.py:9-33):
      freq: simulation frequency (1/length units)
      order: [order_x, order_y] Fourier truncation
      L: [Lx, Ly] lattice constants
      dtype: jnp.complex64 (default) or jnp.complex128 (CPU/x64 only)
      stable_eig_grad: use the broadening-stabilized eig backward
      avoid_Pinv_instability / max_Pinv_instability: P-inverse fallback knobs
      eig_backend: 'auto' | 'qr' (TPU-native) | 'callback' (host LAPACK)
    """

    def __init__(self, freq, order, L, *,
                 dtype=jnp.complex64,
                 device=None,
                 stable_eig_grad=True,
                 avoid_Pinv_instability=False,
                 max_Pinv_instability=0.005,
                 eig_backend='auto'):
        self._dtype = validate_sim_dtype(dtype)
        self._rdtype = real_dtype_of(self._dtype)
        self._device = device  # accepted for API compat; unused
        self.eig_backend = eig_backend

        self.stable_eig_grad = bool(stable_eig_grad)

        if avoid_Pinv_instability is True:
            self.avoid_Pinv_instability = True
            self.max_Pinv_instability = float(max_Pinv_instability)
            self.Pinv_instability = []
            self.Qinv_instability = []
        else:
            self.avoid_Pinv_instability = False
            self.max_Pinv_instability = None
            self.Pinv_instability = None
            self.Qinv_instability = None

        # Simulation parameters (rcwa.py:59-72)
        self.freq = jnp.asarray(freq, dtype=self._dtype)
        self.omega = 2 * PI_REF * freq  # rcwa.py:61 uses the raw argument
        self.order = [int(order[0]), int(order[1])]
        self._order_t = (int(order[0]), int(order[1]))
        self.order_x = np.arange(-self.order[0], self.order[0] + 1)
        self.order_y = np.arange(-self.order[1], self.order[1] + 1)
        self.order_N = len(self.order_x) * len(self.order_y)
        self.L = L
        self.Gx_norm = 1 / (L[0] * self.freq)
        self.Gy_norm = 1 / (L[1] * self.freq)

        # Claddings default to free space (rcwa.py:74-78)
        self.eps_in = jnp.asarray(1., dtype=self._dtype)
        self.mu_in = jnp.asarray(1., dtype=self._dtype)
        self.eps_out = jnp.asarray(1., dtype=self._dtype)
        self.mu_out = jnp.asarray(1., dtype=self._dtype)
        self._has_input_layer = False
        self._has_output_layer = False

        # Internal layer state (rcwa.py:80-93)
        self.layer_N = 0
        self.thickness = []
        self.eps_conv, self.mu_conv = [], []
        self.layers = []          # list[core.LayerSolution]
        self._layer_is_bd = []    # True for homogeneous (bd-structured) layers

    # -- setup ------------------------------------------------------------

    def add_input_layer(self, eps=1., mu=1.):
        """Set the semi-infinite input cladding (rcwa.py:95-107)."""
        self.eps_in = jnp.asarray(eps, dtype=self._dtype)
        self.mu_in = jnp.asarray(mu, dtype=self._dtype)
        self._has_input_layer = True
        self.Sin = []

    def add_output_layer(self, eps=1., mu=1.):
        """Set the semi-infinite output cladding (rcwa.py:109-121)."""
        self.eps_out = jnp.asarray(eps, dtype=self._dtype)
        self.mu_out = jnp.asarray(mu, dtype=self._dtype)
        self._has_output_layer = True
        self.Sout = []

    def set_incident_angle(self, inc_ang, azi_ang, angle_layer='input'):
        """Set incidence/azimuth (radians) and build k-vectors (rcwa.py:123-144)."""
        self.inc_ang = jnp.asarray(inc_ang, dtype=self._dtype)
        self.azi_ang = jnp.asarray(azi_ang, dtype=self._dtype)

        if angle_layer in ['i', 'in', 'input']:
            self.angle_layer = 'input'
        elif angle_layer in ['o', 'out', 'output']:
            self.angle_layer = 'output'
        else:
            warnings.warn('Invalid angle layer. Set as input layer.', UserWarning)
            self.angle_layer = 'input'

        self._kvectors()

    def add_layer(self, thickness, eps=1., mu=1.):
        """Add one internal layer; solves its eigenmodes and S-matrix eagerly
        (rcwa.py:146-170)."""
        is_eps_h = _is_scalar_like(eps)
        is_mu_h = _is_scalar_like(mu)

        eps_c = (jnp.asarray(eps, self._dtype) * jnp.eye(self.order_N, dtype=self._dtype)
                 if is_eps_h else _jit_material_conv(eps, self._order_t, self._dtype))
        mu_c = (jnp.asarray(mu, self._dtype) * jnp.eye(self.order_N, dtype=self._dtype)
                if is_mu_h else _jit_material_conv(mu, self._order_t, self._dtype))
        self.eps_conv.append(eps_c)
        self.mu_conv.append(mu_c)

        self.layer_N += 1
        self.thickness.append(thickness)

        if is_eps_h and is_mu_h:
            sol = _jit_homogeneous_layer(
                jnp.asarray(eps, self._dtype), jnp.asarray(mu, self._dtype),
                self.Kx_norm_dn, self.Ky_norm_dn, self.Vf, self.omega,
                thickness, self._dtype)
            self.layers.append(sol)
            self._layer_is_bd.append(True)
        else:
            sol, instability = _jit_patterned_layer(
                eps_c, mu_c, self.Kx_norm_dn, self.Ky_norm_dn, self.Vf,
                self.omega, thickness,
                broadening=(Eig.broadening_parameter if self.stable_eig_grad else 0.0),
                backend=self.eig_backend,
                stable_grad=self.stable_eig_grad,
                avoid_pinv=self.avoid_Pinv_instability,
                max_pinv=(self.max_Pinv_instability
                          if self.avoid_Pinv_instability else 0.005))
            if self.avoid_Pinv_instability and instability is not None:
                self.Pinv_instability.append(instability[0])
                self.Qinv_instability.append(instability[1])
            self.layers.append(sol)
            self._layer_is_bd.append(False)

    # -- global solve -----------------------------------------------------

    def _dense_S(self, i):
        """Layer i's S blocks [S11, S21, S12, S22] as dense matrices.

        Exploits S22 == S11 and S12 == S21 (see core.py docstring)."""
        sol = self.layers[i]
        if self._layer_is_bd[i]:
            s11 = bd_dense(sol.S11)
            s21 = bd_dense(sol.S21)
        else:
            s11, s21 = sol.S11, sol.S21
        return [s11, s21, s21, s11]

    def _dense_C(self, i):
        """Layer i's (Cf, Cb) as dense [4N, 2N] pairs split into
        (top, bottom) = ((G, D), (D, G))."""
        sol = self.layers[i]
        if self._layer_is_bd[i]:
            G, D = bd_dense(sol.G), bd_dense(sol.D)
        else:
            G, D = sol.G, sol.D
        cf = jnp.concatenate([G, D], axis=0)
        cb = jnp.concatenate([D, G], axis=0)
        return (cf, cb)

    def solve_global_smatrix(self):
        """Fold all layer S-matrices plus claddings via Redheffer star
        products, propagating the mode-coupling matrices (rcwa.py:173-211)."""
        n2 = 2 * self.order_N
        if self.layer_N > 0:
            S = self._dense_S(0)
            C = [self._dense_C(0)]
        else:
            eye = jnp.eye(n2, dtype=self._dtype)
            zero = jnp.zeros((n2, n2), dtype=self._dtype)
            S = [eye, zero, zero, eye]
            C = []

        for i in range(1, self.layer_N):
            Sn = self._dense_S(i)
            S_new, t1, t2 = _jit_redheffer(S, Sn)
            C = core.redheffer_update_modes(C, [self._dense_C(i)], S, Sn, t1, t2)
            S = S_new

        if self._has_input_layer:
            Sin = [bd_dense(b) for b in self.Sin]
            S_new, t1, t2 = _jit_redheffer(Sin, S)
            C = core.redheffer_update_modes([], C, Sin, S, t1, t2)
            S = S_new

        if self._has_output_layer:
            Sout = [bd_dense(b) for b in self.Sout]
            S_new, t1, t2 = _jit_redheffer(S, Sout)
            C = core.redheffer_update_modes(C, [], S, Sout, t1, t2)
            S = S_new

        self.S = S
        self.C = C

    # -- extraction -------------------------------------------------------

    def diffraction_angle(self, orders, *, layer='output', unit='radian'):
        """Propagation angles of selected orders (rcwa.py:214-262)."""
        if layer in ['i', 'in', 'input']:
            layer = 'input'
        elif layer in ['o', 'out', 'output']:
            layer = 'output'
        else:
            warnings.warn('Invalid layer. Set as output layer.', UserWarning)
            layer = 'output'

        if unit in ['r', 'rad', 'radian']:
            unit = 'radian'
        elif unit in ['d', 'deg', 'degree']:
            unit = 'degree'
        else:
            warnings.warn('Invalid unit. Set as radian.', UserWarning)
            unit = 'radian'

        idx = core.matching_indices(orders, self.order)
        eps = self.eps_in if layer == 'input' else self.eps_out
        mu = self.mu_in if layer == 'input' else self.mu_out

        kx = self.Kx_norm_dn[idx]
        ky = self.Ky_norm_dn[idx]
        kt = jnp.sqrt(kx ** 2 + ky ** 2)
        kz = jnp.sqrt(eps * mu - kx ** 2 - ky ** 2)
        inc = jnp.arctan2(jnp.real(kt), jnp.real(kz))
        azi = jnp.arctan2(jnp.real(ky), jnp.real(kx))
        if unit == 'degree':
            inc = (180. / PI_REF) * inc
            azi = (180. / PI_REF) * azi
        return inc, azi

    def return_layer(self, layer_num, nx=100, ny=100):
        """Recover a layer's eps/mu spatial distributions from its truncated
        Fourier coefficients (rcwa.py:264-298)."""
        ox, oy = self.order[0], self.order[1]
        noy = 2 * oy + 1
        ii, jj, src_r, src_c = [], [], [], []
        for i in range(-2 * ox, 2 * ox + 1):
            for j in range(-2 * oy, 2 * oy + 1):
                ii.append(i % nx)
                jj.append(j % ny)
                if i >= 0 and j >= 0:
                    src_r.append(i * noy + j); src_c.append(0)
                elif i >= 0 and j < 0:
                    src_r.append(i * noy); src_c.append(-j)
                elif i < 0 and j >= 0:
                    src_r.append(j); src_c.append(-i * noy)
                else:
                    src_r.append(0); src_c.append(-i * noy - j)
        ii, jj = np.array(ii), np.array(jj)
        src_r, src_c = np.array(src_r), np.array(src_c)

        eps_fft = jnp.zeros((nx, ny), self._dtype).at[ii, jj].set(
            self.eps_conv[layer_num][src_r, src_c])
        mu_fft = jnp.zeros((nx, ny), self._dtype).at[ii, jj].set(
            self.mu_conv[layer_num][src_r, src_c])
        return (jnp.fft.ifftn(eps_fft) * nx * ny,
                jnp.fft.ifftn(mu_fft) * nx * ny)

    def S_parameters(self, orders, *, direction='forward', port='transmission',
                     polarization='xx', ref_order=[0, 0], power_norm=True,
                     evanscent=1e-3):
        """S-parameters at selected diffraction orders (rcwa.py:300-524).

        Supports xy-pol ('xx','yx','xy','yy') and ps-pol ('pp','sp','ps','ss')
        with the reference's power normalization and evanescent-order
        zeroing (including its asymmetric handling of evanescent output
        orders in the ps branch, rcwa.py:490 vs 495).
        """
        if direction in ['f', 'forward']:
            direction = 'forward'
        elif direction in ['b', 'backward']:
            direction = 'backward'
        else:
            warnings.warn('Invalid propagation direction. Set as forward.', UserWarning)
            direction = 'forward'

        if port in ['t', 'transmission']:
            port = 'transmission'
        elif port in ['r', 'reflection']:
            port = 'reflection'
        else:
            warnings.warn('Invalid port. Set as tramsmission.', UserWarning)
            port = 'transmission'

        if polarization not in ['xx', 'yx', 'xy', 'yy', 'pp', 'sp', 'ps', 'ss']:
            warnings.warn('Invalid polarization. Set as xx.', UserWarning)
            polarization = 'xx'

        oi = core.matching_indices(orders, self.order)
        ri = core.matching_indices(np.asarray(ref_order).reshape(1, 2), self.order)
        N = self.order_N
        Kx, Ky = self.Kx_norm_dn, self.Ky_norm_dn

        if polarization in ['xx', 'yx', 'xy', 'yy']:
            oi_p = oi + (N if polarization in ('yx', 'yy') else 0)
            ri_p = ri + (N if polarization in ('xy', 'yy') else 0)

            if power_norm:
                kz_in_c = jnp.sqrt(self.eps_in * self.mu_in - Kx ** 2 - Ky ** 2)
                ev_in = jnp.abs(jnp.real(kz_in_c) / jnp.imag(kz_in_c)) < evanscent
                kz_in = jnp.where(ev_in, 0., jnp.real(kz_in_c))
                kz_in = jnp.concatenate([kz_in, kz_in])

                kz_out_c = jnp.sqrt(self.eps_out * self.mu_out - Kx ** 2 - Ky ** 2)
                ev_out = jnp.abs(jnp.real(kz_out_c) / jnp.imag(kz_out_c)) < evanscent
                kz_out = jnp.where(ev_out, 0., jnp.real(kz_out_c))
                kz_out = jnp.concatenate([kz_out, kz_out])

                kxr = jnp.concatenate([jnp.real(Kx), jnp.real(Kx)])
                kyr = jnp.concatenate([jnp.real(Ky), jnp.real(Ky)])
                pol_map = {'xx': (kxr, kxr), 'xy': (kxr, kyr),
                           'yx': (kyr, kxr), 'yy': (kyr, kyr)}
                num_pol, den_pol = pol_map[polarization]

                num_kz, den_kz = self._select_kz(direction, port, kz_in, kz_out)
                norm = jnp.sqrt((1 + (num_pol[oi_p] / num_kz[oi_p]) ** 2)
                                / (1 + (den_pol[ri_p] / den_kz[ri_p]) ** 2))
                norm = norm * jnp.sqrt(num_kz[oi_p] / den_kz[ri_p])
            else:
                norm = 1.

            block = {'transmission': {'forward': 0, 'backward': 3},
                     'reflection': {'forward': 1, 'backward': 2}}[port][direction]
            S = self.S[block][oi_p, ri_p] * norm
            S = jnp.where(jnp.isinf(S), 0., S)
            S = jnp.where(jnp.isnan(S), 0., S)
            return S

        else:  # ps-pol
            if direction == 'forward' and port == 'transmission':
                idx, o_sign, r_sign = 0, 1, 1
                o_k2 = self.eps_out * self.mu_out
                r_k2 = self.eps_in * self.mu_in
            elif direction == 'forward' and port == 'reflection':
                idx, o_sign, r_sign = 1, -1, 1
                o_k2 = self.eps_in * self.mu_in
                r_k2 = self.eps_in * self.mu_in
            elif direction == 'backward' and port == 'reflection':
                idx, o_sign, r_sign = 2, 1, -1
                o_k2 = self.eps_out * self.mu_out
                r_k2 = self.eps_out * self.mu_out
            else:  # backward transmission
                idx, o_sign, r_sign = 3, -1, -1
                o_k2 = self.eps_in * self.mu_in
                r_k2 = self.eps_out * self.mu_out

            okx, oky = Kx[oi], Ky[oi]
            okt = jnp.sqrt(okx ** 2 + oky ** 2)
            okz_c = jnp.sqrt(o_k2 - okx ** 2 - oky ** 2)
            okz = o_sign * jnp.abs(jnp.real(okz_c))
            o_evan = jnp.abs(jnp.real(okz_c) / jnp.imag(okz_c)) < evanscent
            o_inc = jnp.arctan2(jnp.real(okt), okz)
            o_azi = jnp.arctan2(jnp.real(oky), jnp.real(okx))

            rkx, rky = Kx[ri], Ky[ri]
            rkt = jnp.sqrt(rkx ** 2 + rky ** 2)
            rkz_c = jnp.sqrt(r_k2 - rkx ** 2 - rky ** 2)
            rkz = r_sign * jnp.abs(jnp.real(rkz_c))
            r_evan = jnp.abs(jnp.real(rkz_c) / jnp.imag(rkz_c)) < evanscent
            r_inc = jnp.arctan2(jnp.real(rkt), rkz)
            r_azi = jnp.arctan2(jnp.real(rky), jnp.real(rkx))

            xx = self.S[idx][oi, ri]
            xy = self.S[idx][oi, ri + N]
            yx = self.S[idx][oi + N, ri]
            yy = self.S[idx][oi + N, ri + N]
            xx = jnp.where(o_evan, 0., xx)
            xy = jnp.where(o_evan, 0., xy)
            yx = jnp.where(o_evan, 0., yx)
            yy = jnp.where(o_evan, 0., yy)

            co, so = jnp.cos(o_azi), jnp.sin(o_azi)
            ci = jnp.cos(o_inc)
            cr, sr = jnp.cos(r_azi), jnp.sin(r_azi)
            cri = jnp.cos(r_inc)
            if polarization == 'pp':
                S = (co / ci * cri * cr * xx + so / ci * cri * cr * yx
                     + co / ci * cri * sr * xy + so / ci * cri * sr * yy)
            elif polarization == 'ps':
                S = (co / ci * (-sr) * xx + so / ci * (-sr) * yx
                     + co / ci * cr * xy + so / ci * cr * yy)
            elif polarization == 'sp':
                S = (-so * cri * cr * xx + co * cri * cr * yx
                     - so * cri * sr * xy + co * cri * sr * yy)
            else:  # 'ss'
                S = (-so * (-sr) * xx + co * (-sr) * yx
                     - so * cr * xy + co * cr * yy)

            if power_norm:
                kz_in_c = jnp.sqrt(self.eps_in * self.mu_in - Kx ** 2 - Ky ** 2)
                ev_in = jnp.abs(jnp.real(kz_in_c) / jnp.imag(kz_in_c)) < evanscent
                kz_in = jnp.where(ev_in, 0., jnp.real(kz_in_c))
                kz_in = jnp.concatenate([kz_in, kz_in])

                # NB: the ps branch keeps |Re kz| for evanescent *output*
                # orders instead of zeroing them (rcwa.py:495) — replicated.
                kz_out_c = jnp.sqrt(self.eps_out * self.mu_out - Kx ** 2 - Ky ** 2)
                ev_out = jnp.abs(jnp.real(kz_out_c) / jnp.imag(kz_out_c)) < evanscent
                kz_out = jnp.where(ev_out, jnp.abs(jnp.real(kz_out_c)),
                                   jnp.real(kz_out_c))
                kz_out = jnp.concatenate([kz_out, kz_out])

                num_kz, den_kz = self._select_kz(direction, port, kz_in, kz_out)
                norm = jnp.sqrt(num_kz[oi] / den_kz[ri])
            else:
                norm = 1.

            S = jnp.where(jnp.isinf(S), 0., S)
            S = jnp.where(jnp.isnan(S), 0., S)
            S = S * norm
            # Reference returns all-zero if the reference order is evanescent
            # (rcwa.py:462-464); jnp.where keeps this traceable.
            return jnp.where(r_evan, 0., S)

    @staticmethod
    def _select_kz(direction, port, kz_in, kz_out):
        """Numerator/denominator kz per direction x port (rcwa.py:377-388)."""
        if direction == 'forward' and port == 'transmission':
            return kz_out, kz_in
        if direction == 'forward' and port == 'reflection':
            return kz_in, kz_in
        if direction == 'backward' and port == 'reflection':
            return kz_out, kz_out
        return kz_in, kz_out

    # -- sources ----------------------------------------------------------

    def source_planewave(self, *, amplitude=[1., 0.], direction='forward',
                         notation='xy'):
        """Planewave source = Fourier source at order (0,0) (rcwa.py:526-537)."""
        self.source_fourier(amplitude=amplitude, orders=[0, 0],
                            direction=direction, notation=notation)

    def source_fourier(self, *, amplitude, orders, direction='forward',
                       notation='xy'):
        """Incident Fourier amplitude vector (rcwa.py:539-596)."""
        amplitude = jnp.asarray(amplitude, self._dtype).reshape(-1, 2)

        if direction in ['f', 'forward']:
            direction = 'forward'
        elif direction in ['b', 'backward']:
            direction = 'backward'
        else:
            warnings.warn('Invalid source direction. Set as forward.', UserWarning)
            direction = 'forward'

        if notation not in ['xy', 'ps']:
            warnings.warn('Invalid amplitude notation. Set as xy notation.', UserWarning)
            notation = 'xy'

        idx = core.matching_indices(orders, self.order)
        self.source_direction = direction

        N = self.order_N
        E_i = jnp.zeros((2 * N,), self._dtype)
        E_i = E_i.at[idx].set(amplitude[:, 0])
        E_i = E_i.at[idx + N].set(amplitude[:, 1])

        if notation == 'ps':
            if direction == 'forward':
                eps, mu, sign = self.eps_in, self.mu_in, 1
            else:
                eps, mu, sign = self.eps_out, self.mu_out, -1
            Kx, Ky = self.Kx_norm_dn, self.Ky_norm_dn
            kt = jnp.sqrt(Kx ** 2 + Ky ** 2)
            kz = sign * jnp.abs(jnp.real(jnp.sqrt(eps * mu - Kx ** 2 - Ky ** 2)))
            inc = jnp.arctan2(jnp.real(kt), kz)
            azi = jnp.arctan2(jnp.real(Ky), jnp.real(Kx))
            # ps->xy block-diagonal conversion (rcwa.py:589-594)
            ps2xy = jnp.stack([
                jnp.stack([jnp.cos(inc) * jnp.cos(azi), -jnp.sin(azi)]),
                jnp.stack([jnp.cos(inc) * jnp.sin(azi), jnp.cos(azi)]),
            ]).astype(self._dtype)
            E_i = bd_apply(ps2xy, E_i)

        self.E_i = E_i.reshape(-1, 1)

    # -- field reconstruction ----------------------------------------------

    def field_xz(self, x_axis, z_axis, y):
        """XZ-plane fields at fixed y (rcwa.py:598-775)."""
        return _fields.field_plane(self, 'xz', x_axis, z_axis, y)

    def field_yz(self, y_axis, z_axis, x):
        """YZ-plane fields at fixed x (rcwa.py:777-957)."""
        return _fields.field_plane(self, 'yz', y_axis, z_axis, x)

    def field_xy(self, layer_num, x_axis, y_axis, z_prop=0.):
        """XY-plane fields at one z inside a chosen layer (rcwa.py:959-1112)."""
        return _fields.field_xy(self, layer_num, x_axis, y_axis, z_prop)

    # -- internals ----------------------------------------------------------

    def _kvectors(self):
        """k-vector grids, free-space V matrix and cladding interface
        S-matrices (rcwa.py:1124-1181)."""
        if self.angle_layer == 'input':
            n_med = jnp.real(jnp.sqrt(self.eps_in * self.mu_in))
        else:
            n_med = jnp.real(jnp.sqrt(self.eps_out * self.mu_out))
        self.kx0_norm = n_med * jnp.sin(self.inc_ang) * jnp.cos(self.azi_ang)
        self.ky0_norm = n_med * jnp.sin(self.inc_ang) * jnp.sin(self.azi_ang)

        ox = jnp.asarray(self.order_x, self._dtype)
        oy = jnp.asarray(self.order_y, self._dtype)
        self.kx_norm = self.kx0_norm + ox * self.Gx_norm
        self.ky_norm = self.ky0_norm + oy * self.Gy_norm
        kxg, kyg = jnp.meshgrid(self.kx_norm, self.ky_norm, indexing='ij')
        self.Kx_norm_dn = kxg.reshape(-1)
        self.Ky_norm_dn = kyg.reshape(-1)

        kz_f = core.kz_conj_branch(jnp.asarray(1., self._dtype),
                                   self.Kx_norm_dn, self.Ky_norm_dn)
        self.Vf = core.vmat(self.Kx_norm_dn, self.Ky_norm_dn, kz_f)

        if self._has_input_layer:
            kz_i = core.kz_conj_branch(self.eps_in * self.mu_in,
                                       self.Kx_norm_dn, self.Ky_norm_dn)
            self.Vi = core.vmat(self.Kx_norm_dn, self.Ky_norm_dn, kz_i)
            self.Sin = core.interface_smatrix_in(self.Vf, self.Vi)

        if self._has_output_layer:
            kz_o = core.kz_conj_branch(self.eps_out * self.mu_out,
                                       self.Kx_norm_dn, self.Ky_norm_dn)
            self.Vo = core.vmat(self.Kx_norm_dn, self.Ky_norm_dn, kz_o)
            self.Sout = core.interface_smatrix_out(self.Vf, self.Vo)
