"""RCWA solver with a reference-compatible, differentiable API.

``rcwa`` mirrors the public surface of the reference solver class
(/root/reference/torcwa/rcwa.py:7-1306) — same method names, arguments and
physics conventions — so reference example scripts port with an import
change.  Internally it is a thin stateful shell over the pure split-real
functions in :mod:`torcwa_tpu.core`: every heavy stage is a jitted pure
function of (re, im) float pairs, so the whole object works under
``jax.grad`` / inside a traced objective, runs end-to-end on the TPU
runtime (which cannot hold complex arrays), and repeated instantiations
with the same shapes hit the jit cache.

Output convention: extraction methods (``S_parameters``, ``field_*``,
``diffraction_angle``, ``return_layer``) return complex arrays when the
backend supports them (CPU — the default, golden-tested surface) and
split-real ``(re, im)`` pairs on TPU, controlled by the ``output``
constructor argument ('auto' | 'complex' | 'pair').

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
from .core import bdp_apply, bdp_dense, bdp_inv, bdp_mul
from .ops import cplx
from .ops.cplx import (cadd, csub, cneg, cmul, cdiv_raw, cmm, csqrt,
                       csin, ccos)
from .ops.eig import Eig
from .ops import fourier
from . import fields as _fields

__all__ = ['rcwa']


# ---------------------------------------------------------------------------
# Jitted pipeline stages (module-level so the cache is shared across
# solver instances — reference-style sweeps create a fresh instance per
# point, e.g. Example3's 11x11 loop).
# ---------------------------------------------------------------------------

def _hp(fn):
    """Wrap a stage in highest matmul precision: the S-matrix algebra is
    precision-critical and TPU f32 matmuls default to bf16 passes."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision('highest'):
            return fn(*args, **kwargs)
    return wrapped


@functools.partial(jax.jit, static_argnames=('order',))
@_hp
def _jit_material_conv(grid, order):
    return fourier.material_conv_pair(grid, order)


@functools.partial(jax.jit, static_argnames=(
    'broadening', 'backend', 'stable_grad', 'avoid_pinv', 'max_pinv'))
@_hp
def _jit_patterned_layer(eps_conv, mu_conv, kx, ky, Vf_inv, omega, thickness,
                         broadening, backend, stable_grad, avoid_pinv,
                         max_pinv):
    P, Q = core.pq_matrices(eps_conv, mu_conv, kx, ky)
    kz, E = core.eigen_decomposition(P, Q, broadening, backend, stable_grad)
    sol, instability = core.layer_smatrix(
        E, kz, P, Q, Vf_inv, omega, thickness,
        avoid_pinv_instability=avoid_pinv, max_pinv_instability=max_pinv)
    return sol, instability


@jax.jit
@_hp
def _jit_homogeneous_layer(eps, mu, kx, ky, Vf, omega, thickness):
    return core.layer_smatrix_homogeneous(eps, mu, kx, ky, Vf, omega,
                                          thickness)


_jit_redheffer = jax.jit(_hp(core.redheffer_product))


def _is_scalar_like(v):
    """Homogeneity test mirroring rcwa.py:156-157."""
    if isinstance(v, (int, float, complex)):
        return True
    if isinstance(v, tuple) and len(v) == 2:      # explicit (re, im) pair
        return _is_scalar_like(v[0])
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
      output: 'auto' | 'complex' | 'pair' — extraction methods return
        complex arrays ('complex') or split-real (re, im) pairs ('pair');
        'auto' picks 'complex' on CPU and 'pair' on TPU.

    Broadening: with ``stable_eig_grad=True`` the eig backward uses
    ``Eig.broadening_parameter`` if the user changed it from the
    reference's default (1e-10), else the dtype-aware 'auto' value
    (1e-10 at float64, 1e-6 at float32 — 1e-10 is far below float32
    eigensolver noise and inflates gradients ~100x; see ops/eig.py).
    """

    def __init__(self, freq, order, L, *,
                 dtype=jnp.complex64,
                 device=None,
                 stable_eig_grad=True,
                 avoid_Pinv_instability=False,
                 max_Pinv_instability=0.005,
                 eig_backend='auto',
                 output='auto'):
        self._dtype = validate_sim_dtype(dtype)
        self._rdtype = real_dtype_of(self._dtype)
        self._device = device  # accepted for API compat; unused
        self.eig_backend = eig_backend

        if output == 'auto':
            output = 'complex' if jax.default_backend() == 'cpu' else 'pair'
        if output not in ('complex', 'pair'):
            warnings.warn('Invalid output mode. Set as complex.', UserWarning)
            output = 'complex'
        self._complex_out = output == 'complex'

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
        self.freq = freq
        self.omega = 2 * PI_REF * freq  # rcwa.py:61 uses the raw argument
        self.order = [int(order[0]), int(order[1])]
        self._order_t = (int(order[0]), int(order[1]))
        self.order_x = np.arange(-self.order[0], self.order[0] + 1)
        self.order_y = np.arange(-self.order[1], self.order[1] + 1)
        self.order_N = len(self.order_x) * len(self.order_y)
        self.L = L
        self.Gx_norm = 1 / (L[0] * freq)
        self.Gy_norm = 1 / (L[1] * freq)

        # Claddings default to free space (rcwa.py:74-78)
        self.eps_in = self._p(1.)
        self.mu_in = self._p(1.)
        self.eps_out = self._p(1.)
        self.mu_out = self._p(1.)
        self._has_input_layer = False
        self._has_output_layer = False

        # Internal layer state (rcwa.py:80-93)
        self.layer_N = 0
        self.thickness = []
        self.eps_conv, self.mu_conv = [], []
        self.layers = []          # list[core.LayerSolution]
        self._layer_is_bd = []    # True for homogeneous (bdp) layers

    # -- pair plumbing ------------------------------------------------------

    def _p(self, x):
        """Coerce user input (complex/real scalar or array, or an explicit
        (re, im) pair) to a cpair at the simulation's real dtype."""
        return cplx.to_pair(x, self._rdtype)

    def _out(self, pair):
        """User-boundary conversion: fuse to complex or return the pair."""
        if self._complex_out:
            return pair[0] + 1j * pair[1]
        return pair

    @property
    def _broadening(self):
        """Effective eig-backward broadening for this instance.

        Mirrors Eig.broadening_parameter (reference torch_eig.py:9) when
        the user changed it from the reference default; otherwise uses the
        dtype-aware 'auto' value (identical at float64, sane at float32)."""
        b = Eig.broadening_parameter
        return 'auto' if b == 1e-10 else b

    # -- setup ------------------------------------------------------------

    def add_input_layer(self, eps=1., mu=1.):
        """Set the semi-infinite input cladding (rcwa.py:95-107)."""
        self.eps_in = self._p(eps)
        self.mu_in = self._p(mu)
        self._has_input_layer = True
        self.Sin = []

    def add_output_layer(self, eps=1., mu=1.):
        """Set the semi-infinite output cladding (rcwa.py:109-121)."""
        self.eps_out = self._p(eps)
        self.mu_out = self._p(mu)
        self._has_output_layer = True
        self.Sout = []

    def set_incident_angle(self, inc_ang, azi_ang, angle_layer='input'):
        """Set incidence/azimuth (radians) and build k-vectors (rcwa.py:123-144)."""
        self.inc_ang = self._p(inc_ang)
        self.azi_ang = self._p(azi_ang)

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

        if is_eps_h:
            ep = self._p(eps)
            eye = jnp.eye(self.order_N, dtype=self._rdtype)
            eps_c = (ep[0] * eye, ep[1] * eye)
        else:
            eps_c = _jit_material_conv(self._p(eps), self._order_t)
        if is_mu_h:
            mp_ = self._p(mu)
            eye = jnp.eye(self.order_N, dtype=self._rdtype)
            mu_c = (mp_[0] * eye, mp_[1] * eye)
        else:
            mu_c = _jit_material_conv(self._p(mu), self._order_t)
        self.eps_conv.append(eps_c)
        self.mu_conv.append(mu_c)

        self.layer_N += 1
        self.thickness.append(thickness)

        if is_eps_h and is_mu_h:
            sol = _jit_homogeneous_layer(
                self._p(eps), self._p(mu),
                self.Kx_norm_dn, self.Ky_norm_dn, self.Vf, self.omega,
                thickness)
            self.layers.append(sol)
            self._layer_is_bd.append(True)
        else:
            sol, instability = _jit_patterned_layer(
                eps_c, mu_c, self.Kx_norm_dn, self.Ky_norm_dn, self.Vf_inv,
                self.omega, thickness,
                broadening=(self._broadening if self.stable_eig_grad
                            else 0.0),
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
        """Layer i's S blocks [S11, S21, S12, S22] as dense cpairs.

        Exploits S22 == S11 and S12 == S21 (see core.py docstring)."""
        sol = self.layers[i]
        if self._layer_is_bd[i]:
            s11 = bdp_dense(sol.S11)
            s21 = bdp_dense(sol.S21)
        else:
            s11, s21 = sol.S11, sol.S21
        return [s11, s21, s21, s11]

    def _dense_C(self, i):
        """Layer i's (Cf, Cb) as dense [4N, 2N] cpairs:
        Cf = [G; D], Cb = [D; G]."""
        sol = self.layers[i]
        if self._layer_is_bd[i]:
            G, D = bdp_dense(sol.G), bdp_dense(sol.D)
        else:
            G, D = sol.G, sol.D
        cat = lambda a, b: (jnp.concatenate([a[0], b[0]], axis=0),
                            jnp.concatenate([a[1], b[1]], axis=0))
        return (cat(G, D), cat(D, G))

    def solve_global_smatrix(self):
        """Fold all layer S-matrices plus claddings via Redheffer star
        products, propagating the mode-coupling matrices (rcwa.py:173-211)."""
        n2 = 2 * self.order_N
        if self.layer_N > 0:
            S = self._dense_S(0)
            C = [self._dense_C(0)]
        else:
            eye = cplx.ceye(n2, self._rdtype)
            zero = cplx.czeros((n2, n2), self._rdtype)
            S = [eye, zero, zero, eye]
            C = []

        for i in range(1, self.layer_N):
            Sn = self._dense_S(i)
            S_new, t1, t2 = _jit_redheffer(S, Sn)
            C = core.redheffer_update_modes(C, [self._dense_C(i)], S, Sn, t1, t2)
            S = S_new

        if self._has_input_layer:
            Sin = [bdp_dense(b) for b in self.Sin]
            S_new, t1, t2 = _jit_redheffer(Sin, S)
            C = core.redheffer_update_modes([], C, Sin, S, t1, t2)
            S = S_new

        if self._has_output_layer:
            Sout = [bdp_dense(b) for b in self.Sout]
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

        eps = self.eps_in if layer == 'input' else self.eps_out
        mu = self.mu_in if layer == 'input' else self.mu_out
        return core.diffraction_angles(self.Kx_norm_dn, self.Ky_norm_dn,
                                       eps, mu, orders, self.order, unit)

    def return_layer(self, layer_num, nx=100, ny=100):
        """Recover a layer's eps/mu spatial distributions from its truncated
        Fourier coefficients (rcwa.py:264-298).

        The reference scatters the conv-matrix coefficients into an [nx, ny]
        spectrum and ifft2s it; here the inverse DFT is two real matmuls on
        the (re, im) pair — identical values, no complex FFT needed."""
        return (self._out(core.conv_to_grid(self.eps_conv[layer_num],
                                            self.order, nx, ny)),
                self._out(core.conv_to_grid(self.mu_conv[layer_num],
                                            self.order, nx, ny)))

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

        def kz_c(eps, mu):
            return csqrt(csub(cmul(eps, mu),
                              cadd(cmul(Kx, Kx), cmul(Ky, Ky))))

        if polarization in ['xx', 'yx', 'xy', 'yy']:
            oi_p = oi + (N if polarization in ('yx', 'yy') else 0)
            ri_p = ri + (N if polarization in ('xy', 'yy') else 0)

            if power_norm:
                kz_in_c = kz_c(self.eps_in, self.mu_in)
                ev_in = jnp.abs(kz_in_c[0] / kz_in_c[1]) < evanscent
                kz_in = jnp.where(ev_in, 0., kz_in_c[0])
                kz_in = jnp.concatenate([kz_in, kz_in])

                kz_out_c = kz_c(self.eps_out, self.mu_out)
                ev_out = jnp.abs(kz_out_c[0] / kz_out_c[1]) < evanscent
                kz_out = jnp.where(ev_out, 0., kz_out_c[0])
                kz_out = jnp.concatenate([kz_out, kz_out])

                kxr = jnp.concatenate([Kx[0], Kx[0]])
                kyr = jnp.concatenate([Ky[0], Ky[0]])
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
            Sr = self.S[block][0][oi_p, ri_p] * norm
            Si = self.S[block][1][oi_p, ri_p] * norm
            bad = ~jnp.isfinite(Sr) | ~jnp.isfinite(Si)
            return self._out((jnp.where(bad, 0., Sr), jnp.where(bad, 0., Si)))

        else:  # ps-pol
            if direction == 'forward' and port == 'transmission':
                idx, o_sign, r_sign = 0, 1., 1.
                o_k2 = cmul(self.eps_out, self.mu_out)
                r_k2 = cmul(self.eps_in, self.mu_in)
            elif direction == 'forward' and port == 'reflection':
                idx, o_sign, r_sign = 1, -1., 1.
                o_k2 = cmul(self.eps_in, self.mu_in)
                r_k2 = cmul(self.eps_in, self.mu_in)
            elif direction == 'backward' and port == 'reflection':
                idx, o_sign, r_sign = 2, 1., -1.
                o_k2 = cmul(self.eps_out, self.mu_out)
                r_k2 = cmul(self.eps_out, self.mu_out)
            else:  # backward transmission
                idx, o_sign, r_sign = 3, -1., -1.
                o_k2 = cmul(self.eps_in, self.mu_in)
                r_k2 = cmul(self.eps_out, self.mu_out)

            def angles(sel, k2, sign):
                kxs = (Kx[0][sel], Kx[1][sel])
                kys = (Ky[0][sel], Ky[1][sel])
                kt = csqrt(cadd(cmul(kxs, kxs), cmul(kys, kys)))
                kzc = csqrt(csub(k2, cadd(cmul(kxs, kxs), cmul(kys, kys))))
                kz = sign * jnp.abs(kzc[0])
                evan = jnp.abs(kzc[0] / kzc[1]) < evanscent
                inc = jnp.arctan2(kt[0], kz)
                azi = jnp.arctan2(kys[0], kxs[0])
                return inc, azi, evan

            o_inc, o_azi, o_evan = angles(oi, o_k2, o_sign)
            r_inc, r_azi, r_evan = angles(ri, r_k2, r_sign)

            def gather(a, b):
                return self.S[idx][0][a, b], self.S[idx][1][a, b]

            zero_ev = lambda p: (jnp.where(o_evan, 0., p[0]),
                                 jnp.where(o_evan, 0., p[1]))
            xx = zero_ev(gather(oi, ri))
            xy = zero_ev(gather(oi, ri + N))
            yx = zero_ev(gather(oi + N, ri))
            yy = zero_ev(gather(oi + N, ri + N))

            co, so = jnp.cos(o_azi), jnp.sin(o_azi)
            ci = jnp.cos(o_inc)
            cr, sr = jnp.cos(r_azi), jnp.sin(r_azi)
            cri = jnp.cos(r_inc)
            # real coefficient recombination (angles are real; rcwa.py:466-485)
            coeff = {
                'pp': (co / ci * cri * cr, so / ci * cri * cr,
                       co / ci * cri * sr, so / ci * cri * sr),
                'ps': (co / ci * (-sr), so / ci * (-sr),
                       co / ci * cr, so / ci * cr),
                'sp': (-so * cri * cr, co * cri * cr,
                       -so * cri * sr, co * cri * sr),
                'ss': (-so * (-sr), co * (-sr), -so * cr, co * cr),
            }[polarization]
            Sr = (coeff[0] * xx[0] + coeff[1] * yx[0]
                  + coeff[2] * xy[0] + coeff[3] * yy[0])
            Si = (coeff[0] * xx[1] + coeff[1] * yx[1]
                  + coeff[2] * xy[1] + coeff[3] * yy[1])

            if power_norm:
                kz_in_c = kz_c(self.eps_in, self.mu_in)
                ev_in = jnp.abs(kz_in_c[0] / kz_in_c[1]) < evanscent
                kz_in = jnp.where(ev_in, 0., kz_in_c[0])
                kz_in = jnp.concatenate([kz_in, kz_in])

                # NB: the ps branch keeps |Re kz| for evanescent *output*
                # orders instead of zeroing them (rcwa.py:495) — replicated.
                kz_out_c = kz_c(self.eps_out, self.mu_out)
                ev_out = jnp.abs(kz_out_c[0] / kz_out_c[1]) < evanscent
                kz_out = jnp.where(ev_out, jnp.abs(kz_out_c[0]), kz_out_c[0])
                kz_out = jnp.concatenate([kz_out, kz_out])

                num_kz, den_kz = self._select_kz(direction, port, kz_in, kz_out)
                norm = jnp.sqrt(num_kz[oi] / den_kz[ri])
            else:
                norm = 1.

            bad = ~jnp.isfinite(Sr) | ~jnp.isfinite(Si)
            Sr = jnp.where(bad, 0., Sr) * norm
            Si = jnp.where(bad, 0., Si) * norm
            # Reference returns all-zero if the reference order is evanescent
            # (rcwa.py:462-464); jnp.where keeps this traceable.
            return self._out((jnp.where(r_evan, 0., Sr),
                              jnp.where(r_evan, 0., Si)))

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
        amp = self._p(np.asarray(amplitude, dtype=np.complex128)
                      if not isinstance(amplitude, (tuple, jnp.ndarray))
                      else amplitude)
        amp = (amp[0].reshape(-1, 2), amp[1].reshape(-1, 2))

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
        def scatter(comp):
            v = jnp.zeros((2 * N,), self._rdtype)
            v = v.at[idx].set(comp[:, 0])
            return v.at[idx + N].set(comp[:, 1])
        E_i = (scatter(amp[0]), scatter(amp[1]))

        if notation == 'ps':
            if direction == 'forward':
                eps, mu, sign = self.eps_in, self.mu_in, 1.
            else:
                eps, mu, sign = self.eps_out, self.mu_out, -1.
            Kx, Ky = self.Kx_norm_dn, self.Ky_norm_dn
            kt = csqrt(cadd(cmul(Kx, Kx), cmul(Ky, Ky)))
            kzc = csqrt(csub(cmul(eps, mu),
                             cadd(cmul(Kx, Kx), cmul(Ky, Ky))))
            kz = sign * jnp.abs(kzc[0])
            inc = jnp.arctan2(kt[0], kz)
            azi = jnp.arctan2(Ky[0], Kx[0])
            # ps->xy block-diagonal conversion (rcwa.py:589-594); the
            # conversion matrix is real-valued (angles are real)
            ps2xy_re = jnp.stack([
                jnp.stack([jnp.cos(inc) * jnp.cos(azi), -jnp.sin(azi)]),
                jnp.stack([jnp.cos(inc) * jnp.sin(azi), jnp.cos(azi)]),
            ]).astype(self._rdtype)
            ps2xy = (ps2xy_re, jnp.zeros_like(ps2xy_re))
            E_i = bdp_apply(ps2xy, E_i)

        self.E_i_pair = (E_i[0].reshape(-1, 1), E_i[1].reshape(-1, 1))

    @property
    def E_i(self):
        """Incident Fourier amplitude vector, at the output convention."""
        return self._out(self.E_i_pair)

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
        S-matrices (rcwa.py:1124-1181), all cpairs/bdps."""
        if self.angle_layer == 'input':
            n_med = csqrt(cmul(self.eps_in, self.mu_in))[0]
        else:
            n_med = csqrt(cmul(self.eps_out, self.mu_out))[0]
        n_med = (n_med, jnp.zeros_like(n_med))
        kx0 = cmul(n_med, cmul(csin(self.inc_ang), ccos(self.azi_ang)))
        ky0 = cmul(n_med, cmul(csin(self.inc_ang), csin(self.azi_ang)))
        self.kx0_norm = kx0
        self.ky0_norm = ky0

        ox = jnp.asarray(self.order_x, self._rdtype)
        oy = jnp.asarray(self.order_y, self._rdtype)
        kx = (kx0[0] + ox * self.Gx_norm, kx0[1] + jnp.zeros_like(ox))
        ky = (ky0[0] + oy * self.Gy_norm, ky0[1] + jnp.zeros_like(oy))
        kxg_r, kyg_r = jnp.meshgrid(kx[0], ky[0], indexing='ij')
        kxg_i, kyg_i = jnp.meshgrid(kx[1], ky[1], indexing='ij')
        self.Kx_norm_dn = (kxg_r.reshape(-1), kxg_i.reshape(-1))
        self.Ky_norm_dn = (kyg_r.reshape(-1), kyg_i.reshape(-1))

        one = self._p(1.)
        kz_f = core.kz_conj_branch(one, self.Kx_norm_dn, self.Ky_norm_dn)
        self.Vf = core.vmat(self.Kx_norm_dn, self.Ky_norm_dn, kz_f)
        self.Vf_inv = bdp_inv(self.Vf)

        if self._has_input_layer:
            kz_i = core.kz_conj_branch(cmul(self.eps_in, self.mu_in),
                                       self.Kx_norm_dn, self.Ky_norm_dn)
            self.Vi = core.vmat(self.Kx_norm_dn, self.Ky_norm_dn, kz_i)
            self.Sin = core.interface_smatrix_in(self.Vf, self.Vi)

        if self._has_output_layer:
            kz_o = core.kz_conj_branch(cmul(self.eps_out, self.mu_out),
                                       self.Kx_norm_dn, self.Ky_norm_dn)
            self.Vo = core.vmat(self.Kx_norm_dn, self.Ky_norm_dn, kz_o)
            self.Sout = core.interface_smatrix_out(self.Vf, self.Vo)
