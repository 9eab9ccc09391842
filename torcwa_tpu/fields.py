"""Field reconstruction on xz / yz / xy planes, split-real.

Unifies the reference's three ~180-line near-clone methods
(/root/reference/torcwa/rcwa.py:598-775, 777-957, 959-1112) into one
layer-segment engine:

* z samples are grouped into contiguous runs belonging to one region
  (input cladding / internal layer i / output cladding) — concrete
  (numpy) control flow, exactly the reference's per-z branching.
* per run, the Fourier-domain fields of *all* its z samples are computed
  with a single [2N, 2N] x [2N, nz] matmul against the mode-phase matrix
  (the reference loops over z and does per-z 2N x 2N matmuls; regrouping
  by associativity gives identical values, MXU-batched).
* the spatial field is synthesized with a dense DFT matmul
  [npts, N] @ [N, nz] — same explicit (non-FFT) synthesis semantics as
  the reference (rcwa.py:699-705), which supports arbitrary sample axes.

All complex quantities are (re, im) cpairs (see ops/cplx.py), so the whole
reconstruction lowers on the TPU runtime.  Outputs go through the solver's
output convention (complex on CPU, pairs on TPU).

Field reconstruction takes concrete (non-traced) z/x/y axes — it is a
post-processing step, not part of the differentiable solve path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .core import bdp_apply, bdp_dense
from .ops import cplx
from .ops.cplx import cadd, csub, cneg, cmul, cdiv_raw, cmm, csqrt, scale_cols

__all__ = ['field_plane', 'field_xy', 'fmm_field_adapter']


class _LayerView:
    """Minimal per-layer view (duck-types solver LayerSolution fields)."""

    def __init__(self, E, H, kz):
        self.E_eigvec = E
        self.H_eigvec = H
        self.kz = kz


class fmm_field_adapter:
    """Field-reconstruction context over solve_stack_pair outputs.

    Duck-types the solver attributes the field engine reads, so
    :func:`field_plane` / :func:`field_xy` run unchanged on the
    functional (vmap/shard_map-able) path.  Mirrors the data flow of the
    reference's field methods (rcwa.py:598-1112) without the class state.

    Args:
      spec: the StackSpec the stack was solved with.
      S: global S blocks from solve_stack_pair.
      internals: its internals dict — requires ``with_modes=True`` (the
        'C' mode-coupling entry) for stacks with layers.
      E_i: incident amplitude cpair of shape [2N] or [2N, 1] (e.g. from
        :func:`torcwa_tpu.fmm.source_planewave_pair`).
      thicknesses: CONCRETE layer thicknesses (floats; the z-segment
        assignment is host-side control flow, exactly like the
        reference's per-z branching) — not traced.
      omega: 2*pi*freq (may be traced, e.g. under a wavelength vmap).
      eps_in/mu_in/eps_out/mu_out: cladding scalar cpairs (None -> 1
        where applicable; eps defaults to free space).
      source_direction: 'forward' | 'backward'.
    """

    def __init__(self, spec, S, internals, E_i, thicknesses, omega,
                 eps_in=None, mu_in=None, eps_out=None, mu_out=None,
                 source_direction='forward'):
        kx = internals['kx']
        rdtype = kx.dtype
        one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
        N = kx.shape[0]
        self.order_N = N
        self.omega = omega
        self._rdtype = rdtype
        self.Kx_norm_dn = (kx, jnp.zeros_like(kx))
        self.Ky_norm_dn = (internals['ky'], jnp.zeros_like(kx))
        ei = (jnp.reshape(E_i[0], (-1, 1)), jnp.reshape(E_i[1], (-1, 1)))
        self.E_i_pair = ei
        self.eps_in = eps_in if eps_in is not None else one
        self.mu_in = mu_in if mu_in is not None else one
        self.eps_out = eps_out if eps_out is not None else one
        self.mu_out = mu_out if mu_out is not None else one
        self.Vf = internals['Vf']
        self._has_input_layer = spec.has_input
        self._has_output_layer = spec.has_output
        if spec.has_input:
            self.Vi = internals['Vi']
        if spec.has_output:
            self.Vo = internals['Vo']
        self.S = S
        self.source_direction = source_direction
        self.layer_N = spec.n_layers
        self.thickness = [float(t) for t in np.asarray(thicknesses)]
        if spec.n_layers:
            if 'C' not in internals:
                raise ValueError(
                    'field reconstruction over internal layers needs '
                    'solve_stack_pair(..., with_modes=True)')
            self.C = internals['C']
            take = lambda tree, i: jax.tree.map(lambda x: x[i], tree)
            self.layers = [
                _LayerView(take(internals['E'], i), take(internals['H'], i),
                           take(internals['kz'], i))
                for i in range(spec.n_layers)]
            self.eps_conv = [take(internals['conv'], i)
                             for i in range(spec.n_layers)]
            self.mu_conv = [take(internals['mu_conv'], i)
                            for i in range(spec.n_layers)]
            self._layer_is_bd = [False] * spec.n_layers

    def _out(self, pair):
        return pair


def _zphase(kz, omega, z):
    """exp(1j * omega * kz * z) as a cpair [len(kz), len(z)]."""
    th_r = omega * kz[0][:, None] * z[None, :]
    th_i = omega * kz[1][:, None] * z[None, :]
    return cplx.cexp_i((th_r, th_i))


def _region_fourier_fields(sim, region, z_prop):
    """Fourier-domain fields for all z samples inside one region.

    Args:
      sim: the rcwa instance (solved, with a source set).
      region: -1 (input cladding), sim.layer_N (output cladding), or an
        internal layer index.
      z_prop: (nz,) float array of propagation distances within the region
        (already referenced to the region's own boundary, clamped like the
        reference does).

    Returns:
      cpair of [6, N, nz]: (Ex, Ey, Ez, Hx, Hy, Hz) Fourier coefficients.
    """
    N = sim.order_N
    omega = sim.omega
    Kx, Ky = sim.Kx_norm_dn, sim.Ky_norm_dn
    z_prop = jnp.asarray(z_prop, sim._rdtype)
    nz = z_prop.shape[0]
    E_i = sim.E_i_pair  # cpair [2N, 1]

    Kxc = (Kx[0][:, None], Kx[1][:, None])
    Kyc = (Ky[0][:, None], Ky[1][:, None])

    if region == -1 or region == sim.layer_N:
        k2 = lambda e, m: csub(cmul(e, m),
                               cadd(cmul(Kx, Kx), cmul(Ky, Ky)))
        if region == -1:
            eps, mu = sim.eps_in, sim.mu_in
            V = sim.Vi if sim._has_input_layer else sim.Vf
            kz = csqrt(k2(eps, mu))
            # input cladding keeps the Im(kz) <= 0 branch (rcwa.py:650)
            kz = (kz[0], -jnp.abs(kz[1]))
        else:
            eps, mu = sim.eps_out, sim.mu_out
            V = sim.Vo if sim._has_output_layer else sim.Vf
            kz = csqrt(k2(eps, mu))
            kz = (kz[0], jnp.abs(kz[1]))

        kz2 = (jnp.concatenate([kz[0], kz[0]]),
               jnp.concatenate([kz[1], kz[1]]))
        z_phase = _zphase(kz2, omega, z_prop)          # [2N, nz]
        z_conj = (z_phase[0], -z_phase[1])

        zero = cplx.czeros((2 * N, nz), sim._rdtype)
        fwd = sim.source_direction == 'forward'
        if region == -1 and fwd:
            Exy_p = cmul(E_i, z_phase)
            Exy_m = cmul(cmm(sim.S[1], E_i), z_conj)
            Hxy_p = bdp_apply(V, Exy_p)
            Hxy_m = cneg(bdp_apply(V, Exy_m))
        elif region == -1:
            Exy_p = zero
            Hxy_p = zero
            Exy_m = cmul(cmm(sim.S[3], E_i), z_conj)
            Hxy_m = cneg(bdp_apply(V, Exy_m))
        elif fwd:
            Exy_p = cmul(cmm(sim.S[0], E_i), z_phase)
            Hxy_p = bdp_apply(V, Exy_p)
            Exy_m = zero
            Hxy_m = zero
        else:
            Exy_p = cmul(cmm(sim.S[2], E_i), z_phase)
            Hxy_p = bdp_apply(V, Exy_p)
            Exy_m = cmul(E_i, z_conj)
            Hxy_m = cneg(bdp_apply(V, Exy_m))

        take = lambda p, sl: (p[0][sl], p[1][sl])
        Ex = cadd(take(Exy_p, slice(None, N)), take(Exy_m, slice(None, N)))
        Ey = cadd(take(Exy_p, slice(N, None)), take(Exy_m, slice(N, None)))
        Hx = cadd(take(Hxy_p, slice(None, N)), take(Hxy_m, slice(None, N)))
        Hy = cadd(take(Hxy_p, slice(N, None)), take(Hxy_m, slice(N, None)))
        Hz = cdiv_raw(csub(cmul(Kxc, Ey), cmul(Kyc, Ex)), mu)
        Ez = cdiv_raw(csub(cmul(Kyc, Hx), cmul(Kxc, Hy)), eps)
        return (jnp.stack([Ex[0], Ey[0], Ez[0], Hx[0], Hy[0], Hz[0]]),
                jnp.stack([Ex[1], Ey[1], Ez[1], Hx[1], Hy[1], Hz[1]]))

    # --- internal layer ---------------------------------------------------
    lay = sim.layers[region]
    thick = sim.thickness[region]
    cf, cb = sim.C[region]
    Csel = cf if sim.source_direction == 'forward' else cb
    c = cmm(Csel, E_i)                          # [4N, 1]
    cp = (c[0][:2 * N, 0], c[1][:2 * N, 0])
    cm = (c[0][2 * N:, 0], c[1][2 * N:, 0])

    E = bdp_dense(lay.E_eigvec) if sim._layer_is_bd[region] else lay.E_eigvec
    H = bdp_dense(lay.H_eigvec) if sim._layer_is_bd[region] else lay.H_eigvec
    kz = lay.kz

    pp = _zphase(kz, omega, z_prop)                           # [2N, nz]
    pm = _zphase(kz, omega, jnp.asarray(thick, sim._rdtype) - z_prop)

    Exy = cadd(cmm(scale_cols(E, cp), pp), cmm(scale_cols(E, cm), pm))
    Hxy = csub(cmm(scale_cols(H, cp), pp), cmm(scale_cols(H, cm), pm))

    einv = cplx.cinv(sim.eps_conv[region])
    minv = cplx.cinv(sim.mu_conv[region])

    take = lambda p, sl: (p[0][sl], p[1][sl])
    Ex, Ey = take(Exy, slice(None, N)), take(Exy, slice(N, None))
    Hx, Hy = take(Hxy, slice(None, N)), take(Hxy, slice(N, None))
    Hz = cmm(minv, csub(cmul(Kxc, Ey), cmul(Kyc, Ex)))
    Ez = cmm(einv, csub(cmul(Kyc, Hx), cmul(Kxc, Hy)))
    return (jnp.stack([Ex[0], Ey[0], Ez[0], Hx[0], Hy[0], Hz[0]]),
            jnp.stack([Ex[1], Ey[1], Ez[1], Hx[1], Hy[1], Hz[1]]))


def _layer_segments(sim, z_axis):
    """Assign each z sample to a region and split into contiguous runs.

    Matches rcwa.py:624-634: region -1 for z < 0; crossing each cumulative
    boundary zp (strictly >) increments the region index.
    """
    z = np.asarray(z_axis, dtype=np.float64).reshape(-1)
    thick = np.array([float(t) for t in sim.thickness], dtype=np.float64)
    zp = np.cumsum(thick)
    zm = np.concatenate([[0.0], zp[:-1]]) if len(zp) else np.zeros((0,))
    region = np.zeros(len(z), dtype=np.int64)
    region[z < 0.] = -1
    for b in zp:
        region[z > b] += 1

    # z_prop per sample, replicating the reference's clamping
    z_prop = np.zeros_like(z)
    for i, (zi, r) in enumerate(zip(z, region)):
        if r == -1:
            z_prop[i] = zi if zi <= 0. else 0.
        elif r == sim.layer_N:
            if len(zp) == 0:
                z_prop[i] = zi
            else:
                z_prop[i] = max(zi - zp[-1], 0.)
        else:
            z_prop[i] = zi - zm[r]

    # contiguous runs
    runs = []
    start = 0
    for i in range(1, len(z) + 1):
        if i == len(z) or region[i] != region[start]:
            runs.append((int(region[start]), start, i))
            start = i
    return runs, z_prop


def _synth(phase, f_mn):
    """Spatial synthesis einsum('tn,fnz->ftz') on cpairs."""
    f = lambda a, b: jnp.einsum('tn,fnz->ftz', a, b)
    return (f(phase[0], f_mn[0]) - f(phase[1], f_mn[1]),
            f(phase[0], f_mn[1]) + f(phase[1], f_mn[0]))


def field_plane(sim, plane, t_axis, z_axis, fixed):
    """Fields on an xz or yz plane.

    Args:
      sim: solved rcwa instance with a source.
      plane: 'xz' (t_axis = x, fixed = y) or 'yz' (t_axis = y, fixed = x).
      t_axis: transverse sampling coordinates.
      z_axis: z sampling coordinates.
      fixed: the fixed transverse coordinate.

    Returns:
      ([Ex, Ey, Ez], [Hx, Hy, Hz]) each [len(t_axis), len(z_axis)], at the
      solver's output convention (complex arrays or (re, im) pairs).
    """
    t = jnp.asarray(np.asarray(t_axis).reshape(-1), sim._rdtype)
    runs, z_prop = _layer_segments(sim, z_axis)

    Kx, Ky = sim.Kx_norm_dn, sim.Ky_norm_dn
    if plane == 'xz':
        th = (Kx[0][None, :] * t[:, None] + Ky[0][None, :] * fixed,
              Kx[1][None, :] * t[:, None] + Ky[1][None, :] * fixed)
    elif plane == 'yz':
        th = (Kx[0][None, :] * fixed + Ky[0][None, :] * t[:, None],
              Kx[1][None, :] * fixed + Ky[1][None, :] * t[:, None])
    else:
        raise ValueError(f'Unknown plane {plane!r}')
    xy_phase = cplx.cexp_i((sim.omega * th[0], sim.omega * th[1]))

    chunks = []
    for (region, i0, i1) in runs:
        f_mn = _region_fourier_fields(sim, region, z_prop[i0:i1])
        chunks.append(_synth(xy_phase, f_mn))
    if len(chunks) > 1:
        out = (jnp.concatenate([c[0] for c in chunks], axis=2),
               jnp.concatenate([c[1] for c in chunks], axis=2))
    else:
        out = chunks[0]
    comp = lambda f: sim._out((out[0][f], out[1][f]))
    return [comp(0), comp(1), comp(2)], [comp(3), comp(4), comp(5)]


def field_xy(sim, layer_num, x_axis, y_axis, z_prop=0.):
    """Fields on an xy plane at one z inside a chosen region (rcwa.py:959-1112)."""
    import warnings
    if not isinstance(layer_num, int):
        warnings.warn('Parameter "layer_num" must be int type. Return None.', UserWarning)
        return None
    if layer_num < -1 or layer_num > sim.layer_N:
        warnings.warn('Layer number is out of range. Return None.', UserWarning)
        return None

    if layer_num == -1:
        z_prop = z_prop if z_prop <= 0. else 0.
    elif layer_num == sim.layer_N:
        z_prop = z_prop if z_prop >= 0. else 0.

    f = _region_fourier_fields(sim, layer_num, np.array([z_prop]))
    f_mn = (f[0][:, :, 0], f[1][:, :, 0])        # cpair [6, N]

    x = jnp.asarray(np.asarray(x_axis).reshape(-1), sim._rdtype)
    y = jnp.asarray(np.asarray(y_axis).reshape(-1), sim._rdtype)
    Kx, Ky = sim.Kx_norm_dn, sim.Ky_norm_dn
    phase_x = cplx.cexp_i((sim.omega * Kx[0][None, :] * x[:, None],
                           sim.omega * Kx[1][None, :] * x[:, None]))  # [nx, N]
    phase_y = cplx.cexp_i((sim.omega * Ky[0][None, :] * y[:, None],
                           sim.omega * Ky[1][None, :] * y[:, None]))  # [ny, N]

    # out = einsum('xn,fn,yn->fxy') on cpairs: (px * f) then contract with py
    def e3(a, b, c):
        return jnp.einsum('xn,fn,yn->fxy', a, b, c)
    pr, pi = phase_x
    fr, fi = f_mn
    qr, qi = phase_y
    # (p*f) complex product then times q: expand the triple product
    out_r = (e3(pr, fr, qr) - e3(pi, fi, qr)
             - e3(pr, fi, qi) - e3(pi, fr, qi))
    out_i = (e3(pr, fr, qi) - e3(pi, fi, qi)
             + e3(pr, fi, qr) + e3(pi, fr, qr))
    comp = lambda k: sim._out((out_r[k], out_i[k]))
    return [comp(0), comp(1), comp(2)], [comp(3), comp(4), comp(5)]
