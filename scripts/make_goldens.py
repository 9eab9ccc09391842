"""Generate golden test data by running the PyTorch reference on CPU.

Reads the reference implementation at /root/reference (read-only) and dumps
pinned small-order results into tests/golden/*.npz.  Run once; the .npz
files are committed so the test suite does not need torch at test time.

Usage:  python scripts/make_goldens.py
"""

import os
import sys

import numpy as np
import torch

REF = '/root/reference'
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, 'example'))

import torcwa  # noqa: E402  (the reference package)

OUT = os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden')
os.makedirs(OUT, exist_ok=True)

DEV = torch.device('cpu')
C64 = torch.complex64
C128 = torch.complex128
F32 = torch.float32
F64 = torch.float64

SUBSTRATE_EPS = 1.46 ** 2


def silicon_eps(lamb0, f64=False):
    """a-Si:H eps at wavelength lamb0 (nm) via the reference's material table."""
    cwd = os.getcwd()
    os.chdir(os.path.join(REF, 'example'))
    try:
        import Materials
        lam = torch.tensor(float(lamb0), dtype=F64 if f64 else F32)
        nk = Materials.aSiH.apply(lam)
        return complex(nk.numpy()) ** 2
    finally:
        os.chdir(cwd)


def rect_grid(nx, ny, Lx, Ly, Wx, Wy, theta=0.0, sharp=1000., f64=False):
    torcwa.rcwa_geo.dtype = F64 if f64 else F32
    torcwa.rcwa_geo.device = DEV
    torcwa.rcwa_geo.Lx = Lx
    torcwa.rcwa_geo.Ly = Ly
    torcwa.rcwa_geo.nx = nx
    torcwa.rcwa_geo.ny = ny
    torcwa.rcwa_geo.edge_sharpness = sharp
    return torcwa.rcwa_geo.rectangle(Wx=Wx, Wy=Wy, Cx=Lx / 2., Cy=Ly / 2., theta=theta)


def circle_grid(nx, ny, Lx, Ly, R, sharp=500., f64=False):
    torcwa.rcwa_geo.dtype = F64 if f64 else F32
    torcwa.rcwa_geo.device = DEV
    torcwa.rcwa_geo.Lx = Lx
    torcwa.rcwa_geo.Ly = Ly
    torcwa.rcwa_geo.nx = nx
    torcwa.rcwa_geo.ny = ny
    torcwa.rcwa_geo.edge_sharpness = sharp
    return torcwa.rcwa_geo.circle(R=R, Cx=Lx / 2., Cy=Ly / 2.)


def t2n(x):
    return x.detach().cpu().numpy()


def golden_example0():
    """Fresnel sweep (Example0 pattern): interface only, ps-pol S-params."""
    L = [300., 300.]
    lamb0 = 532.
    angles = np.linspace(0., 89., 90) * np.pi / 180
    out = {k: [] for k in ['r_pp', 'r_ss', 't_pp', 't_ss']}
    for ia in angles:
        sim = torcwa.rcwa(freq=1 / lamb0, order=[7, 7], L=L, dtype=C64, device=DEV)
        sim.add_input_layer(eps=SUBSTRATE_EPS)
        sim.set_incident_angle(inc_ang=float(ia), azi_ang=0.)
        sim.solve_global_smatrix()
        for pol, port, key in [('pp', 'reflection', 'r_pp'), ('ss', 'reflection', 'r_ss'),
                               ('pp', 'transmission', 't_pp'), ('ss', 'transmission', 't_ss')]:
            out[key].append(t2n(sim.S_parameters(orders=[0, 0], direction='forward',
                                                 port=port, polarization=pol,
                                                 ref_order=[0, 0]))[0])
    np.savez(os.path.join(OUT, 'example0.npz'), angles=angles,
             **{k: np.array(v) for k, v in out.items()})
    print('example0 done')


def golden_example1():
    """Rectangular meta-atom (Example1 pattern) at small order, 3 wavelengths.

    Saves S-params (several orders/pols/directions), diffraction angles,
    layer recovery, and field slices."""
    L = [300., 300.]
    order = [5, 5]
    geom = rect_grid(256, 256, L[0], L[1], Wx=180., Wy=100.)
    lambs = [400., 532., 700.]
    entries = {}
    for il, lamb0 in enumerate(lambs):
        si_eps = silicon_eps(lamb0)
        layer_eps = geom * si_eps + (1. - geom)
        sim = torcwa.rcwa(freq=1 / lamb0, order=order, L=L, dtype=C64, device=DEV)
        sim.add_input_layer(eps=SUBSTRATE_EPS)
        sim.set_incident_angle(inc_ang=0., azi_ang=0.)
        sim.add_layer(thickness=300., eps=layer_eps)
        sim.solve_global_smatrix()
        orders = [[0, 0], [1, 0], [0, 1], [-1, 0], [1, 1], [2, 0]]
        for pol in ['xx', 'yy', 'xy', 'yx']:
            entries[f't{pol}_{il}'] = t2n(sim.S_parameters(
                orders=orders, direction='forward', port='transmission',
                polarization=pol, ref_order=[0, 0]))
            entries[f'r{pol}_{il}'] = t2n(sim.S_parameters(
                orders=orders, direction='forward', port='reflection',
                polarization=pol, ref_order=[0, 0]))
        entries[f'tb_xx_{il}'] = t2n(sim.S_parameters(
            orders=orders, direction='backward', port='transmission',
            polarization='xx', ref_order=[0, 0]))
        entries[f'rb_xx_{il}'] = t2n(sim.S_parameters(
            orders=orders, direction='backward', port='reflection',
            polarization='xx', ref_order=[0, 0]))
        if il == 1:
            inc, azi = sim.diffraction_angle(orders, layer='output', unit='radian')
            entries['diff_inc'] = t2n(inc)
            entries['diff_azi'] = t2n(azi)
            eps_rec, mu_rec = sim.return_layer(0, nx=64, ny=64)
            entries['eps_recover'] = t2n(eps_rec)
            # fields at 532nm
            sim.source_planewave(amplitude=[1., 0.], direction='forward')
            x = torch.linspace(0., L[0], 24)
            y = torch.linspace(0., L[1], 20)
            z = torch.linspace(-200., 500., 29)
            E, H = sim.field_xz(x, z, L[1] / 2)
            entries['fxz_E'] = np.stack([t2n(c) for c in E])
            entries['fxz_H'] = np.stack([t2n(c) for c in H])
            E, H = sim.field_yz(y, z, L[0] / 2)
            entries['fyz_E'] = np.stack([t2n(c) for c in E])
            entries['fyz_H'] = np.stack([t2n(c) for c in H])
            E, H = sim.field_xy(0, x, y, z_prop=150.)
            entries['fxy_E'] = np.stack([t2n(c) for c in E])
            entries['fxy_H'] = np.stack([t2n(c) for c in H])
            E, H = sim.field_xy(-1, x, y, z_prop=-50.)
            entries['fxy_in_E'] = np.stack([t2n(c) for c in E])
            E, H = sim.field_xy(1, x, y, z_prop=100.)
            entries['fxy_out_E'] = np.stack([t2n(c) for c in E])
            # backward source fields
            sim.source_planewave(amplitude=[0., 1.], direction='backward')
            E, H = sim.field_xz(x, z, L[1] / 2)
            entries['fxz_bwd_E'] = np.stack([t2n(c) for c in E])
            entries['fxz_bwd_H'] = np.stack([t2n(c) for c in H])
    entries['geom'] = t2n(geom)
    entries['lambs'] = np.array(lambs)
    np.savez(os.path.join(OUT, 'example1.npz'), **entries)
    print('example1 done')


def golden_example2():
    """Square meta-atom, oblique incidence (Example2 pattern), ps-pol source."""
    L = [300., 300.]
    order = [4, 4]
    lamb0 = 532.
    si_eps = silicon_eps(lamb0)
    geom = rect_grid(256, 256, L[0], L[1], Wx=120., Wy=120.)
    layer_eps = geom * si_eps + (1. - geom)
    sim = torcwa.rcwa(freq=1 / lamb0, order=order, L=L, dtype=C64, device=DEV)
    sim.add_input_layer(eps=SUBSTRATE_EPS)
    sim.add_output_layer(eps=1.2 ** 2)
    sim.set_incident_angle(inc_ang=15. * np.pi / 180, azi_ang=20. * np.pi / 180)
    sim.add_layer(thickness=300., eps=layer_eps)
    sim.solve_global_smatrix()
    entries = {}
    orders = [[0, 0], [1, 0], [0, -1]]
    for pol in ['xx', 'yy', 'pp', 'ss', 'ps', 'sp']:
        entries[f't{pol}'] = t2n(sim.S_parameters(orders=orders, direction='forward',
                                                  port='transmission', polarization=pol,
                                                  ref_order=[0, 0]))
        entries[f'r{pol}'] = t2n(sim.S_parameters(orders=orders, direction='forward',
                                                  port='reflection', polarization=pol,
                                                  ref_order=[0, 0]))
    # ps-notation source + fields
    sim.source_planewave(amplitude=[1., 0.5j], direction='forward', notation='ps')
    entries['E_i'] = t2n(sim.E_i)
    x = torch.linspace(0., L[0], 16)
    z = torch.linspace(-100., 400., 11)
    E, H = sim.field_xz(x, z, L[1] / 2)
    entries['fxz_E'] = np.stack([t2n(c) for c in E])
    entries['fxz_H'] = np.stack([t2n(c) for c in H])
    np.savez(os.path.join(OUT, 'example2.npz'), **entries)
    print('example2 done')


def golden_example1_1():
    """Six-layer stack (Example1-1 pattern) at order [3,3]."""
    L = [300., 300.]
    order = [3, 3]
    lamb0 = 650.
    si_eps = silicon_eps(lamb0)
    SU8_eps = 1.6 ** 2
    g0 = rect_grid(256, 256, L[0], L[1], 180., 100., theta=0.)
    g2 = rect_grid(256, 256, L[0], L[1], 180., 100., theta=30 / 180 * np.pi)
    g4 = rect_grid(256, 256, L[0], L[1], 180., 100., theta=60 / 180 * np.pi)
    sim = torcwa.rcwa(freq=1 / lamb0, order=order, L=L, dtype=C64, device=DEV)
    sim.add_input_layer(eps=SUBSTRATE_EPS)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    for g, t in [(g0, 200.), (None, 100.), (g2, 200.), (None, 100.), (g4, 200.), (None, 100.)]:
        if g is None:
            sim.add_layer(thickness=t, eps=SU8_eps)
        else:
            sim.add_layer(thickness=t, eps=g * si_eps + (1. - g) * SU8_eps)
    sim.solve_global_smatrix()
    entries = {}
    for pol in ['xx', 'yx', 'xy', 'yy']:
        entries[f't{pol}'] = t2n(sim.S_parameters(orders=[0, 0], direction='forward',
                                                  port='transmission', polarization=pol,
                                                  ref_order=[0, 0]))
    # internal fields across the stack (exercises per-layer C propagation)
    sim.source_planewave(amplitude=[1., 1.j], direction='forward')
    x = torch.linspace(0., L[0], 12)
    z = torch.linspace(-100., 1000., 23)
    E, H = sim.field_xz(x, z, L[1] / 2)
    entries['fxz_E'] = np.stack([t2n(c) for c in E])
    entries['fxz_H'] = np.stack([t2n(c) for c in H])
    np.savez(os.path.join(OUT, 'example1_1.npz'), **entries)
    print('example1_1 done')



def golden_magnetic():
    """Magnetic materials: mu != 1 claddings, a homogeneous mu layer, and a
    layer with BOTH patterned eps and patterned mu — exercises the full-mu
    P/Q path (reference rcwa.py:1226-1232) and mu conv matrices
    (rcwa.py:159-160), which no reference example covers."""
    L = [300., 300.]
    order = [3, 3]
    lamb0 = 620.
    geom = rect_grid(192, 192, L[0], L[1], Wx=150., Wy=110., theta=0.3)
    layer_eps = geom * (4.2 + 0.25j) + (1. - geom)
    layer_mu = geom * (1.8 + 0.05j) + (1. - geom) * 1.1
    sim = torcwa.rcwa(freq=1 / lamb0, order=order, L=L, dtype=C64, device=DEV)
    sim.add_input_layer(eps=SUBSTRATE_EPS, mu=1.2)
    sim.add_output_layer(eps=1.1 ** 2, mu=0.9)
    sim.set_incident_angle(inc_ang=10. * np.pi / 180, azi_ang=35. * np.pi / 180)
    sim.add_layer(thickness=180., eps=2.25, mu=1.6)        # homogeneous mu
    sim.add_layer(thickness=240., eps=layer_eps, mu=layer_mu)
    sim.solve_global_smatrix()
    entries = {}
    orders = [[0, 0], [1, 0], [0, -1], [1, 1]]
    for pol in ['xx', 'yy', 'xy', 'yx', 'pp', 'ss']:
        for port, pre in [('transmission', 't'), ('reflection', 'r')]:
            entries[f'{pre}{pol}'] = t2n(sim.S_parameters(
                orders=orders, direction='forward', port=port,
                polarization=pol, ref_order=[0, 0]))
    sim.source_planewave(amplitude=[1., 0.3], direction='forward')
    x = torch.linspace(0., L[0], 12)
    z = torch.linspace(-100., 520., 15)
    E, H = sim.field_xz(x, z, L[1] / 2)
    entries['fxz_E'] = np.stack([t2n(c) for c in E])
    entries['fxz_H'] = np.stack([t2n(c) for c in H])
    np.savez(os.path.join(OUT, 'magnetic.npz'), **entries)
    print('magnetic done')


def golden_example4():
    """Gradient goldens (Example4 pattern): dT/dR via torch autograd at
    complex128, exact + broadened variants, plus central differences."""
    L = [300., 300.]
    order = [4, 4]
    lamb0 = 473.
    SiN_eps = 2.0709 ** 2
    radii = np.array([88., 95., 102.])
    entries = {'R': radii}

    def solve_T(R_t, stable, broadening=None):
        if broadening is not None:
            torcwa.Eig.broadening_parameter = broadening
        sim = torcwa.rcwa(freq=1 / lamb0, order=order, L=L, dtype=C128, device=DEV,
                          stable_eig_grad=stable)
        sim.add_input_layer(eps=SUBSTRATE_EPS)
        sim.set_incident_angle(inc_ang=0., azi_ang=0.)
        g = circle_grid(400, 400, L[0], L[1], R_t, sharp=500., f64=True)
        eps = g * SiN_eps + (1. - g)
        sim.add_layer(thickness=600., eps=eps)
        sim.solve_global_smatrix()
        txx = sim.S_parameters(orders=[0, 0], direction='forward',
                               port='transmission', polarization='xx',
                               ref_order=[0, 0])
        return torch.abs(txx) ** 2

    # values + exact autograd + broadened autograd
    for name, stable, brd in [('exact', False, None), ('broad', True, 1e-10)]:
        grads, vals = [], []
        for R in radii:
            R_t = torch.tensor(R, dtype=F64, requires_grad=True)
            T = solve_T(R_t, stable, brd)
            T.backward()
            vals.append(float(T.detach()))
            grads.append(float(R_t.grad))
        entries[f'T_{name}'] = np.array(vals)
        entries[f'dTdR_{name}'] = np.array(grads)

    # central differences (ground truth)
    dR = 0.01
    fd = []
    for R in radii:
        Tp = float(solve_T(torch.tensor(R + dR, dtype=F64), False).detach())
        Tm = float(solve_T(torch.tensor(R - dR, dtype=F64), False).detach())
        fd.append((Tp - Tm) / (2 * dR))
    entries['dTdR_fd'] = np.array(fd)
    np.savez(os.path.join(OUT, 'example4.npz'), **entries)
    print('example4 done')


def golden_example1_dispersive():
    """Example1's defining semantics at test scale: the dispersive a-Si:H
    permittivity re-evaluated at EVERY wavelength inside the sweep
    (Example1.ipynb cell 2: ``Materials.aSiH.apply(lamb0_now)**2``).
    complex128 truth, order [4,4], 7 wavelengths, 256x256 raster of the
    exact notebook geometry (180x100 rectangle, edge sharpness 1000)."""
    L = [300., 300.]
    order = [4, 4]
    geom = rect_grid(256, 256, L[0], L[1], Wx=180., Wy=100., sharp=1000.,
                     f64=True)
    lambs = np.linspace(400., 700., 7)
    txx = []
    for lamb0 in lambs:
        si_eps = silicon_eps(lamb0, f64=True)
        layer_eps = geom * si_eps + (1. - geom)
        sim = torcwa.rcwa(freq=1 / float(lamb0), order=order, L=L,
                          dtype=C128, device=DEV)
        sim.add_input_layer(eps=SUBSTRATE_EPS)
        sim.set_incident_angle(inc_ang=0., azi_ang=0.)
        sim.add_layer(thickness=300., eps=layer_eps)
        sim.solve_global_smatrix()
        txx.append(complex(sim.S_parameters(
            orders=[0, 0], direction='forward', port='transmission',
            polarization='xx', ref_order=[0, 0])[0]))
    np.savez(os.path.join(OUT, 'example1_dispersive.npz'),
             lambs=lambs, txx=np.array(txx), geom=t2n(geom))
    print('example1_dispersive done')


if __name__ == '__main__':
    which = sys.argv[1:] if len(sys.argv) > 1 else None
    todo = {
        'example0': golden_example0,
        'example1': golden_example1,
        'example2': golden_example2,
        'example1_1': golden_example1_1,
        'example4': golden_example4,
        'magnetic': golden_magnetic,
        'example1_dispersive': golden_example1_dispersive,
    }
    for name, fn in todo.items():
        if which is None or name in which:
            fn()
    print('goldens written to', OUT)
