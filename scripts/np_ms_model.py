"""Numpy mirror of the multishift Schur QR sweep logic (kernel-faithful).

Isolates convergence behavior: per sweep prints (lo, hi, #alive), so the
stall seen in the Pallas kernels at e.g. n=300/m=8 can be diagnosed with
full introspection.  Shift source selectable: exact (np.linalg.eigvals of
the trailing block) or 'mini' (the kernel's fixed-budget mini QR,
approximated by a few unshifted... we mirror with exact for now).
"""
import sys
import numpy as np

F32EPS = np.float32(1.1920929e-07)
SMLNUM = 1e-31


def givens(x, y, active):
    if not active:
        return 1.0, 0.0 + 0.0j
    ax = abs(x)
    dn = np.sqrt(ax * ax + abs(y) ** 2)
    if dn == 0:
        return 1.0, 0.0 + 0.0j
    if ax == 0:
        return 0.0, 1.0 + 0.0j
    c = ax / dn
    s = (x * np.conj(y)) / (ax * dn)
    return c, s


def wilkinson2(a, b, c, d):
    tr = a + d
    det = a * d - b * c
    q = tr * tr - 4 * det
    qmag = abs(q)
    dscr = np.sqrt(max((qmag + q.real) / 2, 0.))
    dsci = np.sign(q.imag if q.imag != 0 else 1.0) * np.sqrt(
        max((qmag - q.real) / 2, 0.))
    dsc = dscr + 1j * dsci
    return (tr + dsc) / 2, (tr - dsc) / 2


def mini_eigvals(B, m):
    """Numpy mirror of eig_qr_pallas_ms._mini_eigvals (fixed 6m budget)."""
    hi = m - 1
    for it in range(6 * m):
        d = np.abs(np.diagonal(B))
        sub = np.abs(np.diagonal(B, -1))
        dnext = np.append(d[1:], 0.0)
        thresh = np.maximum(F32EPS * (d[:-1] + dnext[:-1]), SMLNUM)
        alive = sub > thresh
        idx = np.nonzero(alive[:hi])[0]
        hi = int(idx.max()) + 1 if len(idx) else 0
        if hi == 0:
            break
        lo = hi
        while lo > 0 and alive[lo - 1]:
            lo -= 1
        a, b = B[hi - 1, hi - 1], B[hi - 1, hi]
        c, dd = B[hi, hi - 1], B[hi, hi]
        l1, l2 = wilkinson2(a, b, c, dd)
        sg = l1 if abs(l1 - dd) < abs(l2 - dd) else l2
        if it % 13 == 12:
            sg = dd + 0.75 * abs(c)
        x = B[lo, lo] - sg
        y = B[lo + 1, lo]
        for k in range(m - 1):
            active = (k >= lo) and (k < hi)
            cg, s = givens(x, y, active)
            if active:
                G = np.array([[cg, s], [-np.conj(s), cg]], np.complex64)
                B[[k, k + 1], :] = G @ B[[k, k + 1], :]
                if k >= 1:
                    B[k + 1, k - 1] = 0.0
                B[:, [k, k + 1]] = B[:, [k, k + 1]] @ G.conj().T
                x = B[k + 1, k]
                y = B[k + 2, k] if (k + 2) <= hi else 0.0
    return np.diagonal(B).astype(np.complex64).copy()


def sweep_model(H, m, it, shift_mode='exact', verbose=False):
    n = H.shape[0]
    d = np.abs(np.diagonal(H))
    sub = np.abs(np.diagonal(H, -1))
    dnext = np.append(d[1:], 0.0)
    thresh = np.maximum(F32EPS * (d[:-1] + dnext[:-1]), SMLNUM)
    alive = sub > thresh  # index g: H[g+1, g]
    # hi: largest g+1 with alive[g]
    idx = np.nonzero(alive)[0]
    hi = int(idx.max()) + 1 if len(idx) else 0
    if hi == 0:
        return H, 0, 0
    # lo: start of the run ending at hi
    lo = hi
    while lo > 0 and alive[lo - 1]:
        lo -= 1

    base = max(hi - (m - 1), lo)
    # kernel extracts a full m x m block at rows/cols base..base+m-1 and
    # masks entries whose global index exceeds hi to 0
    B = np.zeros((m, m), np.complex64)
    hh = min(hi + 1 - base, m)
    B[:hh, :hh] = H[base:base + hh, base:base + hh]
    if shift_mode == 'exact':
        sh = np.linalg.eigvals(B.astype(np.complex128)).astype(np.complex64)
    elif shift_mode == 'mini':
        sh = mini_eigvals(B.copy(), m)
    else:
        raise ValueError(shift_mode)
    # Wilkinson sort: closest to H[hi, hi] first; padding lanes last
    dist = np.abs(sh - H[hi, hi]) ** 2
    lane_ok = (base + np.arange(m)) <= hi
    dist = np.where(lane_ok, dist, 3.4e38)
    order = np.argsort(dist, kind='stable')
    sh = sh[order]
    if it % 13 == 12:
        dg = np.diagonal(B).copy()
        sb = np.abs(np.diagonal(B, -1))
        shex = np.zeros(m, np.complex64)
        shex[:len(dg)] = dg
        shex[1:len(dg)] += 0.75 * sb
        sh = shex

    valid = (lo + 2 * np.arange(m) + 1) <= hi
    x = np.zeros(m, np.complex64)
    y = np.zeros(m, np.complex64)
    t_final = hi - 1 + 2 * (m - 1)
    for t in range(lo, t_final + 1):
        for i in range(m):
            k = t - 2 * i
            if k == lo and valid[i]:
                x[i] = H[k, k] - sh[i]
                y[i] = H[k + 1, k]
            active = (k >= lo) and (k < hi) and valid[i]
            if not active:
                continue
            c, s = givens(x[i], y[i], active)
            G = np.array([[c, s], [-np.conj(s), c]], np.complex64)
            H[[k, k + 1], :] = G @ H[[k, k + 1], :]
            H[:, [k, k + 1]] = H[:, [k, k + 1]] @ G.conj().T
            x[i] = H[k + 1, k]
            y[i] = H[k + 2, k] if (k + 2) <= hi else 0.0
    # sweep-end junk mask (kernel: rows <= cols + 1)
    r, cc = np.indices(H.shape)
    H[r > cc + 1] = 0.0
    return H, lo, hi


def run(n, m, seed, max_sweeps, shift_mode='exact'):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    import scipy.linalg as sla
    H0 = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    H = H0.copy()
    hist = []
    for it in range(max_sweeps):
        H, lo, hi = sweep_model(H, m, it, shift_mode)
        hist.append((lo, hi))
        if hi == 0:
            break
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    err = np.max(np.abs(w - wref))
    print(f'n={n} m={m} seed={seed}: sweeps={it + 1} final(lo,hi)=({lo},{hi}) '
          f'w_err={err:.2e}')
    # deflation trajectory every 20 sweeps
    for j in range(0, len(hist), max(1, len(hist) // 15)):
        print('   sweep', j, 'lo,hi', hist[j])
    return it + 1, hi


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    ms = int(sys.argv[4]) if len(sys.argv) > 4 else 2000
    run(n, m, seed, ms)

def run_mode(n, m, seed, max_sweeps, mode):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    import scipy.linalg as sla
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    for it in range(max_sweeps):
        H, lo, hi = sweep_model(H, m, it, mode)
        if hi == 0:
            break
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    err = np.max(np.abs(w - wref))
    print(f'[{mode}] n={n} m={m} seed={seed}: sweeps={it + 1} '
          f'final hi={hi} w_err={err:.2e}', flush=True)
