"""AED (zlaqr3-style) prototype on the numpy multishift model.

Per sweep: Schur-factor the trailing k-window, deflate the contiguous
bottom run whose spike entries are negligible, use the remaining window
eigenvalues as shifts. Measures sweep count + total work vs the plain
multishift model.
"""
import sys
import numpy as np
import scipy.linalg as sla
sys.path.insert(0, 'scripts')
import np_ms_model as M

F32EPS = M.F32EPS


def aed_sweep(H, m, k, stall):
    n = H.shape[0]
    d = np.abs(np.diagonal(H))
    sub = np.abs(np.diagonal(H, -1))
    dnext = np.append(d[1:], 0.0)
    thresh = np.maximum(F32EPS * (d[:-1] + dnext[:-1]), M.SMLNUM)
    alive = sub > thresh
    idx = np.nonzero(alive)[0]
    hi = int(idx.max()) + 1 if len(idx) else 0
    if hi == 0:
        return H, 0, 0, 0
    lo = hi
    while lo > 0 and alive[lo - 1]:
        lo -= 1

    # ---- AED on the trailing k-window --------------------------------
    nd = 0
    if hi - lo + 1 > 3:
        s = max(hi - k + 1, lo + 1)   # keep one row above for the spike
        W = H[s:hi + 1, s:hi + 1].astype(np.complex64)
        T, V = sla.schur(W, output='complex')
        kw = W.shape[0]
        beta = H[s, s - 1]
        spike = beta * np.conj(V[0, :])          # entries s..hi of col s-1
        # contiguous bottom deflation test (LAPACK-ish threshold)
        while nd < kw:
            i = kw - 1 - nd
            if abs(spike[i]) <= F32EPS * max(abs(T[i, i]), np.abs(W).max()):
                nd += 1
            else:
                break
        if nd > 0:
            # apply the similarity to the window and its borders
            H[s:hi + 1, s:hi + 1] = T
            H[s:hi + 1, s - 1] = spike
            H[:s, s:hi + 1] = H[:s, s:hi + 1] @ V
            H[s:hi + 1, hi + 1:] = V.conj().T @ H[s:hi + 1, hi + 1:]
            # restore Hessenberg form: the undeflated window plus its
            # spike column re-reduces as one (ku+1)-block Hessenberg
            # factorization (Q fixes e1, so the spike collapses into the
            # new subdiagonal H[s, s-1]); borders get Q applied
            ku = kw - nd
            if ku > 1:
                blk = H[s - 1:s + ku, s - 1:s + ku].copy()
                Hb, Qb = sla.hessenberg(blk.astype(np.complex128),
                                        calc_q=True)
                H[s - 1:s + ku, s - 1:s + ku] = Hb.astype(np.complex64)
                H[:s - 1, s - 1:s + ku] = (
                    H[:s - 1, s - 1:s + ku] @ Qb).astype(np.complex64)
                H[s - 1:s + ku, s + ku:] = (
                    Qb.conj().T @ H[s - 1:s + ku, s + ku:]
                ).astype(np.complex64)
            hi = hi - nd
            # refresh deflation window after AED
            r, cc = np.indices(H.shape)
            H[(r > cc + 1)] = 0.
            sub = np.abs(np.diagonal(H, -1))
            d = np.abs(np.diagonal(H))
            dnext = np.append(d[1:], 0.0)
            thresh = np.maximum(F32EPS * (d[:-1] + dnext[:-1]), M.SMLNUM)
            alive = sub > thresh
            idx = np.nonzero(alive[:hi])[0]
            hi = int(idx.max()) + 1 if len(idx) else 0
            if hi == 0:
                return H, 0, 0, nd
            lo = hi
            while lo > 0 and alive[lo - 1]:
                lo -= 1

    # ---- shifts: undeflated window eigenvalues ------------------------
    base = max(hi - (m - 1), lo)
    B = np.zeros((m, m), np.complex64)
    hh_n = min(hi + 1 - base, m)
    B[:hh_n, :hh_n] = H[base:base + hh_n, base:base + hh_n]
    pool = M.mini_eigvals(B.copy(), m)
    dist = np.abs(pool - H[hi, hi]) ** 2
    ok = (base + np.arange(m)) <= hi
    dist = np.where(ok, dist, 3.4e38)
    sh = pool[np.argsort(dist, kind='stable')][:m]
    if stall >= 13:
        dgb = np.diagonal(H[base:hi+1, base:hi+1]).copy()
        sb = np.abs(np.diagonal(H[base:hi+1, base:hi+1], -1))
        shex = np.zeros(m, np.complex64)
        shex[:len(dgb)] = dgb
        shex[1:len(dgb)] += 0.75 * sb
        sh = shex

    valid = (lo + 2 * np.arange(m) + 1) <= hi
    x = np.zeros(m, np.complex64)
    y = np.zeros(m, np.complex64)
    for t in range(lo, hi - 1 + 2 * (m - 1) + 1):
        for i in range(m):
            kq = t - 2 * i
            if kq == lo and valid[i]:
                x[i] = H[kq, kq] - sh[i]
                y[i] = H[kq + 1, kq]
            if not ((kq >= lo) and (kq < hi) and valid[i]):
                continue
            c, sg = M.givens(x[i], y[i], True)
            G = np.array([[c, sg], [-np.conj(sg), c]], np.complex64)
            H[[kq, kq + 1], :] = G @ H[[kq, kq + 1], :]
            H[:, [kq, kq + 1]] = H[:, [kq, kq + 1]] @ G.conj().T
            x[i] = H[kq + 1, kq]
            y[i] = H[kq + 2, kq] if (kq + 2) <= hi else 0.0
    r, cc = np.indices(H.shape)
    H[r > cc + 1] = 0.0
    return H, lo, hi, nd


def run(n, m, k, seed, max_sweeps=3000):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    stall, last_hi, aed_total = 0, n, 0
    for it in range(max_sweeps):
        H, lo, hi, nd = aed_sweep(H, m, k, stall)
        aed_total += nd
        if hi == 0:
            break
        stall = 0 if hi < last_hi else stall + 1
        if stall >= 13:
            stall = 0
        last_hi = min(last_hi, hi)
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    err = np.max(np.abs(w - wref))
    print(f'AED n={n} m={m} k={k} seed={seed}: sweeps={it+1} '
          f'aed_deflations={aed_total} err={err:.1e}', flush=True)


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    run(n, 16, 24, 1)
    run(n, 16, 32, 1)
    run(n, 16, 48, 1)
    run(n, 16, 32, 2)


def run_every(n, m, k, seed, every, max_sweeps=3000):
    """AED only every `every` sweeps (outer-loop chunking model)."""
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    import _shift_exp as SE
    stall, last_hi, aed_total, naed = 0, n, 0, 0
    for it in range(max_sweeps):
        if (it + 1) % every == 0:
            H, lo, hi, nd = aed_sweep(H, m, k, stall)
            aed_total += nd
            naed += 1
        else:
            H, lo, hi = SE.sweep3(H, m, it, m, stall)
        if hi == 0:
            break
        stall = 0 if hi < last_hi else stall + 1
        if stall >= 13:
            stall = 0
        last_hi = min(last_hi, hi)
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    err = np.max(np.abs(w - wref))
    print(f'AEDevery{every} n={n} m={m} k={k}: sweeps={it+1} aed_steps={naed} '
          f'aed_deflations={aed_total} err={err:.1e}', flush=True)


if len(sys.argv) > 2 and sys.argv[2] == 'every':
    for e in (4, 10, 20):
        run_every(int(sys.argv[1]), 16, 32, 1, e)
