"""Sweep-count experiments: shift source quality vs convergence rate."""
import sys
import numpy as np
import scipy.linalg as sla
sys.path.insert(0, 'scripts')
import np_ms_model as M


def sweep2(H, m, it, kblk):
    """sweep_model variant: shifts = m closest (to H[hi,hi]) eigenvalues
    of the trailing kblk x kblk block."""
    n = H.shape[0]
    d = np.abs(np.diagonal(H))
    sub = np.abs(np.diagonal(H, -1))
    dnext = np.append(d[1:], 0.0)
    thresh = np.maximum(M.F32EPS * (d[:-1] + dnext[:-1]), M.SMLNUM)
    alive = sub > thresh
    idx = np.nonzero(alive)[0]
    hi = int(idx.max()) + 1 if len(idx) else 0
    if hi == 0:
        return H, 0, 0
    lo = hi
    while lo > 0 and alive[lo - 1]:
        lo -= 1
    base = max(hi - (kblk - 1), lo)
    B = H[base:hi + 1, base:hi + 1]
    ev = np.linalg.eigvals(B.astype(np.complex128)).astype(np.complex64)
    dist = np.abs(ev - H[hi, hi])
    ev = ev[np.argsort(dist, kind='stable')][:m]
    sh = np.zeros(m, np.complex64)
    sh[:len(ev)] = ev
    if it % 13 == 12:
        dgb = np.diagonal(H[max(hi-m+1,lo):hi+1, max(hi-m+1,lo):hi+1]).copy()
        sb = np.abs(np.diagonal(H[max(hi-m+1,lo):hi+1, max(hi-m+1,lo):hi+1], -1))
        shex = np.zeros(m, np.complex64)
        shex[:len(dgb)] = dgb
        shex[1:len(dgb)] += 0.75 * sb
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
            c, s = M.givens(x[i], y[i], active)
            G = np.array([[c, s], [-np.conj(s), c]], np.complex64)
            H[[k, k + 1], :] = G @ H[[k, k + 1], :]
            H[:, [k, k + 1]] = H[:, [k, k + 1]] @ G.conj().T
            x[i] = H[k + 1, k]
            y[i] = H[k + 2, k] if (k + 2) <= hi else 0.0
    r, cc = np.indices(H.shape)
    H[r > cc + 1] = 0.0
    return H, lo, hi


def run(n, m, seed, variant, kblk=None, max_sweeps=4000):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    rot = 0
    for it in range(max_sweeps):
        if variant == 'cur':
            H, lo, hi = M.sweep_model(H, m, it, 'mini')
        else:
            H, lo, hi = sweep2(H, m, it, kblk)
        if hi == 0:
            break
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    err = np.max(np.abs(w - wref))
    tag = f'{variant}(k={kblk})' if kblk else variant
    print(f'n={n} m={m} {tag}: sweeps={it+1} err={err:.1e}', flush=True)


n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
run(n, 16, 1, 'cur')
run(n, 16, 1, 'blk', 16)    # exact eigs of m-block (mini-QR quality probe)
run(n, 16, 1, 'blk', 32)    # 2m-block shifts
run(n, 16, 1, 'blk', 48)    # 3m-block shifts
run(n, 32, 1, 'blk', 64)    # more shifts + larger block


def sweep3(H, m, it, kblk, stall):
    """sweep2 + exceptional shifts only after STALL sweeps w/o progress."""
    n = H.shape[0]
    d = np.abs(np.diagonal(H))
    sub = np.abs(np.diagonal(H, -1))
    dnext = np.append(d[1:], 0.0)
    thresh = np.maximum(M.F32EPS * (d[:-1] + dnext[:-1]), M.SMLNUM)
    alive = sub > thresh
    idx = np.nonzero(alive)[0]
    hi = int(idx.max()) + 1 if len(idx) else 0
    if hi == 0:
        return H, 0, 0
    lo = hi
    while lo > 0 and alive[lo - 1]:
        lo -= 1
    base = max(hi - (kblk - 1), lo)
    B = H[base:hi + 1, base:hi + 1]
    ev = np.linalg.eigvals(B.astype(np.complex128)).astype(np.complex64)
    dist = np.abs(ev - H[hi, hi])
    ev = ev[np.argsort(dist, kind='stable')][:m]
    sh = np.zeros(m, np.complex64)
    sh[:len(ev)] = ev
    if stall >= 13:
        bb = max(hi - m + 1, lo)
        dgb = np.diagonal(H[bb:hi+1, bb:hi+1]).copy()
        sb = np.abs(np.diagonal(H[bb:hi+1, bb:hi+1], -1))
        shex = np.zeros(m, np.complex64)
        shex[:len(dgb)] = dgb
        shex[1:len(dgb)] += 0.75 * sb
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
            c, s = M.givens(x[i], y[i], active)
            G = np.array([[c, s], [-np.conj(s), c]], np.complex64)
            H[[k, k + 1], :] = G @ H[[k, k + 1], :]
            H[:, [k, k + 1]] = H[:, [k, k + 1]] @ G.conj().T
            x[i] = H[k + 1, k]
            y[i] = H[k + 2, k] if (k + 2) <= hi else 0.0
    r, cc = np.indices(H.shape)
    H[r > cc + 1] = 0.0
    return H, lo, hi


def run3(n, m, seed, kblk, max_sweeps=4000, trace=False):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    stall, last_hi = 0, n
    his = []
    for it in range(max_sweeps):
        H, lo, hi = sweep3(H, m, it, kblk, stall)
        his.append(hi)
        if hi == 0:
            break
        stall = 0 if hi < last_hi else stall + 1
        if stall >= 13:
            stall = 0
        last_hi = min(last_hi, hi)
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    err = np.max(np.abs(w - wref))
    print(f'n={n} m={m} stall-exc blk(k={kblk}): sweeps={it+1} err={err:.1e}',
          flush=True)
    if trace:
        print('hi trace:', his[:60], flush=True)


if len(sys.argv) > 2 and sys.argv[2] == 'v3':
    run3(n, 16, 1, 32, trace=True)
    run3(n, 16, 1, 16)
    run3(n, 32, 1, 48)

if len(sys.argv) > 2 and sys.argv[2] == 'scale':
    for m_ in (1, 2, 4, 8, 16):
        kb = max(2 * m_, 2)
        run3(n, m_, 1, kb, max_sweeps=3000)


def sweep4(H, m, it, stall, mode):
    """mode: 'two_blocks' = pool eigs of the two trailing m-blocks
    (block-diagonal approx of the 2m window); 'true2m' = eigs of the
    true 2m block; both pick the m closest to H[hi,hi]."""
    n = H.shape[0]
    d = np.abs(np.diagonal(H))
    sub = np.abs(np.diagonal(H, -1))
    dnext = np.append(d[1:], 0.0)
    thresh = np.maximum(M.F32EPS * (d[:-1] + dnext[:-1]), M.SMLNUM)
    alive = sub > thresh
    idx = np.nonzero(alive)[0]
    hi = int(idx.max()) + 1 if len(idx) else 0
    if hi == 0:
        return H, 0, 0
    lo = hi
    while lo > 0 and alive[lo - 1]:
        lo -= 1
    kk = 2 * m
    if mode == 'true2m':
        base = max(hi - (kk - 1), lo)
        B = np.zeros((kk, kk), np.complex64)
        hh_n = min(hi + 1 - base, kk)
        B[:hh_n, :hh_n] = H[base:base + hh_n, base:base + hh_n]
        pool = np.linalg.eigvals(B.astype(np.complex128)).astype(np.complex64)
        ok = (base + np.arange(kk)) <= hi
    else:
        base1 = max(hi - (m - 1), lo)
        base0 = max(base1 - m, lo)
        pools, oks = [], []
        for b0, b1 in ((base0, min(base0 + m - 1, hi)),
                       (base1, hi)):
            B = np.zeros((m, m), np.complex64)
            w_ = b1 - b0 + 1
            B[:w_, :w_] = H[b0:b1 + 1, b0:b1 + 1]
            ev = M.mini_eigvals(B.copy(), m)
            pools.append(ev)
            oks.append((b0 + np.arange(m)) <= b1)
        pool = np.concatenate(pools)
        ok = np.concatenate(oks)
    dist = np.abs(pool - H[hi, hi]) ** 2
    dist = np.where(ok, dist, 3.4e38)
    order_idx = np.argsort(dist, kind='stable')
    sh = pool[order_idx][:m]
    if stall >= 13:
        bb = max(hi - m + 1, lo)
        dgb = np.diagonal(H[bb:hi+1, bb:hi+1]).copy()
        sb = np.abs(np.diagonal(H[bb:hi+1, bb:hi+1], -1))
        shex = np.zeros(m, np.complex64)
        shex[:len(dgb)] = dgb
        shex[1:len(dgb)] += 0.75 * sb
        sh = shex
    valid = (lo + 2 * np.arange(m) + 1) <= hi
    x = np.zeros(m, np.complex64)
    y = np.zeros(m, np.complex64)
    for t in range(lo, hi - 1 + 2 * (m - 1) + 1):
        for i in range(m):
            k = t - 2 * i
            if k == lo and valid[i]:
                x[i] = H[k, k] - sh[i]
                y[i] = H[k + 1, k]
            if not ((k >= lo) and (k < hi) and valid[i]):
                continue
            c, s = M.givens(x[i], y[i], True)
            G = np.array([[c, s], [-np.conj(s), c]], np.complex64)
            H[[k, k + 1], :] = G @ H[[k, k + 1], :]
            H[:, [k, k + 1]] = H[:, [k, k + 1]] @ G.conj().T
            x[i] = H[k + 1, k]
            y[i] = H[k + 2, k] if (k + 2) <= hi else 0.0
    r, cc = np.indices(H.shape)
    H[r > cc + 1] = 0.0
    return H, lo, hi


def run4(n, m, seed, mode, max_sweeps=4000):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64) * 0.3
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    stall, last_hi = 0, n
    for it in range(max_sweeps):
        H, lo, hi = sweep4(H, m, it, stall, mode)
        if hi == 0:
            break
        stall = 0 if hi < last_hi else stall + 1
        if stall >= 13:
            stall = 0
        last_hi = min(last_hi, hi)
    w = np.sort_complex(np.diagonal(H))
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    print(f'n={n} m={m} {mode}: sweeps={it+1} '
          f'err={np.max(np.abs(w - wref)):.1e}', flush=True)


if len(sys.argv) > 2 and sys.argv[2] == 'v4':
    run4(n, 16, 1, 'two_blocks')
    run4(n, 16, 1, 'true2m')
    run4(n, 16, 2, 'two_blocks')
    run4(n, 16, 2, 'true2m')
