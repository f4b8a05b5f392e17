"""Slow, obviously-correct NumPy oracle of the reference semantics.

Independent re-statement of the algorithms (math per SURVEY.md §2/§3 with
reference file:line anchors) used to validate the JAX kernels on random
inputs. Everything is per-individual, per-site Python loops in float64.
"""

import numpy as np

BIG = 1e15
EPSILON = 1e-5


def logsum(arr):
    arr = np.asarray(arr, dtype=np.float64)
    m = arr.max()
    if m == -np.inf:
        return -np.inf
    return np.log(np.sum(np.exp(arr - m))) + m


def calc_hwe(maf, F, log_scale=True):
    pq = (1 - maf) * maf
    g = np.array(
        [(1 - maf) ** 2 + pq * F, 2 * pq - 2 * pq * F, maf**2 + pq * F]
    )
    if log_scale:
        with np.errstate(divide="ignore"):
            g = np.log(g)
        g[np.isneginf(g)] = -BIG
        if F == 1:
            g[1] = -BIG
    elif F == 1:
        g[1] = 1 / BIG
    return g


def post_prob(lkl, prior=None):
    pp = np.array(lkl, dtype=np.float64)
    if prior is not None:
        pp = pp + prior
    return pp - logsum(pp)


def calc_emission(gl, maf, state):
    geno = calc_hwe(maf, float(state), log_scale=True)
    return logsum(gl + geno)


def log_trans(k, l, q_l, alpha, d):
    x = np.exp(-alpha * d)
    t = (1 - x) * q_l
    if k == l:
        t += x
    return np.log(t)


def forward(e_prob, dist, F, alpha):
    """e_prob [S,2], dist [S], scalars F/alpha -> (fw [S,2], loglik)."""
    S = e_prob.shape[0]
    q = np.array([1 - F, F])
    fw = np.zeros((S, 2))
    prev = np.log(q)
    for s in range(S):
        new = np.zeros(2)
        for l in range(2):
            tmp = [prev[k] + log_trans(k, l, q[l], alpha, dist[s]) for k in range(2)]
            new[l] = logsum(tmp) + e_prob[s, l]
        fw[s] = new
        prev = new
    return fw, logsum(fw[-1])


def backward(e_prob, dist, F, alpha):
    S = e_prob.shape[0]
    q = np.array([1 - F, F])
    bw = np.zeros((S, 2))
    bw[S - 1] = 0.0
    for s in range(S - 1, 0, -1):
        for k in range(2):
            tmp = [
                log_trans(k, l, q[l], alpha, dist[s]) + e_prob[s, l] + bw[s, l]
                for l in range(2)
            ]
            bw[s - 1, k] = logsum(tmp)
    sent = np.zeros(2)
    for k in range(2):
        tmp = [
            log_trans(k, l, q[l], alpha, dist[0]) + e_prob[0, l] + bw[0, l]
            for l in range(2)
        ]
        sent[k] = logsum(tmp) + np.log(q[k])
    return bw, logsum(sent)


def viterbi(e_prob, dist, F, alpha, compat=True):
    """Returns (path [S], score). compat=True mirrors the in-place update."""
    S = e_prob.shape[0]
    q = np.array([1 - F, F])
    vp = np.log(q.copy())
    bp = np.zeros((S, 2), dtype=np.int64)
    for s in range(S):
        if compat:
            for l in range(2):
                vmax, kmax = -np.inf, 0
                for k in range(2):
                    pval = vp[k] + log_trans(k, l, q[l], alpha, dist[s])
                    if vmax < pval:
                        vmax, kmax = pval, k
                bp[s, l] = kmax
                vp[l] = vmax + e_prob[s, l]  # in-place: l=1 sees updated vp[0]
        else:
            old = vp.copy()
            new = np.zeros(2)
            for l in range(2):
                vmax, kmax = -np.inf, 0
                for k in range(2):
                    pval = old[k] + log_trans(k, l, q[l], alpha, dist[s])
                    if vmax < pval:
                        vmax, kmax = pval, k
                bp[s, l] = kmax
                new[l] = vmax + e_prob[s, l]
            vp = new
    path = np.zeros(S, dtype=np.int64)
    path[S - 1] = 1 if vp[1] > vp[0] else 0
    for s in range(S - 1, 0, -1):
        path[s - 1] = bp[s, path[s]]
    score = vp[path[S - 1]]
    return path, score


def est_maf(gl_site, indF):
    """Reference est_maf with the non-resetting accumulators quirk.

    gl_site: [N, 3] normalised log GLs at one site; indF: [N].
    (gen_func.cpp:974-1009: num/den initialised once OUTSIDE the fixed
    point and accumulating across its iterations.)
    """
    num = 0.0
    den = 0.0
    freq = 0.01
    iters = 0
    while True:
        prev = freq
        for i in range(len(indF)):
            F = indF[i]
            prior = calc_hwe(freq, F)
            pp = np.exp(post_prob(gl_site[i], prior))
            num += pp[1] + pp[2] * (2 - F)
            den += 2 * pp[1] + (pp[0] + pp[2]) * (2 - F)
        freq = num / den
        cond = abs(prev - freq) > EPSILON and iters < 100
        iters += 1
        if not cond:
            break
    return freq


def random_case(rng, S, N, chrom_break_every=0):
    """Random normalised log-GLs, emissions, distances, params."""
    gl = np.log(rng.dirichlet(np.ones(3), size=(N, S)))
    freq = rng.uniform(0.01, 0.49, size=S)
    dist = rng.uniform(0.001, 0.3, size=S)
    dist[0] = rng.uniform(0.001, 2.0)
    if chrom_break_every:
        dist[chrom_break_every::chrom_break_every] = np.inf
    F = rng.uniform(0.01, 0.95, size=N)
    alpha = rng.uniform(0.005, 0.5, size=N)
    e = np.zeros((S, N, 2))
    for i in range(N):
        for s in range(S):
            for k in range(2):
                e[s, i, k] = calc_emission(gl[i, s], freq[s], k)
    return gl, freq, dist, F, alpha, e
