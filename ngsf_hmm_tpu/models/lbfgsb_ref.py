"""Trajectory-exact bound L-BFGS-B for the ``--opt compat`` M-step.

The reference optimizes each individual's (F, alpha) with L-BFGS-B
version 2.1 (Byrd-Lu-Nocedal-Zhu; Zhu/Byrd/Lu/Nocedal, "L-BFGS-B:
FORTRAN subroutines for large-scale bound-constrained optimization",
TOMS 23(4), 1997 -- the reference vendors an f2c translation,
/root/reference/shared/bfgs.cpp) driven by central-difference gradients
(bfgs.cpp:22-65) with MVAL=10, FACTR=1e6, PGTOL=1e-3 (bfgs.h:23-25).

This module is an independent Python implementation of that PUBLISHED
algorithm, written so that every floating-point operation happens in
the same order as the Fortran original: with identical f64 inputs it
reproduces the reference optimizer's trajectory bit-for-bit (gated by
tests/test_opt_compat.py against the built reference binary). That is
what upgrades the estimated-config golden comparisons from
optimizer-endpoint tolerances to byte-identical ``.indF``/``.ibd``
(the reference prints its total likelihood at %.10f, EM.cpp:302, so
~1e-14 relative trajectory agreement is required).

Layout notes: arrays are allocated with a dead 0 slot so indices match
the published 1-based Fortran; the reverse-communication driver is a
Python class (`RefLBFGSB`) whose `request` / `supply(f, g)` cycle
replaces the Fortran task-string protocol, which lets a caller batch
the function evaluations of many independent per-individual instances
(models/em_compat.py). The speed-tier optimizer (a redesigned batched
projected L-BFGS) lives in models/lbfgsb.py; this module exists solely
for reference-trajectory parity.
"""

import numpy as np

MVAL = 10
FACTR = 1.0e6
PGTOL = 1.0e-3

_F64 = np.float64


def dpmeps():
    """Machine precision by the MINPACK-2 probing algorithm (dpmeps);
    2.220446049250313e-16 on IEEE doubles (ibeta == 2 short-circuits
    the rounding refinement)."""
    one, two = _F64(1.0), _F64(2.0)
    a = one
    while ((a + a) + one) - (a + a) - one == 0.0:
        a += a
    a += a
    b = one
    while int((a + b) - a) == 0:
        b += b
    ibeta = int((a + b) - a)
    beta = _F64(ibeta)
    it = 0
    b = one
    while ((b * beta) + one) - (b * beta) - one == 0.0:
        b *= beta
        it += 1
    it += 1
    negep = it + 3
    betain = one / beta
    a = one
    for _ in range(negep):
        a *= betain
    while (one + a) - one == 0.0:
        a *= beta
    return a  # ibeta == 2 on every IEEE platform: no rounding branch


EPSMCH = dpmeps()


def _ddot(n, a, ai, b, bi):
    """sum_{k<n} a[ai+k]*b[bi+k] accumulated left-to-right (BLAS ddot
    semantics for unit strides; the unrolled-by-5 reference loop sums
    the same terms in the same order)."""
    s = _F64(0.0)
    for k in range(n):
        s += a[ai + k] * b[bi + k]
    return s


def _dpofa(a, n, idx):
    """LINPACK dpofa on the n x n block a[idx[i], idx[j]] (upper
    triangle in, R with A = R'R out). idx maps local 1-based indices to
    the caller's rows/cols. Returns 0 or the failing column."""
    for j in range(1, n + 1):
        s = _F64(0.0)
        for k in range(1, j):
            t = a[idx(k), idx(j)] - _ddot(
                k - 1, a[:, idx(j)], idx(1), a[:, idx(k)], idx(1)
            )
            # NOTE: ddot(a[., k], a[., j]) in column order k then j --
            # multiplication is commutative so operand order in the
            # products cannot change the result; the SUM order matches.
            t = t / a[idx(k), idx(k)]
            a[idx(k), idx(j)] = t
            s += t * t
        s = a[idx(j), idx(j)] - s
        if s <= 0.0:
            return j
        a[idx(j), idx(j)] = np.sqrt(s)
    return 0


def _dtrsl(t, n, b, job, idx_r, idx_b):
    """LINPACK dtrsl on the n x n triangular block t[idx_r(i), idx_r(j)]
    and vector b[idx_b(i)] (1-based local indices). job: 01 -> T upper,
    solve T x = b; 11 -> T upper, solve T' x = b (the only two jobs the
    algorithm uses). Returns info (0 ok, k if t[k,k] == 0)."""
    for k in range(1, n + 1):
        if t[idx_r(k), idx_r(k)] == 0.0:
            return k
    if job == 1:  # case 2 (L50): T upper, solve T x = b (back subst.)
        b[idx_b(n)] = b[idx_b(n)] / t[idx_r(n), idx_r(n)]
        for jj in range(2, n + 1):
            j = n - jj + 1
            temp = -b[idx_b(j + 1)]
            for k in range(1, j + 1):  # daxpy over column j+1 rows 1..j
                b[idx_b(k)] += temp * t[idx_r(k), idx_r(j + 1)]
            b[idx_b(j)] = b[idx_b(j)] / t[idx_r(j), idx_r(j)]
    elif job == 11:  # case 4 (L110): T upper, solve T' x = b (forward)
        b[idx_b(1)] = b[idx_b(1)] / t[idx_r(1), idx_r(1)]
        for j in range(2, n + 1):
            s = _F64(0.0)
            for k in range(1, j):  # ddot over column j rows 1..j-1
                s += t[idx_r(k), idx_r(j)] * b[idx_b(k)]
            b[idx_b(j)] = (b[idx_b(j)] - s) / t[idx_r(j), idx_r(j)]
    else:  # pragma: no cover - jobs 0/10 unused by this algorithm
        raise ValueError(f"unsupported dtrsl job {job}")
    return 0


def _hpsolb(n, t, iorder, iheap):
    """Heapsort helper: move the least of t[1..n] to t[n], leave
    t[1..n-1] a heap (CACM algorithm 232, as in the published code)."""
    if iheap == 0:
        for k in range(2, n + 1):
            ddum = t[k]
            indxin = iorder[k]
            i = k
            while i > 1:
                j = i // 2
                if ddum < t[j]:
                    t[i] = t[j]
                    iorder[i] = iorder[j]
                    i = j
                else:
                    break
            t[i] = ddum
            iorder[i] = indxin
    if n > 1:
        i = 1
        out = t[1]
        indxou = iorder[1]
        ddum = t[n]
        indxin = iorder[n]
        while True:
            j = i + i
            if j <= n - 1:
                if t[j + 1] < t[j]:
                    j += 1
                if t[j] < ddum:
                    t[i] = t[j]
                    iorder[i] = iorder[j]
                    i = j
                    continue
            break
        t[i] = ddum
        iorder[i] = indxin
        t[n] = out
        iorder[n] = indxou


def _dcstep(st):
    """MINPACK-2 dcstep: safeguarded trial step update. st is the dict
    holding stx/fx/dx, sty/fy/dy, stp/fp/dp, brackt, stpmin, stpmax."""
    stx, fx, dx = st["stx"], st["fx"], st["dx"]
    sty, fy, dy = st["sty"], st["fy"], st["dy"]
    stp, fp, dp = st["stp"], st["fp"], st["dp"]
    brackt = st["brackt"]
    stpmin, stpmax = st["stpmin"], st["stpmax"]

    sgnd = dp * (dx / abs(dx))
    if fp > fx:
        theta = (fx - fp) * 3.0 / (stp - stx) + dx + dp
        s = max(abs(theta), abs(dx), abs(dp))
        gamma = s * np.sqrt((theta / s) ** 2 - dx / s * (dp / s))
        if stp < stx:
            gamma = -gamma
        p = gamma - dx + theta
        q = gamma - dx + gamma + dp
        r = p / q
        stpc = stx + r * (stp - stx)
        stpq = stx + dx / ((fx - fp) / (stp - stx) + dx) / 2.0 * (stp - stx)
        if abs(stpc - stx) < abs(stpq - stx):
            stpf = stpc
        else:
            stpf = stpc + (stpq - stpc) / 2.0
        brackt = True
    elif sgnd < 0.0:
        theta = (fx - fp) * 3.0 / (stp - stx) + dx + dp
        s = max(abs(theta), abs(dx), abs(dp))
        gamma = s * np.sqrt((theta / s) ** 2 - dx / s * (dp / s))
        if stp > stx:
            gamma = -gamma
        p = gamma - dp + theta
        q = gamma - dp + gamma + dx
        r = p / q
        stpc = stp + r * (stx - stp)
        stpq = stp + dp / (dp - dx) * (stx - stp)
        if abs(stpc - stp) > abs(stpq - stp):
            stpf = stpc
        else:
            stpf = stpq
        brackt = True
    elif abs(dp) < abs(dx):
        theta = (fx - fp) * 3.0 / (stp - stx) + dx + dp
        s = max(abs(theta), abs(dx), abs(dp))
        gamma = s * np.sqrt(max(_F64(0.0),
                                (theta / s) ** 2 - dx / s * (dp / s)))
        if stp > stx:
            gamma = -gamma
        p = gamma - dp + theta
        q = gamma + (dx - dp) + gamma
        r = p / q
        if r < 0.0 and gamma != 0.0:
            stpc = stp + r * (stx - stp)
        elif stp > stx:
            stpc = stpmax
        else:
            stpc = stpmin
        stpq = stp + dp / (dp - dx) * (stx - stp)
        if brackt:
            if abs(stpc - stp) < abs(stpq - stp):
                stpf = stpc
            else:
                stpf = stpq
            if stp > stx:
                stpf = min(stp + (sty - stp) * 0.66, stpf)
            else:
                stpf = max(stp + (sty - stp) * 0.66, stpf)
        else:
            if abs(stpc - stp) > abs(stpq - stp):
                stpf = stpc
            else:
                stpf = stpq
            stpf = min(stpmax, stpf)
            stpf = max(stpmin, stpf)
    else:
        if brackt:
            theta = (fp - fy) * 3.0 / (sty - stp) + dy + dp
            s = max(abs(theta), abs(dy), abs(dp))
            gamma = s * np.sqrt((theta / s) ** 2 - dy / s * (dp / s))
            if stp > sty:
                gamma = -gamma
            p = gamma - dp + theta
            q = gamma - dp + gamma + dy
            r = p / q
            stpc = stp + r * (sty - stp)
            stpf = stpc
        elif stp > stx:
            stpf = stpmax
        else:
            stpf = stpmin

    if fp > fx:
        sty, fy, dy = stp, fp, dp
    else:
        if sgnd < 0.0:
            sty, fy, dy = stx, fx, dx
        stx, fx, dx = stp, fp, dp
    st.update(stx=stx, fx=fx, dx=dx, sty=sty, fy=fy, dy=dy,
              stp=stpf, brackt=brackt)


def _dcsrch(ls, f, g, stp):
    """MINPACK-2 dcsrch state machine (ftol=1e-3, gtol=0.9, xtol=0.1,
    stpmin=0). ls: persistent dict; returns (task, stp). task in
    {"FG", "CONV", "WARN", "ERROR"}."""
    ftol, gtol, xtol = _F64(1e-3), _F64(0.9), _F64(0.1)
    stpmin = _F64(0.0)
    stpmax = ls["stpmax"]
    if ls["task"] == "START":
        if g >= 0.0:
            ls["task"] = "ERROR"
            return "ERROR", stp
        ls.update(
            brackt=False, stage=1, finit=f, ginit=g, gtest=ftol * g,
            width=stpmax - stpmin, width1=(stpmax - stpmin) / 0.5,
            stx=_F64(0.0), fx=f, gx=g, sty=_F64(0.0), fy=f, gy=g,
            stmin=_F64(0.0), stmax=stp + stp * 4.0, task="FG",
        )
        return "FG", stp

    gtest, finit, ginit = ls["gtest"], ls["finit"], ls["ginit"]
    ftest = finit + stp * gtest
    if ls["stage"] == 1 and f <= ftest and g >= 0.0:
        ls["stage"] = 2
    task = "FG"
    if ls["brackt"] and (stp <= ls["stmin"] or stp >= ls["stmax"]):
        task = "WARN"
    if ls["brackt"] and ls["stmax"] - ls["stmin"] <= xtol * ls["stmax"]:
        task = "WARN"
    if stp == stpmax and f <= ftest and g <= gtest:
        task = "WARN"
    if stp == stpmin and (f > ftest or g >= gtest):
        task = "WARN"
    if f <= ftest and abs(g) <= gtol * (-ginit):
        task = "CONV"
    if task in ("WARN", "CONV"):
        ls["task"] = task
        return task, stp

    st = {
        "stx": ls["stx"], "fx": ls["fx"], "dx": ls["gx"],
        "sty": ls["sty"], "fy": ls["fy"], "dy": ls["gy"],
        "stp": stp, "fp": f, "dp": g, "brackt": ls["brackt"],
        "stpmin": ls["stmin"], "stpmax": ls["stmax"],
    }
    if ls["stage"] == 1 and f <= ls["fx"] and f > ftest:
        st["fp"] = f - stp * gtest
        st["fx"] = ls["fx"] - ls["stx"] * gtest
        st["fy"] = ls["fy"] - ls["sty"] * gtest
        st["dp"] = g - gtest
        st["dx"] = ls["gx"] - gtest
        st["dy"] = ls["gy"] - gtest
        _dcstep(st)
        ls["fx"] = st["fx"] + st["stx"] * gtest
        ls["fy"] = st["fy"] + st["sty"] * gtest
        ls["gx"] = st["dx"] + gtest
        ls["gy"] = st["dy"] + gtest
        ls["stx"], ls["sty"] = st["stx"], st["sty"]
    else:
        _dcstep(st)
        ls["stx"], ls["fx"], ls["gx"] = st["stx"], st["fx"], st["dx"]
        ls["sty"], ls["fy"], ls["gy"] = st["sty"], st["fy"], st["dy"]
    ls["brackt"] = st["brackt"]
    stp = st["stp"]
    if ls["brackt"]:
        if abs(ls["sty"] - ls["stx"]) >= 0.66 * ls["width1"]:
            stp = ls["stx"] + (ls["sty"] - ls["stx"]) * 0.5
        ls["width1"] = ls["width"]
        ls["width"] = abs(ls["sty"] - ls["stx"])
        ls["stmin"] = min(ls["stx"], ls["sty"])
        ls["stmax"] = max(ls["stx"], ls["sty"])
    else:
        ls["stmin"] = stp + (stp - ls["stx"]) * 1.1
        ls["stmax"] = stp + (stp - ls["stx"]) * 4.0
    stp = max(stp, stpmin)
    stp = min(stp, stpmax)
    if (ls["brackt"] and (stp <= ls["stmin"] or stp >= ls["stmax"])) or (
        ls["brackt"] and ls["stmax"] - ls["stmin"] <= xtol * ls["stmax"]
    ):
        stp = ls["stx"]
    ls["task"] = "FG"
    return "FG", stp


class _Mainlb:
    """The mainlb iteration (v2.1 semantics) for one problem instance,
    restructured from the Fortran goto graph into an explicit-state
    Python object. All numbered arrays carry a dead 0 slot."""

    def __init__(self, n, m, x, l, u, nbd):
        self.n, self.m = n, m
        self.x = np.zeros(n + 1, _F64)
        self.x[1:] = x
        self.l = np.zeros(n + 1, _F64)
        self.l[1:] = l
        self.u = np.zeros(n + 1, _F64)
        self.u[1:] = u
        self.nbd = np.zeros(n + 1, np.int64)
        self.nbd[1:] = nbd
        m2 = 2 * m
        self.ws = np.zeros((n + 1, m + 1), _F64)
        self.wy = np.zeros((n + 1, m + 1), _F64)
        self.sy = np.zeros((m + 1, m + 1), _F64)
        self.ss = np.zeros((m + 1, m + 1), _F64)
        self.wt = np.zeros((m + 1, m + 1), _F64)
        self.wn = np.zeros((m2 + 1, m2 + 1), _F64)
        self.snd = np.zeros((m2 + 1, m2 + 1), _F64)
        self.z = np.zeros(n + 1, _F64)
        self.r = np.zeros(n + 1, _F64)
        self.d = np.zeros(n + 1, _F64)
        self.t = np.zeros(n + 1, _F64)
        self.wa = np.zeros(8 * m + 1, _F64)
        self.index = np.zeros(n + 1, np.int64)
        self.iwhere = np.zeros(n + 1, np.int64)
        self.indx2 = np.zeros(n + 1, np.int64)
        self.theta = _F64(1.0)
        self.col = 0
        self.head = 1
        self.itail = 0
        self.iupdat = 0
        self.updatd = False
        self.iter = 0
        self.nfree = n
        self.tol = FACTR * EPSMCH
        self.task = "START"
        self.f = _F64(0.0)
        self.g = np.zeros(n + 1, _F64)
        self.fold = _F64(0.0)
        self.gd = _F64(0.0)
        self.gdold = _F64(0.0)
        self.stp = _F64(0.0)
        self.dnorm = _F64(0.0)
        self.dtd = _F64(0.0)
        self.stpmx = _F64(0.0)
        self.ifun = 0
        self.iback = 0
        self.ls = None  # dcsrch state
        self.info = 0
        # active_: project x, classify iwhere
        self.cnstnd = False
        self.boxed = True
        for i in range(1, n + 1):
            if self.nbd[i] > 0:
                if self.nbd[i] <= 2 and self.x[i] <= self.l[i]:
                    if self.x[i] < self.l[i]:
                        self.x[i] = self.l[i]
                elif self.nbd[i] >= 2 and self.x[i] >= self.u[i]:
                    if self.x[i] > self.u[i]:
                        self.x[i] = self.u[i]
        for i in range(1, n + 1):
            if self.nbd[i] != 2:
                self.boxed = False
            if self.nbd[i] == 0:
                self.iwhere[i] = -1
            else:
                self.cnstnd = True
                if self.nbd[i] == 2 and self.u[i] - self.l[i] <= 0.0:
                    self.iwhere[i] = 3
                else:
                    self.iwhere[i] = 0

    # --- subroutines -----------------------------------------------------

    def _projgr(self):
        sbgnrm = _F64(0.0)
        for i in range(1, self.n + 1):
            gi = self.g[i]
            if self.nbd[i] != 0:
                if gi < 0.0:
                    if self.nbd[i] >= 2:
                        gi = max(self.x[i] - self.u[i], gi)
                else:
                    if self.nbd[i] <= 2:
                        gi = min(self.x[i] - self.l[i], gi)
            sbgnrm = max(sbgnrm, abs(gi))
        return sbgnrm

    def _bmv(self, v, p):
        """p = M v (2col vectors, 1-based)."""
        m, col = self.m, self.col
        sy, wt = self.sy, self.wt
        if col == 0:
            return 0
        p[col + 1] = v[col + 1]
        for i in range(2, col + 1):
            i2 = col + i
            s = _F64(0.0)
            for k in range(1, i):
                s += sy[i, k] * v[k] / sy[k, k]
            p[i2] = v[i2] + s
        info = _dtrsl(wt, col, p, 11, lambda a: a, lambda a: col + a)
        if info != 0:
            return info
        for i in range(1, col + 1):
            p[i] = v[i] / np.sqrt(sy[i, i])
        info = _dtrsl(wt, col, p, 1, lambda a: a, lambda a: col + a)
        if info != 0:
            return info
        for i in range(1, col + 1):
            p[i] = -p[i] / np.sqrt(sy[i, i])
        for i in range(1, col + 1):
            s = _F64(0.0)
            for k in range(i + 1, col + 1):
                s += sy[k, i] * p[col + k] / sy[i, i]
            p[i] += s
        return 0

    def _cauchy(self, sbgnrm):
        """Generalized Cauchy point -> self.z (xcp), wa[2m+1..] = c.
        Returns info."""
        n, m, col, head = self.n, self.m, self.col, self.head
        x, l, u, nbd, g = self.x, self.l, self.u, self.nbd, self.g
        iwhere, iorder = self.iwhere, self.indx2
        t, d, xcp = self.t, self.d, self.z
        wy, ws, theta = self.wy, self.ws, self.theta
        wa = self.wa
        p = wa  # wa[1..2m]
        c = wa  # offset 2m
        wbp_off = 4 * m
        v_off = 6 * m
        if sbgnrm <= 0.0:
            xcp[1:] = x[1:]
            return 0
        bnded = True
        nfree = n + 1
        nbreak = 0
        ibkmin = 0
        bkmin = _F64(0.0)
        col2 = 2 * col
        f1 = _F64(0.0)
        for i in range(1, col2 + 1):
            p[i] = 0.0
        for i in range(1, n + 1):
            neggi = -g[i]
            if iwhere[i] != 3 and iwhere[i] != -1:
                tl = tu = _F64(0.0)
                if nbd[i] <= 2:
                    tl = x[i] - l[i]
                if nbd[i] >= 2:
                    tu = u[i] - x[i]
                xlower = nbd[i] <= 2 and tl <= 0.0
                xupper = nbd[i] >= 2 and tu <= 0.0
                iwhere[i] = 0
                if xlower:
                    if neggi <= 0.0:
                        iwhere[i] = 1
                elif xupper:
                    if neggi >= 0.0:
                        iwhere[i] = 2
                else:
                    if abs(neggi) <= 0.0:
                        iwhere[i] = -3
            pointr = head
            if iwhere[i] != 0 and iwhere[i] != -1:
                d[i] = 0.0
            else:
                d[i] = neggi
                f1 -= neggi * neggi
                for j in range(1, col + 1):
                    p[j] += self.wy[i, pointr] * neggi
                    p[col + j] += self.ws[i, pointr] * neggi
                    pointr = pointr % m + 1
                if nbd[i] <= 2 and nbd[i] != 0 and neggi < 0.0:
                    nbreak += 1
                    iorder[nbreak] = i
                    t[nbreak] = tl / (-neggi)
                    if nbreak == 1 or t[nbreak] < bkmin:
                        bkmin = t[nbreak]
                        ibkmin = nbreak
                elif nbd[i] >= 2 and neggi > 0.0:
                    nbreak += 1
                    iorder[nbreak] = i
                    t[nbreak] = tu / neggi
                    if nbreak == 1 or t[nbreak] < bkmin:
                        bkmin = t[nbreak]
                        ibkmin = nbreak
                else:
                    nfree -= 1
                    iorder[nfree] = i
                    if abs(neggi) > 0.0:
                        bnded = False
        if theta != 1.0:
            for j in range(col + 1, col2 + 1):
                p[j] *= theta
        xcp[1:] = x[1:]
        if nbreak == 0 and nfree == n + 1:
            return 0
        for j in range(1, col2 + 1):
            c[2 * m + j] = 0.0
        f2 = -theta * f1
        if col > 0:
            info = self._bmv(p, wa[v_off:])  # v in wa[6m+1..]
            # NOTE: bmv writes into a VIEW starting at 6m (v[1] is
            # wa[6m+1]); p is wa[1..2m]
            if info != 0:
                return info
            f2 -= _ddot(col2, wa, v_off + 1, wa, 1)
        dtm = -f1 / f2
        tsum = _F64(0.0)
        if nbreak == 0:
            return self._cauchy_tail(dtm, tsum, col2)
        nleft = nbreak
        it = 1
        tj = _F64(0.0)
        while True:
            tj0 = tj
            if it == 1:
                tj = bkmin
                ibp = int(iorder[ibkmin])
            else:
                if it == 2:
                    if ibkmin != nbreak:
                        t[ibkmin] = t[nbreak]
                        iorder[ibkmin] = iorder[nbreak]
                _hpsolb(nleft, t, iorder, it - 2)
                tj = t[nleft]
                ibp = int(iorder[nleft])
            dt = tj - tj0
            if dtm < dt:
                return self._cauchy_tail(dtm, tsum, col2)
            tsum += dt
            nleft -= 1
            it += 1
            dibp = d[ibp]
            d[ibp] = 0.0
            if dibp > 0.0:
                zibp = u[ibp] - x[ibp]
                xcp[ibp] = u[ibp]
                iwhere[ibp] = 2
            else:
                zibp = l[ibp] - x[ibp]
                xcp[ibp] = l[ibp]
                iwhere[ibp] = 1
            if nleft == 0 and nbreak == n:
                dtm = dt
                # L999: update c and return
                if col > 0:
                    for j in range(1, col2 + 1):
                        c[2 * m + j] += dtm * p[j]
                return 0
            dibp2 = dibp * dibp
            f1 = f1 + dt * f2 + dibp2 - theta * dibp * zibp
            f2 -= theta * dibp2
            if col > 0:
                for j in range(1, col2 + 1):
                    c[2 * m + j] += dt * p[j]
                pointr = head
                for j in range(1, col + 1):
                    wa[wbp_off + j] = wy[ibp, pointr]
                    wa[wbp_off + col + j] = theta * ws[ibp, pointr]
                    pointr = pointr % m + 1
                info = self._bmv(wa[wbp_off:], wa[v_off:])
                if info != 0:
                    return info
                wmc = _ddot(col2, wa, 2 * m + 1, wa, v_off + 1)
                wmp = _ddot(col2, wa, 1, wa, v_off + 1)
                wmw = _ddot(col2, wa, wbp_off + 1, wa, v_off + 1)
                for j in range(1, col2 + 1):
                    p[j] += -dibp * wa[wbp_off + j]
                f1 += dibp * wmc
                f2 = f2 + dibp * 2.0 * wmp - dibp2 * wmw
            if nleft > 0:
                dtm = -f1 / f2
                continue
            elif bnded:
                f1 = f2 = dtm = _F64(0.0)
            else:
                dtm = -f1 / f2
            break
        return self._cauchy_tail(dtm, tsum, col2)

    def _cauchy_tail(self, dtm, tsum, col2):
        if dtm <= 0.0:
            dtm = _F64(0.0)
        tsum += dtm
        for i in range(1, self.n + 1):
            self.z[i] += tsum * self.d[i]
        if self.col > 0:
            for j in range(1, col2 + 1):
                self.wa[2 * self.m + j] += dtm * self.wa[j]
        return 0

    def _freev(self):
        n = self.n
        nenter = 0
        ileave = n + 1
        if self.iter > 0 and self.cnstnd:
            for i in range(1, self.nfree + 1):
                k = int(self.index[i])
                if self.iwhere[k] > 0:
                    ileave -= 1
                    self.indx2[ileave] = k
            for i in range(self.nfree + 1, n + 1):
                k = int(self.index[i])
                if self.iwhere[k] <= 0:
                    nenter += 1
                    self.indx2[nenter] = k
        self.wrk = (ileave < n + 1) or (nenter > 0) or self.updatd
        nfree = 0
        iact = n + 1
        for i in range(1, n + 1):
            if self.iwhere[i] <= 0:
                nfree += 1
                self.index[nfree] = i
            else:
                iact -= 1
                self.index[iact] = i
        self.nfree = nfree
        self.nenter = nenter
        self.ileave = ileave

    def _formk(self):
        """LEL' factorization of K into wn. Returns info."""
        n, m, col, head = self.n, self.m, self.col, self.head
        ws, wy, wn, wn1 = self.ws, self.wy, self.wn, self.snd
        theta = self.theta
        nsub, ind = self.nfree, self.index
        nenter, ileave, indx2 = self.nenter, self.ileave, self.indx2
        if self.updatd:
            if self.iupdat > m:
                for jy in range(1, m):
                    js = m + jy
                    for k in range(m - jy):
                        wn1[jy + k, jy] = wn1[jy + 1 + k, jy + 1]
                    for k in range(m - jy):
                        wn1[js + k, js] = wn1[js + 1 + k, js + 1]
                    for k in range(m - 1):
                        wn1[m + 1 + k, jy] = wn1[m + 2 + k, jy + 1]
            pbegin, pend = 1, nsub
            dbegin, dend = nsub + 1, n
            iy = col
            is_ = m + col
            ipntr = head + col - 1
            if ipntr > m:
                ipntr -= m
            jpntr = head
            for jy in range(1, col + 1):
                js = m + jy
                temp1 = temp2 = temp3 = _F64(0.0)
                for k in range(pbegin, pend + 1):
                    k1 = int(ind[k])
                    temp1 += wy[k1, ipntr] * wy[k1, jpntr]
                for k in range(dbegin, dend + 1):
                    k1 = int(ind[k])
                    temp2 += ws[k1, ipntr] * ws[k1, jpntr]
                    temp3 += ws[k1, ipntr] * wy[k1, jpntr]
                wn1[iy, jy] = temp1
                wn1[is_, js] = temp2
                wn1[is_, jy] = temp3
                jpntr = jpntr % m + 1
            jy = col
            jpntr = head + col - 1
            if jpntr > m:
                jpntr -= m
            ipntr = head
            for i in range(1, col + 1):
                is_ = m + i
                temp3 = _F64(0.0)
                for k in range(pbegin, pend + 1):
                    k1 = int(ind[k])
                    temp3 += ws[k1, ipntr] * wy[k1, jpntr]
                ipntr = ipntr % m + 1
                wn1[is_, jy] = temp3
            upcl = col - 1
        else:
            upcl = col
        ipntr = head
        for iy in range(1, upcl + 1):
            is_ = m + iy
            jpntr = head
            for jy in range(1, iy + 1):
                js = m + jy
                temp1 = temp2 = temp3 = temp4 = _F64(0.0)
                for k in range(1, nenter + 1):
                    k1 = int(indx2[k])
                    temp1 += wy[k1, ipntr] * wy[k1, jpntr]
                    temp2 += ws[k1, ipntr] * ws[k1, jpntr]
                for k in range(ileave, n + 1):
                    k1 = int(indx2[k])
                    temp3 += wy[k1, ipntr] * wy[k1, jpntr]
                    temp4 += ws[k1, ipntr] * ws[k1, jpntr]
                wn1[iy, jy] = wn1[iy, jy] + temp1 - temp3
                wn1[is_, js] = wn1[is_, js] - temp2 + temp4
                jpntr = jpntr % m + 1
            ipntr = ipntr % m + 1
        ipntr = head
        for is_ in range(m + 1, m + upcl + 1):
            jpntr = head
            for jy in range(1, upcl + 1):
                temp1 = temp3 = _F64(0.0)
                for k in range(1, nenter + 1):
                    k1 = int(indx2[k])
                    temp1 += ws[k1, ipntr] * wy[k1, jpntr]
                for k in range(ileave, n + 1):
                    k1 = int(indx2[k])
                    temp3 += ws[k1, ipntr] * wy[k1, jpntr]
                if is_ <= jy + m:
                    wn1[is_, jy] = wn1[is_, jy] + temp1 - temp3
                else:
                    wn1[is_, jy] = wn1[is_, jy] - temp1 + temp3
                jpntr = jpntr % m + 1
            ipntr = ipntr % m + 1
        # upper triangle of WN
        for iy in range(1, col + 1):
            is_ = col + iy
            is1 = m + iy
            for jy in range(1, iy + 1):
                js = col + jy
                js1 = m + jy
                wn[jy, iy] = wn1[iy, jy] / theta
                wn[js, is_] = wn1[is1, js1] * theta
            for jy in range(1, iy):
                wn[jy, is_] = -wn1[is1, jy]
            for jy in range(iy, col + 1):
                wn[jy, is_] = wn1[is1, jy]
            wn[iy, iy] += self.sy[iy, iy]
        info = _dpofa(wn, col, lambda a: a)
        if info != 0:
            return -1
        col2 = 2 * col
        for js in range(col + 1, col2 + 1):
            # dtrsl job 11 on the (1,1) block, rhs = column js rows 1..col
            b = wn[:, js]
            info = _dtrsl(wn, col, b, 11, lambda a: a, lambda a: a)
            if info != 0:
                return -1
        for is_ in range(col + 1, col2 + 1):
            for js in range(is_, col2 + 1):
                wn[is_, js] += _ddot(col, wn[:, is_], 1, wn[:, js], 1)
        info = _dpofa(wn, col, lambda a: col + a)
        if info != 0:
            return -2
        return 0

    def _cmprlb(self):
        """r = -Z'B(xcp-x) - Z'g. Returns info."""
        n, m, col, head = self.n, self.m, self.col, self.head
        x, g, z, r, wa = self.x, self.g, self.z, self.r, self.wa
        theta = self.theta
        if not self.cnstnd and col > 0:
            for i in range(1, n + 1):
                r[i] = -g[i]
            return 0
        for i in range(1, self.nfree + 1):
            k = int(self.index[i])
            r[i] = -theta * (z[k] - x[k]) - g[k]
        # bmv with v = wa[2m+1..], p = wa[1..]
        info = self._bmv(wa[2 * m:], wa)
        if info != 0:
            return -8
        pointr = head
        for j in range(1, col + 1):
            a1 = wa[j]
            a2 = theta * wa[col + j]
            for i in range(1, self.nfree + 1):
                k = int(self.index[i])
                r[i] = r[i] + self.wy[k, pointr] * a1 + self.ws[k, pointr] * a2
            pointr = pointr % m + 1
        return 0

    def _subsm(self):
        """Subspace minimization (v2.1: backtrack to the box). Returns
        info; updates z in place (z holds x^cp on entry)."""
        n, m, col, head = self.n, self.m, self.col, self.head
        nsub, ind = self.nfree, self.index
        l, u, nbd = self.l, self.u, self.nbd
        x, d = self.z, self.r  # x := z (xcp), d := r
        ws, wy, theta, wn = self.ws, self.wy, self.theta, self.wn
        wv = self.wa
        if nsub <= 0:
            return 0
        pointr = head
        for i in range(1, col + 1):
            temp1 = temp2 = _F64(0.0)
            for j in range(1, nsub + 1):
                k = int(ind[j])
                temp1 += wy[k, pointr] * d[j]
                temp2 += ws[k, pointr] * d[j]
            wv[i] = temp1
            wv[col + i] = theta * temp2
            pointr = pointr % m + 1
        col2 = 2 * col
        info = _dtrsl(wn, col2, wv, 11, lambda a: a, lambda a: a)
        if info != 0:
            return info
        for i in range(1, col + 1):
            wv[i] = -wv[i]
        info = _dtrsl(wn, col2, wv, 1, lambda a: a, lambda a: a)
        if info != 0:
            return info
        pointr = head
        for jy in range(1, col + 1):
            js = col + jy
            for i in range(1, nsub + 1):
                k = int(ind[i])
                d[i] = d[i] + wy[k, pointr] * wv[jy] / theta \
                    + ws[k, pointr] * wv[js]
            pointr = pointr % m + 1
        for i in range(1, nsub + 1):
            d[i] /= theta
        alpha = _F64(1.0)
        temp1 = alpha
        ibd = 0
        for i in range(1, nsub + 1):
            k = int(ind[i])
            dk = d[i]
            if nbd[k] != 0:
                if dk < 0.0 and nbd[k] <= 2:
                    temp2 = l[k] - x[k]
                    if temp2 >= 0.0:
                        temp1 = _F64(0.0)
                    elif dk * alpha < temp2:
                        temp1 = temp2 / dk
                elif dk > 0.0 and nbd[k] >= 2:
                    temp2 = u[k] - x[k]
                    if temp2 <= 0.0:
                        temp1 = _F64(0.0)
                    elif dk * alpha > temp2:
                        temp1 = temp2 / dk
                if temp1 < alpha:
                    alpha = temp1
                    ibd = i
        if alpha < 1.0:
            dk = d[ibd]
            k = int(ind[ibd])
            if dk > 0.0:
                x[k] = u[k]
                d[ibd] = 0.0
            elif dk < 0.0:
                x[k] = l[k]
                d[ibd] = 0.0
        for i in range(1, nsub + 1):
            k = int(ind[i])
            x[k] += alpha * d[i]
        return 0

    def _matupd(self):
        n, m = self.n, self.m
        if self.iupdat <= m:
            self.col = self.iupdat
            self.itail = (self.head + self.iupdat - 2) % m + 1
        else:
            self.itail = self.itail % m + 1
            self.head = self.head % m + 1
        for i in range(1, n + 1):
            self.ws[i, self.itail] = self.d[i]
            self.wy[i, self.itail] = self.r[i]
        self.theta = self.rr / self.dr
        if self.iupdat > m:
            for j in range(1, self.col):
                for k in range(j):
                    self.ss[1 + k, j] = self.ss[2 + k, j + 1]
                for k in range(self.col - j):
                    self.sy[j + k, j] = self.sy[j + 1 + k, j + 1]
        pointr = self.head
        for j in range(1, self.col):
            self.sy[self.col, j] = _ddot(n, self.d, 1, self.wy[:, pointr], 1)
            self.ss[j, self.col] = _ddot(n, self.ws[:, pointr], 1, self.d, 1)
            pointr = pointr % m + 1
        if self.stp == 1.0:
            self.ss[self.col, self.col] = self.dtd
        else:
            self.ss[self.col, self.col] = self.stp * self.stp * self.dtd
        self.sy[self.col, self.col] = self.dr

    def _formt(self):
        col, theta = self.col, self.theta
        wt, sy, ss = self.wt, self.sy, self.ss
        for j in range(1, col + 1):
            wt[1, j] = theta * ss[1, j]
        for i in range(2, col + 1):
            for j in range(i, col + 1):
                k1 = min(i, j) - 1
                ddum = _F64(0.0)
                for k in range(1, k1 + 1):
                    ddum += sy[i, k] * sy[j, k] / sy[k, k]
                wt[i, j] = ddum + theta * ss[i, j]
        info = _dpofa(wt, col, lambda a: a)
        return -3 if info != 0 else 0

    def _lnsrlb_start(self):
        n = self.n
        self.dtd = _ddot(n, self.d, 1, self.d, 1)
        self.dnorm = np.sqrt(self.dtd)
        stpmx = _F64(1e10)
        if self.cnstnd:
            if self.iter == 0:
                stpmx = _F64(1.0)
            else:
                for i in range(1, n + 1):
                    a1 = self.d[i]
                    if self.nbd[i] != 0:
                        if a1 < 0.0 and self.nbd[i] <= 2:
                            a2 = self.l[i] - self.x[i]
                            if a2 >= 0.0:
                                stpmx = _F64(0.0)
                            elif a1 * stpmx < a2:
                                stpmx = a2 / a1
                        elif a1 > 0.0 and self.nbd[i] >= 2:
                            a2 = self.u[i] - self.x[i]
                            if a2 <= 0.0:
                                stpmx = _F64(0.0)
                            elif a1 * stpmx > a2:
                                stpmx = a2 / a1
        self.stpmx = stpmx
        if self.iter == 0 and not self.boxed:
            self.stp = min(_F64(1.0) / self.dnorm, stpmx)
        else:
            self.stp = _F64(1.0)
        self.t[1:] = self.x[1:]
        self.r[1:] = self.g[1:]
        self.fold = self.f
        self.ifun = 0
        self.iback = 0
        self.ls = {"task": "START", "stpmax": stpmx}

    def _lnsrlb_step(self):
        """One dcsrch round. Returns 'FG' (caller must evaluate f,g at
        self.x), 'NEW_X', or 'ERROR'."""
        n = self.n
        self.gd = _ddot(n, self.g, 1, self.d, 1)
        if self.ifun == 0:
            self.gdold = self.gd
            if self.gd >= 0.0:
                self.info = -4
                return "ERROR"
        task, self.stp = _dcsrch(self.ls, self.f, self.gd, self.stp)
        if task == "FG":
            self.ifun += 1
            self.iback = self.ifun - 1
            if self.stp == 1.0:
                self.x[1:] = self.z[1:]
            else:
                for i in range(1, n + 1):
                    self.x[i] = self.stp * self.d[i] + self.t[i]
            return "FG"
        if task == "ERROR":
            self.info = -4
            return "ERROR"
        return "NEW_X"


class RefLBFGSB:
    """Reverse-communication driver == the reference's findmax_bfgs loop
    + setulb/mainlb state machine (bfgs.cpp:83-138). The caller supplies
    raw objective values; THIS class runs the central-difference
    gradient protocol (getgradient, bfgs.cpp:22-65):

        opt = RefLBFGSB(x0, lower, upper)
        while not opt.done:
            fs = [fun(p) for p in opt.points()]   # batchable
            opt.supply(fs)
        x_opt, f_opt = opt.x, opt.f
    """

    def __init__(self, x0, lower, upper, m=MVAL):
        x0 = np.asarray(x0, _F64)
        self.nn = x0.shape[0]
        self.lower = np.asarray(lower, _F64)
        self.upper = np.asarray(upper, _F64)
        nbd = np.full(self.nn, 2, np.int64)
        self.sm = _Mainlb(self.nn, m, x0, self.lower, self.upper, nbd)
        self.done = False
        self._phase = "initial_fg"  # driver is computing f,g BEFORE setulb
        self._pts = None

    # -- FD gradient protocol (getgradient/Yanggradient) -------------------

    def _fd_points(self, x):
        """Evaluation points for one FG request, EXACTLY the sequence
        findmax_bfgs makes per FG task: x (like), x (getgradient's f0),
        then per coordinate the central pair x+eh, x-eh -- or ONE
        double-shifted point when a shift would cross a bound
        (Yanggradient, bfgs.cpp:22-43)."""
        n = self.nn
        pts = [x.copy(), x.copy()]
        self._fd_plan = []
        for i in range(n):
            eh = (1e-8 * (abs(x[i]) + 1.0)) ** 0.67
            x0 = x.copy()
            x1 = x.copy()
            x0[i] -= eh
            x1[i] += eh
            if x0[i] < self.lower[i]:
                x1[i] += eh
                self._fd_plan.append(("lo", i, eh, len(pts)))
                pts.append(x1)
            elif x1[i] > self.upper[i]:
                x0[i] -= eh
                self._fd_plan.append(("hi", i, eh, len(pts)))
                pts.append(x0)
            else:
                self._fd_plan.append(("mid", i, eh, len(pts)))
                pts.append(x1)
                pts.append(x0)
        return pts

    def _fd_assemble(self, fs):
        """(f, g) from the evaluated points (fs aligned with points())."""
        f_like = fs[0]
        f0 = fs[1]
        g = np.zeros(self.nn, _F64)
        for kind, i, eh, off in self._fd_plan:
            if kind == "lo":
                g[i] = (fs[off] - f0) / (eh * 2.0)
            elif kind == "hi":
                g[i] = (f0 - fs[off]) / (eh * 2.0)
            else:
                g[i] = (fs[off] - fs[off + 1]) / (eh * 2.0)
        x = self._x_req
        for i in range(self.nn):
            if x[i] <= self.lower[i] and g[i] > 0.0:
                g[i] = 0.0
            if x[i] >= self.upper[i] and g[i] < 0.0:
                g[i] = 0.0
        return f_like, g

    # -- public protocol ----------------------------------------------------

    def points(self):
        if self._pts is None:
            self._x_req = self.sm.x[1:].copy()
            self._pts = self._fd_points(self._x_req)
        return self._pts

    @property
    def x(self):
        return self.sm.x[1:].copy()

    @property
    def f(self):
        return float(self.sm.f)

    def supply(self, fs):
        """Feed the objective values for points(); advances the state
        machine until it needs another evaluation or terminates."""
        f, g = self._fd_assemble([_F64(v) for v in fs])
        self._pts = None
        sm = self.sm
        sm.f = f
        sm.g[1:] = g
        if self._phase == "initial_fg":
            # driver computed f,g; first setulb call enters mainlb START
            # -> FG_START -> immediately back for f,g?? No: mainlb START
            # falls through to "Compute f0 and g0" AFTER init; the task
            # FG_ST return re-enters at L111 with the supplied values.
            # The driver's pre-computed f,g satisfy that request, so we
            # jump straight to L111.
            self._phase = "main"
            sbgnrm = sm._projgr()
            if sbgnrm <= PGTOL:
                self.done = True
                return
            self._outer_loop()
            return
        if self._phase == "in_lnsrch":
            self._lnsrch_resume()
            return
        raise RuntimeError(f"bad phase {self._phase}")

    # -- mainlb control flow -------------------------------------------------

    def _outer_loop(self):
        """From L222 until the next FG request or termination."""
        sm = self.sm
        while True:
            # L222
            if (not sm.cnstnd) and sm.col > 0:
                sm.z[1:] = sm.x[1:]
                sm.wrk = sm.updatd
            else:
                sbgnrm = sm._projgr()
                info = sm._cauchy(sbgnrm)
                if info != 0:
                    sm.col = 0
                    sm.head = 1
                    sm.theta = _F64(1.0)
                    sm.iupdat = 0
                    sm.updatd = False
                    continue
                sm._freev()
            # L333
            if not (sm.nfree == 0 or sm.col == 0):
                info = 0
                if sm.wrk:
                    info = sm._formk()
                if info != 0:
                    sm.col = 0
                    sm.head = 1
                    sm.theta = _F64(1.0)
                    sm.iupdat = 0
                    sm.updatd = False
                    continue
                info = sm._cmprlb()
                if info == 0:
                    info = sm._subsm()
                if info != 0:
                    sm.col = 0
                    sm.head = 1
                    sm.theta = _F64(1.0)
                    sm.iupdat = 0
                    sm.updatd = False
                    continue
            # L555: d = z - x, start the line search
            for i in range(1, sm.n + 1):
                sm.d[i] = sm.z[i] - sm.x[i]
            sm._lnsrlb_start()
            status = sm._lnsrlb_step()
            # mainlb checks (info != 0 || iback >= 20) BEFORE honouring
            # the FG request -- the line search is capped at 20 evals
            if status == "FG" and sm.iback < 20:
                self._phase = "in_lnsrch"
                return
            if not self._post_lnsrch(status):
                return
            # loop back to L222

    def _lnsrch_resume(self):
        sm = self.sm
        status = sm._lnsrlb_step()
        if status == "FG" and sm.iback < 20:
            return  # stay in_lnsrch; caller evaluates again
        self._phase = "main"
        if self._post_lnsrch(status):
            self._outer_loop()

    def _post_lnsrch(self, status):
        """After the line search ends (NEW_X / ERROR / too many steps):
        convergence tests + L-BFGS update. True = continue the outer
        loop, False = terminated (self.done set)."""
        sm = self.sm
        if status == "ERROR" or sm.iback >= 20:
            # restore previous iterate
            sm.x[1:] = sm.t[1:]
            sm.g[1:] = sm.r[1:]
            sm.f = sm.fold
            if sm.col == 0:
                sm.iter += 1
                self.done = True  # ABNORMAL_TERMINATION_IN_LNSRCH
                return False
            sm.info = 0
            sm.col = 0
            sm.head = 1
            sm.theta = _F64(1.0)
            sm.iupdat = 0
            sm.updatd = False
            return True
        # NEW_X (L777 after prn2lb)
        sm.iter += 1
        sbgnrm = sm._projgr()
        if sbgnrm <= PGTOL:
            self.done = True
            return False
        ddum = max(abs(sm.fold), abs(sm.f), _F64(1.0))
        if sm.fold - sm.f <= sm.tol * ddum:
            self.done = True
            return False
        # r = g - r (y); rr = y'y; dr/ddum per stp
        for i in range(1, sm.n + 1):
            sm.r[i] = sm.g[i] - sm.r[i]
        rr = _ddot(sm.n, sm.r, 1, sm.r, 1)
        if sm.stp == 1.0:
            dr = sm.gd - sm.gdold
            ddum = -sm.gdold
        else:
            dr = (sm.gd - sm.gdold) * sm.stp
            for i in range(1, sm.n + 1):
                sm.d[i] *= sm.stp
            ddum = -sm.gdold * sm.stp
        if dr <= EPSMCH * ddum:
            sm.updatd = False
            return True
        sm.updatd = True
        sm.iupdat += 1
        sm.rr, sm.dr = rr, dr
        sm._matupd()
        info = sm._formt()
        if info != 0:
            sm.col = 0
            sm.head = 1
            sm.theta = _F64(1.0)
            sm.iupdat = 0
            sm.updatd = False
        return True


def findmax_ref(fun, x0, lower, upper):
    """Serial convenience wrapper mirroring findmax_bfgs for ONE
    problem: maximize -fun... NOTE the reference MINIMIZES `fun` and
    returns -fun(x*); here we return (x*, f*) of the minimization."""
    opt = RefLBFGSB(np.asarray(x0, _F64), lower, upper)
    while not opt.done:
        fs = [fun(p) for p in opt.points()]
        opt.supply(fs)
    return opt.x, opt.f
