"""Benchmark: EM-iteration HMM-cell throughput vs the reference C++ binary.

Prints ONE JSON line:
  {"metric": "em_cells_per_s", "value": ..., "unit": "cells/s",
   "vs_baseline": ...}

"cells" follows BASELINE.json's north-star definition: sites x individuals
x states (K=2) processed by the fwd-bwd E-step once per EM iteration.
`value` is our engine's cells/s per full EM iteration (E-step + both
M-steps, freq_est 1) on the available accelerator. `vs_baseline` is the
matched-config per-EM-iteration wallclock ratio T_ref / T_ours, with the
reference binary (fgvieira/ngsF-HMM) built from /root/reference and timed
on this host's CPU with n_threads = min(n_cpu, n_ind); reference per-iter
time is isolated as (T(1+K iters) - T(1 iter)) / K to exclude its
IO/init/decode overhead. If the reference cannot be built/run here, a
fallback cells/s measured on the dev host is used (noted on stderr).

Env knobs: NGSF_BENCH_SITES, NGSF_BENCH_IND, NGSF_BENCH_ITERS,
NGSF_BENCH_SKIP_REF=1, NGSF_BENCH_REF_TIMEOUT (seconds, default 360:
watchdog on the reference leg -- on expiry the bench logs the failure
to stderr and falls back to the recorded dev-host baseline).
"""

import gzip
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
REF_SRC = pathlib.Path("/root/reference")
REF_BUILD = REPO / "tests" / ".refbin"

S = int(os.environ.get("NGSF_BENCH_SITES", 100_000))
N = int(os.environ.get("NGSF_BENCH_IND", 32))
ITERS = int(os.environ.get("NGSF_BENCH_ITERS", 5))
REF_ITERS = 3  # extra iterations used to isolate ref per-iter time

# Reference em-iteration cells/s measured on the dev host (AMD EPYC-class,
# 32 threads, config 100k x 32) -- fallback only.
REF_FALLBACK_CELLS_PER_S = 2.0e6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_inputs(rng):
    """Synthetic low-coverage GLs + positions (log-space, normalised)."""
    depth = rng.poisson(2.0, size=(S, N))
    truth = rng.integers(0, 3, size=(S, N))
    err = 0.01
    p_der = np.array([err, 0.5, 1 - err])[truth]
    der = rng.binomial(depth, p_der)
    k = der[..., None].astype(np.float64)
    n = depth[..., None].astype(np.float64)
    p = np.array([err, 0.5, 1 - err])[None, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        ll = k * np.log(p) + (n - k) * np.log1p(-p)
    ll = np.where(n == 0, 0.0, ll)
    # normalise in log space
    m = ll.max(-1, keepdims=True)
    lse = m + np.log(np.exp(ll - m).sum(-1, keepdims=True))
    gl = ll - lse  # [S, N, 3] normalised log GLs
    pos = np.cumsum(rng.integers(100, 200_000, size=S))
    return gl, pos


def write_ref_inputs(d, gl, pos):
    glf = d / "bench.glf"
    # reference binary mode: raw doubles, site-major [S][N][3]
    gl.astype(np.float64).tofile(glf)
    posf = d / "bench.pos.gz"
    with gzip.open(posf, "wt") as fh:
        for p in pos:
            fh.write(f"chr1\t{int(p)}\n")
    return glf, posf


def build_reference():
    exe = REF_BUILD / "ngsF-HMM"
    if exe.exists():
        return exe
    if not REF_SRC.exists():
        return None
    REF_BUILD.mkdir(parents=True, exist_ok=True)
    shim = REPO / "tests" / "gsl_shim"
    cpp = [
        "shared/gen_func.cpp", "shared/read_data.cpp", "shared/HMM.cpp",
        "shared/bfgs.cpp", "parse_args.cpp", "EM.cpp", "ngsF-HMM.cpp",
        "shared/threadpool.c",
    ]
    try:
        subprocess.run(
            ["g++", "-O3", "-w", f"-I{shim}", f"-I{REF_SRC}/shared"]
            + [str(REF_SRC / f) for f in cpp]
            + ["-lz", "-lpthread", "-o", str(exe)],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log(f"[bench] cannot build reference binary: {e}")
        return None
    return exe


def time_reference(exe, d, glf, posf):
    """One reference run; per-iteration time parsed from its own
    verbose-1 timers (EM.cpp:89-95 prints "time: N (s)" per iteration) --
    avoids a second full run, which can exceed time budgets on loaded
    hosts. Exactly REF_ITERS iterations via min/max iters + a huge
    epsilon (min==max is rejected, parse_args.cpp:221)."""
    import re

    nthreads = min(os.cpu_count() or 1, N)
    args = (
        f"--geno {glf.name} --loglkl --pos {posf.name} --n_ind {N} "
        f"--n_sites {S} --freq 0.2 --indF 0.2,0.05 --n_threads {nthreads} "
        f"--seed 7 --verbose 1 --min_iters {REF_ITERS} "
        f"--max_iters {REF_ITERS + 1} --min_epsilon 100 --out ref1"
    )
    r = subprocess.run(
        [str(exe)] + args.split(), cwd=d, capture_output=True, text=True,
        timeout=int(os.environ.get("NGSF_BENCH_REF_TIMEOUT", 360)),
    )
    if r.returncode != 0:
        raise RuntimeError(r.stdout + r.stderr)
    times = [int(m) for m in re.findall(r"time: (\d+) \(s\)", r.stdout)]
    if not times:
        raise RuntimeError("no per-iteration timers in reference output")
    per_iter = max(sum(times) / len(times), 1.0)
    log(f"[bench] reference: per-iter times {times}s "
        f"-> {per_iter:.1f}s/iter ({nthreads} threads)")
    return per_iter


def time_ours(gl, pos):
    import jax
    import jax.numpy as jnp

    from ngsf_hmm_tpu.models.em import em_iteration, init_state

    dev = jax.devices()[0]
    log(f"[bench] our engine on {dev.platform}:{dev.device_kind}")
    dtype = jnp.float32
    dist = np.empty(S, np.float64)
    dist[0] = pos[0] / 1e6
    dist[1:] = np.diff(pos) / 1e6

    gl_d = jax.device_put(jnp.asarray(gl, dtype), dev)
    dist_d = jax.device_put(jnp.asarray(dist, dtype), dev)
    state = init_state(
        gl_d,
        jnp.full((S,), 0.2, dtype),
        jnp.full((N,), 0.2, dtype),
        jnp.full((N,), 0.05, dtype),
    )

    from ngsf_hmm_tpu.ops.maf_pallas import prepare_gl_tiles

    gl_tiles = prepare_gl_tiles(jnp.exp(gl_d))

    def step(st):
        st2, _ = em_iteration(
            gl_d, dist_d, st, numerics="pallas", gl_tiles=gl_tiles
        )
        return st2

    def hard_sync(st):
        # On tunneled backends jax.block_until_ready can return before
        # queued work finishes; a device-side reduction pulled to host is
        # the only trustworthy sync (and transfers 4 bytes, not arrays).
        return float(np.asarray(jnp.sum(st.ind_lkl)))

    # Warm up two steps: the first absorbs compilation, the second gets
    # the state onto a realistic EM trajectory.
    state = step(step(state))
    hard_sync(state)
    reps = max(ITERS, 8)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    hard_sync(state)
    per_iter = (time.perf_counter() - t0) / reps
    log(f"[bench] ours: {per_iter * 1e3:.2f} ms/EM-iter ({reps} iters, 1 sync)")
    return per_iter


def main():
    rng = np.random.default_rng(20260816)
    gl, pos = make_inputs(rng)

    t_ours = time_ours(gl, pos)
    cells = S * N * 2
    ours_cps = cells / t_ours

    vs = None
    if os.environ.get("NGSF_BENCH_SKIP_REF") != "1":
        exe = build_reference()
        if exe is not None:
            try:
                with tempfile.TemporaryDirectory() as td:
                    d = pathlib.Path(td)
                    glf, posf = write_ref_inputs(d, gl, pos)
                    t_ref = time_reference(exe, d, glf, posf)
                    vs = t_ref / t_ours
            except Exception as e:  # noqa: BLE001
                log(f"[bench] reference run failed: {e}")
    fallback = vs is None
    if fallback:
        vs = ours_cps / REF_FALLBACK_CELLS_PER_S
        log("[bench] WARNING: reference leg did not run; vs_baseline uses "
            f"the canned fallback {REF_FALLBACK_CELLS_PER_S:.3g} cells/s "
            "measured once on the dev host -- treat it as indicative only")

    out = {
        "metric": "em_cells_per_s",
        "value": round(ours_cps, 1),
        "unit": "cells/s",
        "vs_baseline": round(vs, 2),
        "config": f"{S}x{N}",
        "ms_per_em_iter": round(t_ours * 1e3, 2),
    }
    if fallback:
        out["vs_baseline_is_fallback"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
