"""Benchmark: EM-iteration HMM-cell throughput vs the reference C++ binary.

Prints ONE JSON line:
  {"metric": "em_cells_per_s", "value": ..., "unit": "cells/s",
   "vs_baseline": ...}

"cells" follows BASELINE.json's north-star definition: sites x individuals
x states (K=2) processed by the fwd-bwd E-step once per EM iteration.

Two legs:
 - SMALL (default 100k x 32, host-synthesised GLs): matched-config
   comparison against the reference binary (fgvieira/ngsF-HMM) built from
   /root/reference and timed on this host's CPU with
   n_threads = min(n_cpu, n_ind); `vs_baseline` is the per-EM-iteration
   wallclock ratio T_ref / T_ours from this leg. Reference per-iter time
   comes from its own verbose-1 timers.
 - BIG (default 1M x 100 = the BASELINE.md scale config, on-device
   synthesised GLs -- the tunnel moves ~25MB/s, a host 1.2GB upload would
   dwarf the run): headline `value`/`ms_per_em_iter` numbers, plus a
   bytes-moved roofline estimate (`roofline_ms`, `roofline_frac`) showing
   how close the fused pallas iteration runs to the chip's ~600 GB/s
   effective stream bandwidth (measured through the same 3-slab pipeline;
   HBM peak is 819 GB/s on a v5e).

Timing: on the tunneled TPU the only trustworthy sync is a device scalar
pulled to host, which itself costs a ~27ms round trip; every timing below
queues `reps` iterations per sync and subtracts a measured sync-only
baseline so the RTT does not inflate per-iteration numbers (see
CLAUDE.md "Environment gotchas").

A third STREAM leg (default 10M x 100 through models/streaming.py,
device-synthesised chunks -- see time_stream_10m) records the BASELINE
ladder rung above 1M as a measured number.

Env knobs: NGSF_BENCH_SITES, NGSF_BENCH_IND, NGSF_BENCH_ITERS,
NGSF_BENCH_BIG=0 (skip the 1M x 100 leg), NGSF_BENCH_BIG_SITES,
NGSF_BENCH_BIG_IND, NGSF_BENCH_STREAM=0 (skip the 10M stream leg),
NGSF_BENCH_STREAM_SITES/IND/CHUNK, NGSF_BENCH_SKIP_REF=1,
NGSF_BENCH_REF_TIMEOUT (seconds, default 360: watchdog on the reference
leg -- on expiry the bench logs the failure to stderr and falls back to
the recorded dev-host baseline).
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
BIG = os.environ.get("NGSF_BENCH_BIG", "1") == "1"
BIG_S = int(os.environ.get("NGSF_BENCH_BIG_SITES", 1_000_000))
BIG_N = int(os.environ.get("NGSF_BENCH_BIG_IND", 100))
REF_ITERS = 3  # extra iterations used to isolate ref per-iter time

# Reference em-iteration cells/s measured on the dev host (AMD EPYC-class,
# 32 threads, config 100k x 32) -- fallback only.
REF_FALLBACK_CELLS_PER_S = 2.0e6

# v5e effective stream bandwidth through the pallas 3-slab pipeline
# (HBM peak 819 GB/s) -- FALLBACK roofline denominator only: every big-leg
# run measures the actual rate with a read-stream pallas probe over ~1 GB
# (measure_stream_gbps) and records it as "roofline_gbps" in the JSON.
STREAM_GBPS = 600.0


def measure_stream_gbps(t_sync):
    """Measured 3-slab HBM stream bandwidth: a read-only pallas kernel
    over ~1 GB laid out exactly like the HMM kernels' emission/distance
    slabs ([steps, 8, C] f32, R rows per grid step), so the roofline
    denominator is self-calibrating instead of the STREAM_GBPS constant."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        return None
    R, C = 16, 2048
    steps = 2800  # 3 slabs x steps x R x 8 x C x 4 B ~= 2.2 GB
    slab = lambda: jnp.ones((steps * R, 8, C), jnp.float32)
    a, b, c = slab(), slab(), slab()

    def kernel(a_ref, b_ref, c_ref, o_ref):
        o_ref[0] = (
            jnp.sum(a_ref[...], axis=0)
            + jnp.sum(b_ref[...], axis=0)
            + jnp.sum(c_ref[...], axis=0)
        )

    blk = lambda: pl.BlockSpec(
        (R, 8, C), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    run = jax.jit(lambda a, b, c: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((steps, 8, C), jnp.float32),
        grid=(steps,),
        in_specs=[blk(), blk(), blk()],
        out_specs=pl.BlockSpec(
            (1, 8, C), lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
    )(a, b, c))
    out = run(a, b, c)
    float(np.asarray(jnp.sum(out[0])))  # warm
    t0 = time.perf_counter()
    for _ in range(4):
        out = run(a, b, c)
    float(np.asarray(jnp.sum(out[0])))
    dt = max((time.perf_counter() - t0 - t_sync) / 4, 1e-9)
    gbps = 3 * steps * R * 8 * C * 4 / dt / 1e9
    log(f"[bench] measured 3-slab stream bandwidth: {gbps:.0f} GB/s")
    return gbps


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


def _sync_baseline():
    """Median cost of the scalar-sync round trip itself (subtracted from
    every queued-iterations timing)."""
    import jax.numpy as jnp

    z = jnp.zeros((8,), jnp.float32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(jnp.sum(z)))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    log(f"[bench] sync round-trip baseline: {t * 1e3:.1f} ms")
    return t


def _time_em_loop(step, state0, hard_sync, reps, t_sync):
    """Warm up, then queue `reps` EM iterations behind ONE sync; the
    sync round trip is subtracted."""
    state = step(step(state0))
    hard_sync(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    hard_sync(state)
    per_iter = (time.perf_counter() - t0 - t_sync) / reps
    return max(per_iter, 1e-9)


def _make_step(gl, dist, gl_tiles):
    """Fused pallas EM step threading BOTH cross-iteration caches: the
    slab layout (prep_slabs) and the warm-started M-step's L-BFGS memory
    (opt_memory). Returns (step, stats_holder); stats_holder["opt_iters"]
    tracks the last iteration's outer L-BFGS count (device scalar, no
    sync until read)."""
    from ngsf_hmm_tpu.models.em import em_iteration

    holder = {"slabs": None, "opt": None, "opt_iters": None}

    def step(st):
        st2, stats, slabs, opt = em_iteration(
            gl, dist, st, numerics="pallas", gl_tiles=gl_tiles,
            prep_slabs=holder["slabs"], return_prep=True,
            opt_memory=holder["opt"], return_opt=True,
            defer_emissions=True,  # as run_em's loop: e_prob and (on
            defer_posteriors=True,  # the slab route) the unpacked
            #                         p_ibd are write-only in-loop
        )
        holder["slabs"] = slabs
        holder["opt"] = opt
        holder["opt_iters"] = stats.opt_iters
        return st2

    return step, holder


def time_ours_small(gl, pos, t_sync):
    import jax
    import jax.numpy as jnp

    from ngsf_hmm_tpu.models.em import init_state
    from ngsf_hmm_tpu.ops.maf_pallas import prepare_gl_tiles

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
    gl_tiles = prepare_gl_tiles(jnp.exp(gl_d))

    step, holder = _make_step(gl_d, dist_d, gl_tiles)

    def hard_sync(st):
        # On tunneled backends jax.block_until_ready can return before
        # queued work finishes; a device-side reduction pulled to host is
        # the only trustworthy sync (and transfers 4 bytes, not arrays).
        return float(np.asarray(jnp.sum(st.ind_lkl)))

    reps = max(ITERS, 24)
    per_iter = _time_em_loop(step, state, hard_sync, reps, t_sync)
    opt_iters = int(np.asarray(holder["opt_iters"]))
    log(f"[bench] ours (small {S}x{N}): {per_iter * 1e3:.2f} ms/EM-iter "
        f"({reps} iters, 1 sync; warm L-BFGS outer iters: {opt_iters})")
    return per_iter, opt_iters


def time_ours_big(t_sync, Sb=None, Nb=None, label="big", lean=False):
    """BASELINE-scale in-HBM legs: GLs synthesised ON DEVICE.

    Default = the 1M x 100 headline config. The WIDE leg (round-4
    VERDICT ask #1: nothing was measured above N=100) calls this with
    Nb=1000 and lean=True: the state is built with placeholder
    e_prob/p_ibd -- the fused loop with both defers never reads them,
    and init_state's full [S, N, 2] e_prob build is a multi-GB
    transient at 250k x 1000 that OOMs the v5e."""
    import jax
    import jax.numpy as jnp

    from ngsf_hmm_tpu.models.em import EMState, init_state
    from ngsf_hmm_tpu.ops.maf import macro_schedule
    from ngsf_hmm_tpu.ops.maf_pallas import prepare_gl_tiles, slab_geom_ok

    Sb = BIG_S if Sb is None else Sb
    Nb = BIG_N if Nb is None else Nb
    slab_maf = macro_schedule(Nb) is not None and slab_geom_ok(Sb, Nb)
    dt = jnp.float32

    @jax.jit
    def synth(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        err = 0.01
        depth = jax.random.poisson(k1, 2.0, (Sb, Nb)).astype(dt)
        truth = jax.random.randint(k2, (Sb, Nb), 0, 3)
        p_der = jnp.array([err, 0.5, 1 - err], dt)[truth]
        mean = depth * p_der
        sd = jnp.sqrt(jnp.maximum(depth * p_der * (1 - p_der), 1e-6))
        der = jnp.clip(
            jnp.round(mean + sd * jax.random.normal(k3, (Sb, Nb))),
            0.0, depth,
        )
        k = der[..., None]
        n = depth[..., None]
        p = jnp.array([err, 0.5, 1 - err], dt)[None, None, :]
        ll = k * jnp.log(p) + (n - k) * jnp.log1p(-p)
        ll = jnp.where(n == 0, 0.0, ll)
        gl = ll - jax.scipy.special.logsumexp(ll, axis=-1, keepdims=True)
        step_bp = jax.random.randint(k4, (Sb,), 100, 200_000).astype(dt)
        return gl, step_bp / 1e6

    t0 = time.perf_counter()
    gl, dist = synth(jax.random.PRNGKey(20260817))
    if lean:
        state = EMState(
            freq=jnp.full((Sb,), 0.2, dt),
            indF=jnp.full((Nb,), 0.2, dt),
            alpha=jnp.full((Nb,), 0.05, dt),
            e_prob=jnp.zeros((1, 1, 2), dt),
            p_ibd=jnp.zeros((1, 1), dt),
            ind_lkl=jnp.zeros((Nb,), dt),
        )
    else:
        state = init_state(
            gl, jnp.full((Sb,), 0.2, dt), jnp.full((Nb,), 0.2, dt),
            jnp.full((Nb,), 0.05, dt),
        )
    # the slab est_maf route consumes the resident v2 gl slabs; the
    # [n_tiles, N, TS] tiling is only needed on its fallback
    gl_tiles = None if slab_maf else prepare_gl_tiles(jnp.exp(gl))
    float(np.asarray(jnp.sum(state.e_prob)))
    log(f"[bench] {label} leg ({Sb}x{Nb}): on-device synth+init "
        f"{time.perf_counter() - t0:.1f}s")

    step, holder = _make_step(gl, dist, gl_tiles)

    def hard_sync(st):
        return float(np.asarray(jnp.sum(st.ind_lkl)))

    # THREE separately-synced 8-iteration windows: the median is the
    # headline and the per-window values are reported as the spread
    # (round-4 VERDICT Weak #3: a single estimate made run-to-run
    # tunnel variance look like regressions)
    windows = [
        _time_em_loop(step, state, hard_sync, 8, t_sync) for _ in range(3)
    ]
    per_iter = float(np.median(windows))
    opt_iters = int(np.asarray(holder["opt_iters"]))
    log(f"[bench] ours ({label} {Sb}x{Nb}): "
        + " ".join(f"{w * 1e3:.2f}" for w in windows)
        + f" ms/EM-iter over 3 windows -> median {per_iter * 1e3:.2f} "
        f"(8 iters/window, 1 sync each; warm L-BFGS outer iters: "
        f"{opt_iters})")

    # est_maf alone: the one COMPUTE-heavy stage (macro-stepping speed
    # mode: K0 real + ~2x-cost gradient passes instead of the damped
    # quirk's ~101, ops/maf.py docstring), so the bytes-only roofline
    # under-counts it; measured empirically so the JSON decomposes the
    # iteration honestly.
    # with defer_posteriors the state's p_ibd is a stale placeholder;
    # the est_maf-alone timing needs a REAL posterior (the fixed
    # point's trip counts are data-dependent)
    if slab_maf:
        # measure the route the loop actually runs: the slab fixed
        # point off the v2 gl slabs + the raw posterior slab the
        # posterior kernel emits in-loop
        from ngsf_hmm_tpu.models.hmm_pallas import (
            freq_compact, posteriors_fused, prepare_gl_inputs,
        )
        from ngsf_hmm_tpu.ops.maf_pallas import est_maf_slab

        prep2 = prepare_gl_inputs(jnp.exp(gl), dist)
        fc = freq_compact(state.freq, prep2)
        _, _, _, p_slab = posteriors_fused(
            state.indF, state.alpha, prep2, fc, return_slab=True)

        # jit with the slabs as ARGUMENTS: the round-5 split runs its
        # virtual windows as XLA glue (eager dispatch through the
        # tunnel would dominate), and closure-baked big arrays hang the
        # tunneled compile (CLAUDE.md gotchas)
        maf_jit = jax.jit(lambda g0, g2, ps: est_maf_slab(
            dict(prep2, g0=g0, g2=g2), ps))

        def maf_once():
            return maf_jit(prep2["g0"], prep2["g2"], p_slab)
    else:
        from ngsf_hmm_tpu.models.hmm_pallas import (
            freq_compact, posteriors_fused, prepare_gl_inputs,
        )
        from ngsf_hmm_tpu.ops.maf_pallas import est_maf_pallas

        prep2 = prepare_gl_inputs(jnp.exp(gl), dist)
        fc = freq_compact(state.freq, prep2)
        p_ibd, _, _ = posteriors_fused(
            state.indF, state.alpha, prep2, fc)

        def maf_once():
            return est_maf_pallas(gl_tiles, p_ibd, Sb, macro=True)
    f = maf_once()
    float(np.asarray(jnp.sum(f)))
    t0 = time.perf_counter()
    for _ in range(4):
        f = maf_once()
    float(np.asarray(jnp.sum(f)))
    t_maf = max((time.perf_counter() - t0 - t_sync) / 4, 1e-9)
    kind = "slab" if slab_maf else "tiles"
    log(f"[bench] est_maf alone ({label}, macro, {kind}): "
        f"{t_maf * 1e3:.2f} ms")
    return per_iter, windows, t_maf, opt_iters


def time_stream(Ss, Ns, cs, reps, prefix="stream"):
    """BASELINE-ladder rungs above 1M: REAL streamed EM iterations
    through models/streaming.StreamingEM -- chunked GL-fused pallas
    chain passes (emissions computed in-kernel from gl slabs; zero
    per-pass prep when the gl-slab cache fits HBM), boundary-carry
    assembly on host, device-resident freq, warm host L-BFGS. GL chunks
    are synthesised ON DEVICE per fetch (deterministic per chunk
    index): the tunnel's ~25 MB/s h2d is three orders off a real TPU
    host's DMA and would measure the tunnel, not the engine -- flagged
    as "<prefix>_synth": "on_device" in the JSON. Everything else
    (per-chunk transfers, host 2x2 chain algebra, the full M-step
    stream) is the production code path; the file-backed variant of the
    same path (--stream_file) is exercised byte-for-byte by
    tests/test_glsource.py + test_streaming.py.

    reps timed iterations run AFTER a discarded warmup iteration, so
    steady-state cache behaviour (run-lifetime gl slabs, per-epoch freq
    compacts) is what is measured; per-iteration times are logged
    individually and the MEDIAN is reported (round-3 VERDICT Weak #6
    asked for >= 4 trustworthy warm iterations). Tunnel-stall guard:
    the axon tunnel can wedge mid-iteration for minutes (CLAUDE.md
    gotcha; observed a 284 s stall inside an otherwise-13 s leg), which
    says nothing about the engine -- iterations slower than 3x the
    fastest are excluded from the summary median, the full
    per-iteration list stays in the JSON, and the excluded count is
    reported as "<prefix>_stalled_iters".
    """
    import jax
    import jax.numpy as jnp

    from ngsf_hmm_tpu.models.em import EMOptions
    from ngsf_hmm_tpu.models.streaming import StreamingEM

    dt = jnp.float32

    @jax.jit
    def synth_chunk(key):
        # CHEAP deterministic GLs (Dirichlet(1,1,1) per site x ind): the
        # chunk is re-generated on every pass, standing in for what a
        # real host source delivers by DMA -- the generator must cost
        # (much) less than the chunk kernels or it becomes the
        # measurement. est_maf's macro schedule runs fixed trip counts,
        # so GL realism does not change the timed work.
        u = jax.random.uniform(key, (cs, Ns, 3), dt, 1e-6, 1.0)
        e = -jnp.log(u)
        return jnp.log(e / jnp.sum(e, axis=-1, keepdims=True))

    class _Shape:
        shape = (Ss, Ns, 3)

        def __getitem__(self, _):  # pragma: no cover - must not be hit
            raise RuntimeError("bench stream source is device-synth only")

    rng = np.random.default_rng(5)
    dist = rng.integers(100, 200_000, size=Ss).astype(np.float64) / 1e6

    class _DeviceSynthStream(StreamingEM):
        def _chunk(self, c):
            lo = c * self.cs
            hi = min(lo + self.cs, self.S)
            gl_c = synth_chunk(jax.random.PRNGKey(c))  # device, log GLs
            d_c = self.dist[lo:hi].astype(np.float32)
            if hi - lo < self.cs:
                d_c = np.pad(d_c, (0, self.cs - (hi - lo)))
            return gl_c, lo, hi, d_c

    se = _DeviceSynthStream(_Shape(), dist, chunk_sites=cs)
    opts = EMOptions(numerics="pallas", min_iters=1, max_iters=2,
                     min_epsilon=1e-9)

    freq = np.full(Ss, 0.2)
    F = np.full(Ns, 0.2)
    alpha = np.full(Ns, 0.05)

    t0 = time.perf_counter()
    freq_d = se._freq_pad_dev(freq)
    out = se._stream_iteration(freq_d, F, alpha, opts)  # warm/compile
    log(f"[bench] {prefix} leg ({Ss}x{Ns}, {se.C} chunks, gl-slab cache "
        f"{'on' if se._cache_e else 'off'}): warmup+compile "
        f"{time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = se._stream_iteration(out[0], out[1], out[2], opts)
        times.append(time.perf_counter() - t0)
    tmin = min(times)
    kept = [t for t in times if t <= 3.0 * tmin]
    per_iter = float(np.median(kept))
    stalled = len(times) - len(kept)
    log(f"[bench] ours ({prefix} {Ss}x{Ns}): "
        + " ".join(f"{t * 1e3:.0f}" for t in times)
        + f" ms/EM-iter -> median {per_iter * 1e3:.0f} ms"
        + (f" ({stalled} tunnel-stalled iter(s) excluded)" if stalled
           else ""))
    import jax.numpy as _jnp

    return {
        f"{prefix}_config": f"{Ss}x{Ns}",
        f"{prefix}_chunks": se.C,
        f"ms_per_em_iter_{prefix}": round(per_iter * 1e3, 1),
        f"{prefix}_iter_ms": [round(t * 1e3, 1) for t in times],
        f"{prefix}_stalled_iters": stalled,
        f"{prefix}_cells_per_s": round(Ss * Ns * 2 / per_iter, 1),
        f"{prefix}_glslab_cache": bool(se._cache_e),
        f"{prefix}_pin_k": int(getattr(se, "_pin_k", 0)),
        f"{prefix}_slab_bf16": bool(se._slab_dt == _jnp.bfloat16),
        f"{prefix}_synth": "on_device",
    }


def time_reader_mbps():
    """Host-side MB/s of the native slab readers (native/ngsf_io.cpp) --
    the I/O layer that feeds real --stream_file runs (round-4 VERDICT
    Weak #4: the 5000 x 50M BASELINE claim had an unquantified I/O leg).
    No TPU involved. Binary = the stream-file hot path (fseek + bulk
    doubles + normalise); text = the chunked-zlib Beagle scanner. Files
    are written once, one warm pass primes the page cache, then a timed
    pass reads the whole file in stream-sized site slabs -- so this is
    the PARSE/COPY throughput of the native layer (disk speed is
    hardware-specific and the page cache serves steady-state streams
    anyway)."""
    from ngsf_hmm_tpu.io import native, readers

    if not native.available():
        log("[bench] native IO core unavailable; reader leg skipped")
        return {}
    out = {}
    rng = np.random.default_rng(11)
    with tempfile.TemporaryDirectory() as td:
        d = pathlib.Path(td)
        # ---- binary doubles, site-major [S][N][3] (the --stream_file
        # format, read_data.cpp:83-99 layout)
        Nr, Sr, slab = 100, 300_000, 50_000
        raw = rng.random((Sr, Nr, 3)) + 1e-3
        glb = np.log(raw / raw.sum(-1, keepdims=True))
        fb = d / "r.glf"
        glb.tofile(fb)
        nbytes = fb.stat().st_size

        def _pass():
            for lo in range(0, Sr, slab):
                readers.read_geno_slab(
                    str(fb), Nr, Sr, (lo, min(slab, Sr - lo)), (0, Nr),
                    binary=True, probs=False, log_scale=True,
                )

        _pass()  # warm the page cache
        t0 = time.perf_counter()
        _pass()
        dt = time.perf_counter() - t0
        out["reader_mbps"] = round(nbytes / dt / 1e6, 1)
        log(f"[bench] native binary slab reader: {nbytes / 1e6:.0f} MB in "
            f"{dt:.2f}s -> {out['reader_mbps']} MB/s")

        # ---- gzip text (Beagle-style numeric rows through the
        # chunked-zlib line scanner + from_chars)
        St = 40_000
        glt = np.exp(glb[:St])
        ft = d / "r.glf.gz"
        with gzip.open(ft, "wb", compresslevel=1) as fh:
            for s in range(St):
                fh.write(
                    ("\t".join(f"{v:.6f}" for v in glt[s].ravel()) + "\n")
                    .encode()
                )
        tbytes = ft.stat().st_size

        def _tpass():
            for lo in range(0, St, slab // 4):
                readers.read_geno_slab(
                    str(ft), Nr, St, (lo, min(slab // 4, St - lo)), (0, Nr),
                    binary=False, probs=True, log_scale=False,
                )

        _tpass()
        t0 = time.perf_counter()
        _tpass()
        dt = time.perf_counter() - t0
        # report the UNCOMPRESSED parse rate alongside the gz byte rate:
        # the parse cost scales with text, not gz, bytes
        txt_bytes = St * Nr * 3 * 9  # ~9 B per "0.123456\t" token
        out["reader_mbps_text_gz"] = round(tbytes / dt / 1e6, 1)
        out["reader_mbps_text"] = round(txt_bytes / dt / 1e6, 1)
        log(f"[bench] native gzip-text reader: {tbytes / 1e6:.0f} MB gz "
            f"({txt_bytes / 1e6:.0f} MB text) in {dt:.2f}s -> "
            f"{out['reader_mbps_text_gz']} MB/s gz, "
            f"{out['reader_mbps_text']} MB/s text")
    return out


def roofline_bytes_per_cell(opt_evals):
    """Steady-state f32 HBM traffic per HMM cell (site x ind) of one
    GL-fused (v2) EM iteration, by construction of the pallas pipeline
    (per-site freq/dist compacts are ~4/N B per cell -- negligible):

      E-step   36 B: transfer reads gl0/gl2 (8); bw reads 8 + writes
                     the single bw-RATIO slab (4); fw_post reads 12 +
                     writes p (4)
      M-step    8 B x opt_evals: each L-BFGS value-and-grad probe
                     re-streams gl0/gl2 once. opt_evals is MEASURED
                     (the warm-started optimizer's outer count + the
                     initial gradient), not assumed.
      est_maf  12 B: slab kernel reads gl0/gl2 (8) + the raw posterior
                     slab (4) once -- subtracted by the caller, which
                     uses the measured est_maf time instead
                     (macro-stepping makes it mostly compute)
      emission  0 B: e_prob is DEFERRED out of the loop (rebuilt once
                     at loop exit); in-loop emissions are computed
                     in-kernel from the resident gl slabs
    """
    return 36 + 8 * opt_evals + 12


def _backend_alive(timeout_s=300):
    """True if jax can initialise its default backend. The axon tunnel
    can WEDGE (jax.devices() then hangs FOREVER -- CLAUDE.md gotchas);
    probing in a subprocess keeps the bench itself from hanging, so the
    driver records a flagged CPU result instead of nothing.

    The deadline is generous (healthy init is seconds; first compile
    20-40s) because killing a process that is genuinely mid-TPU-work can
    itself wedge the tunnel -- only an already-stuck claim should ever
    hit it. Healthy runs pay one extra backend spin-up (~seconds)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    global S, N, ITERS, BIG
    device_fallback = False
    if os.environ.get("NGSF_BENCH_CPU") == "1":
        # debugging escape hatch (the env var JAX_PLATFORMS does NOT
        # override the axon TPU plugin; only the config call does)
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif not _backend_alive():
        import jax

        jax.config.update("jax_platforms", "cpu")
        # the wedge outlives processes; shrink to CPU-feasible sizes
        S, N, ITERS, BIG = min(S, 20_000), min(N, 8), min(ITERS, 2), False
        device_fallback = True
        log("[bench] WARNING: device backend unreachable (wedged "
            "tunnel?); falling back to CPU at reduced config -- these "
            "are NOT TPU numbers")
    rng = np.random.default_rng(20260816)
    gl, pos = make_inputs(rng)

    reader_fields = {}
    if os.environ.get("NGSF_BENCH_READER", "1") == "1":
        try:
            reader_fields = time_reader_mbps()
        except Exception as e:  # noqa: BLE001
            log(f"[bench] reader leg failed: {e}")

    t_sync = _sync_baseline()
    t_small, opt_iters_small = time_ours_small(gl, pos, t_sync)
    small_cps = S * N * 2 / t_small

    vs = None
    if os.environ.get("NGSF_BENCH_SKIP_REF") != "1":
        exe = build_reference()
        if exe is not None:
            try:
                with tempfile.TemporaryDirectory() as td:
                    d = pathlib.Path(td)
                    glf, posf = write_ref_inputs(d, gl, pos)
                    t_ref = time_reference(exe, d, glf, posf)
                    vs = t_ref / t_small
            except Exception as e:  # noqa: BLE001
                log(f"[bench] reference run failed: {e}")
    fallback = vs is None
    if fallback:
        vs = small_cps / REF_FALLBACK_CELLS_PER_S
        log("[bench] WARNING: reference leg did not run; vs_baseline uses "
            f"the canned fallback {REF_FALLBACK_CELLS_PER_S:.3g} cells/s "
            "measured once on the dev host -- treat it as indicative only")

    out = {
        "metric": "em_cells_per_s",
        "unit": "cells/s",
        "vs_baseline": round(vs, 2),
        "small_config": f"{S}x{N}",
        "ms_per_em_iter_small": round(t_small * 1e3, 2),
        "opt_iters_small": opt_iters_small,
        **reader_fields,
    }
    if fallback:
        out["vs_baseline_is_fallback"] = True
    if device_fallback:
        out["device_fallback"] = "cpu"

    if BIG:
        t_big, big_windows, t_maf, opt_iters = time_ours_big(t_sync)
        gbps = measure_stream_gbps(t_sync)
        gbps_fallback = gbps is None
        if gbps_fallback:
            gbps = STREAM_GBPS
        # the warm-started M-step costs opt_iters speculative probes +
        # the initial gradient, each one fused value-and-grad stream
        evals = opt_iters + 1
        bpc = roofline_bytes_per_cell(evals)
        # stream roofline for the bandwidth-bound stages + the MEASURED
        # partly-compute-bound est_maf stage (macro-stepped fixed point)
        roof_ms = BIG_S * BIG_N * (bpc - 12) / (gbps * 1e9) * 1e3
        roof_ms += t_maf * 1e3
        out.update({
            "value": round(BIG_S * BIG_N * 2 / t_big, 1),
            "config": f"{BIG_S}x{BIG_N}",
            "ms_per_em_iter": round(t_big * 1e3, 2),
            "ms_per_em_iter_spread": [round(w * 1e3, 2)
                                      for w in big_windows],
            "ms_est_maf": round(t_maf * 1e3, 2),
            "opt_iters": opt_iters,
            "roofline_bytes_per_cell": bpc,
            "roofline_gbps": round(gbps, 1),
            "roofline_ms": round(roof_ms, 1),
            "roofline_frac": round(roof_ms / (t_big * 1e3), 3),
        })
        if gbps_fallback:
            out["roofline_gbps_is_fallback"] = True
        if os.environ.get("NGSF_BENCH_WIDE", "1") == "1":
            # WIDE leg (round-4 VERDICT ask #1): the BASELINE ladder's
            # N axis. 250k x 1000 is the largest wide config whose v2
            # working set (gl + slabs + posterior/ratio slabs) fits one
            # v5e's 16 GB with headroom -- 1M x 1000 needs ~16 GB of
            # slabs alone and is the mesh path's territory
            # (dryrun-validated); the 10M x 1000 STREAM leg below
            # covers the 1000-ind BASELINE rung end-to-end.
            try:
                w_S = int(os.environ.get("NGSF_BENCH_WIDE_SITES",
                                         250_000))
                w_N = int(os.environ.get("NGSF_BENCH_WIDE_IND", 1000))
                t_w, w_windows, t_wmaf, w_opt = time_ours_big(
                    t_sync, Sb=w_S, Nb=w_N, label="wide", lean=True)
                w_cps = w_S * w_N * 2 / t_w
                out.update({
                    "wide_config": f"{w_S}x{w_N}",
                    "ms_per_em_iter_wide": round(t_w * 1e3, 2),
                    "ms_per_em_iter_wide_spread": [
                        round(w * 1e3, 2) for w in w_windows],
                    "ms_est_maf_wide": round(t_wmaf * 1e3, 2),
                    "wide_opt_iters": w_opt,
                    "wide_cells_per_s": round(w_cps, 1),
                    # per-cell time ratio vs the N=100 big leg
                    # (VERDICT done-gate: within ~1.3x)
                    "wide_per_cell_vs_big": round(
                        (t_w / (w_S * w_N)) / (t_big / (BIG_S * BIG_N)),
                        3),
                })
            except Exception as e:  # noqa: BLE001
                log(f"[bench] wide leg failed: {e}")
                out["wide_error"] = str(e)[:200]
        if os.environ.get("NGSF_BENCH_STREAM", "1") == "1":
            try:
                out.update(time_stream(
                    int(os.environ.get("NGSF_BENCH_STREAM_SITES",
                                       10_000_000)),
                    int(os.environ.get("NGSF_BENCH_STREAM_IND", 100)),
                    int(os.environ.get("NGSF_BENCH_STREAM_CHUNK",
                                       1_000_000)),
                    int(os.environ.get("NGSF_BENCH_STREAM_ITERS", 4)),
                    prefix="stream",
                ))
            except Exception as e:  # noqa: BLE001
                log(f"[bench] stream leg failed: {e}")
                out["stream_error"] = str(e)[:200]
        if os.environ.get("NGSF_BENCH_STREAM50", "1") == "1":
            # the 50M rung toward BASELINE's 5000 x 50M config: same
            # chunk geometry as the 10M leg (no extra kernel compiles),
            # 5x the chunks. Per-chip scaling note: 50M x 100 streams;
            # the full 5000-ind config is 50 such column blocks on an
            # ind-sharded mesh (one psum per est_maf macro round), so
            # per-chip iteration time is ~this number at equal per-chip
            # width.
            try:
                out.update(time_stream(
                    int(os.environ.get("NGSF_BENCH_S50_SITES",
                                       50_000_000)),
                    int(os.environ.get("NGSF_BENCH_S50_IND", 100)),
                    int(os.environ.get("NGSF_BENCH_STREAM_CHUNK",
                                       1_000_000)),
                    int(os.environ.get("NGSF_BENCH_S50_ITERS", 4)),
                    prefix="stream50m",
                ))
            except Exception as e:  # noqa: BLE001
                log(f"[bench] 50M stream leg failed: {e}")
                out["stream50m_error"] = str(e)[:200]
        if os.environ.get("NGSF_BENCH_WIDE_STREAM", "1") == "1":
            # 1000-ind streamed rung (BASELINE ladder: 1000 x 10M):
            # chunked v2 pipeline at wide N. 125k x 1000 chunks measured
            # best (round 5): the per-pass working margin scales with
            # the chunk, so halving it frees enough budget to pin 15/80
            # chunks (vs 3/40 at 250k) -- 27.9 -> ~13.5-16 s/iter. The
            # leg needs ~2 iterations to reach cache steady state, so 4
            # timed iterations keep the median honest.
            try:
                out.update(time_stream(
                    int(os.environ.get("NGSF_BENCH_WSTREAM_SITES",
                                       10_000_000)),
                    int(os.environ.get("NGSF_BENCH_WSTREAM_IND", 1000)),
                    int(os.environ.get("NGSF_BENCH_WSTREAM_CHUNK",
                                       125_000)),
                    int(os.environ.get("NGSF_BENCH_WSTREAM_ITERS", 4)),
                    prefix="stream_wide",
                ))
            except Exception as e:  # noqa: BLE001
                log(f"[bench] wide stream leg failed: {e}")
                out["stream_wide_error"] = str(e)[:200]
    else:
        out.update({
            "value": round(small_cps, 1),
            "config": f"{S}x{N}",
            "ms_per_em_iter": round(t_small * 1e3, 2),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
