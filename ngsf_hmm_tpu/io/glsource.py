"""File-backed genotype-likelihood source for out-of-host-RAM streaming.

The 5000-ind x 50M-site BASELINE config is ~6 TB of raw binary GLs --
no host can preload it the way the CLI's monolithic read path does
(ngsF-HMM.cpp:96-117 reads everything up front; so does the reference).
`ChunkedGLSource` exposes exactly the interface models/streaming.py
touches (`.shape` and contiguous `src[lo:hi]` site slices) and applies
the FULL read pipeline per chunk, so a `--stream_chunk --stream_file`
run is byte-equivalent to preloading:

  1. raw read   -- binary: np.memmap window (O(1) seek;
                   reference format: site-major little-endian doubles,
                   read_data.cpp:24-40); text: io.readers.read_geno_slab
                   (gzip line-skip per chunk -- O(S) per chunk, fine for
                   a one-shot conversion but prefer binary at scale)
  2. log + normalise (read_data.cpp:88-108 semantics, as read_geno)
  3. optional --call_geno (ngsF-HMM.cpp:103-110)
  4. post_prob renormalisation (ngsF-HMM.cpp:116)

Chunks are processed with the SAME ops the monolithic CLI path uses
(ops.hwe.call_geno / post_prob), so per-chunk and whole-matrix
processing agree exactly: every op is per-site.
"""

import os

import numpy as np

from ..utils.constants import BIG, N_GENO
from .readers import _normalise_log


class ChunkedGLSource:
    """[S, N, 3] normalised log-GL source reading site chunks on demand.

    binary=True memory-maps the raw doubles; binary=False re-reads the
    (possibly gzipped) text file through the slab reader per chunk.
    Slicing returns float64 numpy arrays, like the monolithic pipeline.
    """

    def __init__(self, path, n_ind, n_sites, binary=False, probs=False,
                 log_scale=False, call_geno=False, ind_slab=None,
                 cache_dir=None):
        """ind_slab: optional (offset, count) -- expose only those
        individuals' columns (multi-host streaming: each process reads
        just its ind shard of every chunk). `.shape[1]` then reports the
        LOCAL count.

        cache_dir: optional directory for a PROCESSED-chunk spill cache.
        StreamingEM re-reads every chunk 2 + ~2*lbfgs_iters times per EM
        iteration; without a cache each access re-reads the file (text:
        an O(S) line-skip from the start) and re-runs the log/normalise/
        call_geno/post_prob pipeline. The cache stores each chunk's
        processed float64 values on first touch (same bytes the
        monolithic path trains on, so equivalence is unchanged) and
        memmaps them back for every later pass."""
        self.path = path
        self.n_ind_file = n_ind
        self.ind_slab = (0, n_ind) if ind_slab is None else \
            (int(ind_slab[0]), int(ind_slab[1]))
        if not (0 <= self.ind_slab[0]
                and self.ind_slab[0] + self.ind_slab[1] <= n_ind):
            raise ValueError("ind_slab out of range")
        self.shape = (n_sites, self.ind_slab[1], N_GENO)
        self.binary = binary
        self.probs = probs
        self.log_scale = log_scale
        self.call_geno = call_geno
        if binary:
            want = n_sites * n_ind * N_GENO * 8
            real = os.path.getsize(path)
            if real != want:
                raise ValueError("invalid/corrupt genotype input file!")
            self._mm = np.memmap(path, dtype="<f8", mode="r",
                                 shape=(n_sites, n_ind, N_GENO))
        self._cache = None
        self._cached = None
        if cache_dir is not None:
            self._cache = np.memmap(
                os.path.join(cache_dir, "gl_processed.f64"),
                np.float64, "w+", shape=self.shape,
            )
            self._cached = np.zeros(n_sites, bool)

    def __len__(self):
        return self.shape[0]

    def _raw(self, lo, hi):
        i0, ic = self.ind_slab
        if self.binary:
            from . import native

            if native.available():
                # the SAME native log/normalise code path as the
                # monolithic read_geno -- chunked and preloaded runs
                # must see bit-identical values (the numpy fallback
                # below differs by ~1 ulp in log/renormalise)
                return np.asarray(
                    native.read_geno_binary_slab(
                        self.path, self.n_ind_file, self.shape[0],
                        self.log_scale, lo, hi - lo, i0, ic,
                    ),
                    dtype=np.float64,
                )
            gl = np.array(self._mm[lo:hi, i0:i0 + ic], dtype=np.float64)
            if not self.log_scale:
                with np.errstate(divide="ignore"):
                    gl = np.log(gl)
                gl[np.isneginf(gl)] = -BIG
            gl = _normalise_log(gl)
            if np.isnan(gl).any():
                raise ValueError("NaN found! Is the file format correct?")
            return gl
        from . import readers

        return np.asarray(
            readers.read_geno_slab(
                self.path, self.n_ind_file, self.shape[0],
                (lo, hi - lo), (i0, ic), binary=False,
                probs=self.probs, log_scale=self.log_scale,
            ),
            dtype=np.float64,
        )

    def __getitem__(self, sl):
        if not isinstance(sl, slice) or sl.step not in (None, 1):
            raise TypeError("ChunkedGLSource supports contiguous site "
                            "slices only")
        lo, hi, _ = sl.indices(self.shape[0])
        if self._cache is not None and self._cached[lo:hi].all():
            return np.array(self._cache[lo:hi])
        gl = self._raw(lo, hi)
        # the monolithic path's device-side processing, applied on host
        # per chunk with the SAME ops (both are per-site)
        import jax.numpy as jnp

        from ..ops.hwe import call_geno as call_geno_op
        from ..ops.hwe import post_prob

        g = jnp.asarray(gl)
        if self.call_geno:
            g = call_geno_op(g)
        out = np.asarray(post_prob(g, None), dtype=np.float64)
        if self._cache is not None:
            self._cache[lo:hi] = out
            self._cached[lo:hi] = True
        return out


def est_maf_streamed(src, chunk_sites=1 << 20, mesh=None, n_ind_total=None):
    """Initial '--freq e' estimate over a ChunkedGLSource: est_maf's
    fixed point is per-site independent (gen_func.cpp:964-1009), so the
    chunked estimate equals the monolithic one exactly.

    mesh: optional (restart=1, ind) global mesh for multi-host sources
    (src holds only this process's ind columns): each chunk assembles
    into a global array and the cross-ind sums psum over the mesh; the
    replicated result is identical on every process. Every process must
    call in lockstep (chunk loop = collectives)."""
    import jax
    import jax.numpy as jnp

    from ..ops.maf import est_maf

    S = src.shape[0]
    out = np.empty(S, np.float64)
    fn = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel.distributed import global_from_slab, host_array

        gl_sh = NamedSharding(mesh, P(None, "ind", None))
        fn = jax.jit(
            lambda g: est_maf(g, jnp.zeros(g.shape[:2], g.dtype)),
            out_shardings=NamedSharding(mesh, P()),
        )
    for lo in range(0, S, chunk_sites):
        hi = min(lo + chunk_sites, S)
        g = src[lo:hi]
        if mesh is None:
            g = jnp.asarray(g)
            out[lo:hi] = np.asarray(
                est_maf(g, jnp.zeros(g.shape[:2], g.dtype))
            )
        else:
            g_glob = global_from_slab(
                gl_sh, g, (hi - lo, int(n_ind_total), 3)
            )
            out[lo:hi] = host_array(fn(g_glob))
    return out
