"""Device-mesh construction and sharding specs.

Parallelism map for the engine (the reference's only strategy is a
per-individual pthread pool on one host, EM.cpp:151-159; SURVEY.md §5.8):

  axis "restart" : independent EM replicates (the ngsF-HMM.sh multi-restart
                   protocol as a batch axis) -- zero communication.
  axis "ind"     : individuals, data-parallel. The ONLY collective in an EM
                   step is the psum of est_maf's expected-allele-count
                   accumulators over this axis (gen_func.cpp:984-1005's
                   cross-individual sums).
  sites          : sequential within the scan kernels; the blocked kernels
                   (models/hmm_blocked.py) parallelise the site dimension
                   inside a chip. Cross-chip site sharding (context-parallel
                   analog) is a planned extension via per-block carry
                   handoff.

Shardings (site-major layout):
  gl      [S, N, 3] : P(None, "ind", None)     (replicated over "restart")
  e_prob  [S, N, 2] : P(None, "ind", None) or with "restart" leading
  freq    [S]       : replicated (P())
  indF, alpha [N]   : P("ind")
  dist    [S]       : replicated
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_restart: int = 1, n_ind_shards: int | None = None, devices=None):
    """A (restart, ind) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_ind_shards is None:
        n_ind_shards = n_dev // n_restart
    if n_restart * n_ind_shards != n_dev:
        raise ValueError(
            f"mesh {n_restart}x{n_ind_shards} != {n_dev} devices"
        )
    arr = np.asarray(devices).reshape(n_restart, n_ind_shards)
    return Mesh(arr, axis_names=("restart", "ind"))


def data_specs(with_restart: bool = False):
    """PartitionSpecs for (gl, dist) and the EMState fields."""
    r = "restart" if with_restart else None
    gl = P(None, "ind", None)
    dist = P()
    state = dict(
        freq=P(r),
        indF=P(r, "ind") if with_restart else P("ind"),
        alpha=P(r, "ind") if with_restart else P("ind"),
        e_prob=P(r, None, "ind", None) if with_restart else P(None, "ind", None),
        p_ibd=P(r, None, "ind") if with_restart else P(None, "ind"),
        ind_lkl=P(r, "ind") if with_restart else P("ind"),
    )
    return gl, dist, state
