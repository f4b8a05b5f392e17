"""Checkpoint/resume for EM runs.

The reference has no formal checkpointing: ``--log N`` rewrites the
output set every N iterations (reference: EM.cpp:59-63) and runs can be
warm-started from those outputs via ``--indF FILE`` / ``--freq FILE``
(parse_args.cpp:255-276,326-355) -- both of which this engine also
supports. This module adds what the reference lacks: an exact-resume
checkpoint carrying the full EM state (including emissions, which are
NOT derivable from freq under the frozen-emission modes, SURVEY.md
S3.6e) plus the convergence bookkeeping of the host loop, so a resumed
run continues bit-for-bit where it stopped.

Format: a single .npz with the EMState arrays and a JSON metadata blob
(iteration counter, per-individual likelihood history, engine/version
info). Atomic write via rename.
"""

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ..utils.constants import VERSION
from ..models.em import EMState

FORMAT = "ngsf-hmm-tpu-ckpt-v1"


def save_checkpoint(path, state: EMState, bookkeeping: dict):
    """Write state + host-loop bookkeeping atomically to ``path`` (.npz)."""
    meta = {
        "format": FORMAT,
        "version": VERSION,
        "bookkeeping": {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in bookkeeping.items()
        },
    }
    arrays = {f: np.asarray(getattr(state, f)) for f in EMState._fields}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, __meta__=np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8), **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path, dtype=None):
    """Read (EMState, bookkeeping dict) from ``path``.

    dtype: optionally cast arrays (e.g. resume an f64 checkpoint in f32
    speed mode).
    """
    try:
        z = np.load(path)
    except FileNotFoundError:
        raise
    except Exception as e:  # BadZipFile, np's own ValueError, ...
        raise ValueError(f"{path}: not a readable {FORMAT} checkpoint ({e})")
    try:
        with z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            if meta.get("format") != FORMAT:
                raise ValueError(
                    f"{path}: not a {FORMAT} checkpoint "
                    f"(got {meta.get('format')!r})"
                )
            fields = {}
            for f in EMState._fields:
                a = z[f]
                fields[f] = jnp.asarray(
                    a if dtype is None else a.astype(dtype)
                )
    except ValueError:
        raise
    except Exception as e:  # KeyError, json/pickle errors, ...
        raise ValueError(f"{path}: not a readable {FORMAT} checkpoint ({e})")
    bk = meta["bookkeeping"]
    # restore array-valued bookkeeping (scalars in single-run checkpoints,
    # [R]-shaped in multi-restart ones -- lists after the JSON round-trip)
    for k in ("prev_ind", "prev_tot", "tot", "max_eps", "active",
              "iters_done"):
        if k in bk and isinstance(bk[k], list):
            bk[k] = np.asarray(bk[k])
    return EMState(**fields), bk
