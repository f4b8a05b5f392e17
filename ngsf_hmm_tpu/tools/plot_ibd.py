"""IBD-tract plotter (equivalent of scripts/ngsF-HMMplot.R).

Reads a ``.ibd`` file (the engine's or the reference binary's: a
"//"-prefixed per-individual likelihood line, n_ind Viterbi 0/1 path
rows, n_ind IBD-posterior rows -- EM.cpp:322-356), plus site positions,
and renders per-chromosome panels per individual into a PDF:

 - blue shaded areas: inferred IBD tracts (Viterbi path);
 - red band: true simulated path, when given (ngsF-HMMsim.R .path.gz);
 - green line: IBD posterior probability;
 - cyan dots: true genotypes / 2, when given;
 - blue ticks: SNP positions (--plot_sites).

CLI mirrors the R script's options (ngsF-HMMplot.R:71-84). Output is
functionally equivalent, not pixel-identical (matplotlib, not R base
graphics).
"""

import gzip
import sys

import numpy as np


def _open(path):
    with open(path, "rb") as fh:
        if fh.read(2) == b"\x1f\x8b":
            return gzip.open(path, "rt")
    return open(path, "rt")


def read_ibd(path, n_ind, n_sites):
    """Returns (lkl [n_ind], paths [n_ind, n_sites] int8, post [n_ind, n_sites]).

    Accepts multi-iteration files (--log runs append blocks); returns a
    list of (lkl, paths, post) blocks.
    """
    blocks = []
    with _open(path) as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    i = 0
    while i < len(lines):
        if not lines[i].startswith("//"):
            i += 1
            continue
        lkl = np.array([float(x) for x in lines[i].split("\t")[1:]])
        paths = np.array(
            [[int(c) for c in lines[i + 1 + j]] for j in range(n_ind)],
            dtype=np.int8,
        )
        post = np.array(
            [
                [float(x) for x in lines[i + 1 + n_ind + j].split("\t")]
                for j in range(n_ind)
            ]
        )
        assert paths.shape == (n_ind, n_sites), paths.shape
        blocks.append((lkl, paths, post))
        i += 1 + 2 * n_ind
    if not blocks:
        raise ValueError(f"{path}: no '//' likelihood line found")
    return blocks


def read_pos(path, n_sites):
    chroms, pos = [], []
    with _open(path) as fh:
        for ln in fh:
            parts = ln.split()
            if len(parts) >= 2:
                chroms.append(parts[0])
                pos.append(int(float(parts[1])))
    if len(pos) != n_sites:
        raise ValueError(f"{path}: {len(pos)} positions != n_sites {n_sites}")
    return np.array(chroms), np.array(pos)


def _shade(ax, mask, pos, color, y0=0.0, y1=1.0):
    """Shade runs of 1s (ngsF-HMMplot.R shade_areas)."""
    m = np.asarray(mask, dtype=bool)
    if not m.any():
        return
    d = np.diff(np.concatenate([[0], m.astype(int), [0]]))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0] - 1
    for s, e in zip(starts, ends):
        ax.axvspan(pos[s], pos[e], ymin=y0, ymax=y1, color=color, lw=0)


def plot_ibd(
    out_pdf,
    ibd_blocks,
    chroms,
    pos,
    titles=None,
    true_path=None,
    true_geno=None,
    marg_prob=True,
    plot_sites=False,
    width=None,
    height=None,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    uniq_chrs = list(dict.fromkeys(chroms))
    with PdfPages(out_pdf) as pdf:
        for b, (lkl, paths, post) in enumerate(ibd_blocks):
            n = len(lkl)
            ncol = 2 if n > 1 else 1
            nrow = -(-n // ncol)
            for chrom in uniq_chrs:
                sel = chroms == chrom
                fig, axes = plt.subplots(
                    nrow, ncol, squeeze=False,
                    figsize=(width or 8 * ncol, height or 2 * nrow),
                )
                for i in range(n):
                    ax = axes[i // ncol][i % ncol]
                    ax.set_xlim(pos[sel].min(), pos[sel].max())
                    ax.set_ylim(0, 1.01)
                    t = titles[i] if titles else f"Ind {i + 1}"
                    ax.set_title(f"{t} / {chrom} / {lkl[i]:.4f}", fontsize=6)
                    if plot_sites:
                        ax.plot(pos[sel], np.zeros(sel.sum()), "|",
                                color="dodgerblue", ms=3)
                    if marg_prob:
                        ax.plot(pos[sel], post[i][sel], color=(0, 1, 0, 0.5),
                                lw=0.3)
                    if true_geno is not None:
                        ax.plot(pos[sel], true_geno[i][sel] / 2.0, ".",
                                color="cyan", ms=1)
                    _shade(ax, paths[i][sel], pos[sel], (0, 0, 1, 0.2))
                    if true_path is not None:
                        _shade(ax, true_path[i][sel], pos[sel],
                               (1, 0, 0, 0.2), y0=0.25, y1=0.75)
                for j in range(n, nrow * ncol):
                    axes[j // ncol][j % ncol].axis("off")
                fig.tight_layout()
                pdf.savefig(fig)
                plt.close(fig)


def _read_rows(path, n_ind, n_sites, dtype=float):
    rows = []
    with _open(path) as fh:
        for ln in fh:
            ln = ln.strip()
            if not ln:
                continue
            if "\t" in ln or " " in ln:
                rows.append([dtype(x) for x in ln.split()])
            else:
                rows.append([dtype(c) for c in ln])
    a = np.array(rows[:n_ind])
    if a.shape != (n_ind, n_sites):
        raise ValueError(f"{path}: shape {a.shape} != ({n_ind}, {n_sites})")
    return a


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="ngsf-hmm-plot", description=__doc__)
    ap.add_argument("--in_file", "-i", required=True, help=".ibd file")
    ap.add_argument("--n_ind", "-n", type=int, default=10)
    ap.add_argument("--n_sites", "-s", type=int, default=1000)
    ap.add_argument("--pos", required=True, help="CHR\\tPOS file")
    ap.add_argument("--titles", "-t", help="file with per-plot titles")
    ap.add_argument("--marg_prob", "-m", action="store_true")
    ap.add_argument("--geno", "-g", help="true genotypes file (optional)")
    ap.add_argument("--path", "-p", help="true paths file (optional)")
    ap.add_argument("--plot_sites", action="store_true")
    ap.add_argument("--width", "-w", type=float)
    ap.add_argument("--height", "-H", type=float)
    ap.add_argument("--out", "-o", help="output PDF (default in_file.pdf)")
    a = ap.parse_args(argv)

    blocks = read_ibd(a.in_file, a.n_ind, a.n_sites)
    chroms, pos = read_pos(a.pos, a.n_sites)
    titles = None
    if a.titles:
        with _open(a.titles) as fh:
            titles = [ln.strip() for ln in fh if ln.strip()]
    tp = _read_rows(a.path, a.n_ind, a.n_sites, int) if a.path else None
    tg = _read_rows(a.geno, a.n_ind, a.n_sites, float) if a.geno else None
    out = a.out or (a.in_file + ".pdf")
    plot_ibd(
        out, blocks, chroms, pos, titles=titles, true_path=tp, true_geno=tg,
        marg_prob=a.marg_prob, plot_sites=a.plot_sites, width=a.width,
        height=a.height,
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
