"""IBD format converter: 0/1-per-site rows <-> BED tract intervals.

Equivalent of the reference's scripts/convert_ibd.pl (v0.0.3), same CLI
and byte-identical output:

  --ind FILE      individual IDs, first column (default: stdin)
  --pos FILE      TSV genomic coordinates (CHR, POS); .gz ok
  --ibd_pos FILE  one individual per line, 0/1 per site -> prints BED
                  (CHR, POS-1, END, IND_ID, LENGTH; convert_ibd.pl:115-127)
  --ibd_bed FILE  BED (CHR, START, END, IND_ID[,IND_ID..]|'*') -> prints
                  0/1 rows (convert_ibd.pl:131-158)

Replicated quirks:
 - .ibd "//"-prefixed likelihood lines are skipped, and reading stops
   after n_ind data lines (so the posterior rows that follow the paths
   in a .ibd file are ignored; convert_ibd.pl:106-112);
 - individuals with an empty ID are skipped but still consume a line;
 - in --ibd_bed mode, rows whose chr/start/end/id are empty-or-"0" are
   skipped (the perl truthiness test at convert_ibd.pl:143 -- a BED
   interval starting at coordinate 0 is therefore ignored, faithfully).
"""

import gzip
import sys


def _open(path, mode="rt"):
    if path == "-":
        return sys.stdin
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    try:
        with open(path, "rb") as fh:
            if fh.read(2) == b"\x1f\x8b":
                return gzip.open(path, mode)
    except OSError:
        pass
    return open(path, mode)


def read_sites(pos_file):
    sites = []
    with _open(pos_file) as fh:
        for line in fh:
            parts = line.rstrip("\n").replace(" ", "\t").split("\t")
            if len(parts) >= 2:
                sites.append((parts[0], int(parts[1])))
    return sites


def read_inds(ind_file):
    inds = []
    with _open(ind_file) as fh:
        for line in fh:
            ind = line.replace(" ", "\t").split("\t")[0].rstrip("\n")
            inds.append(ind)
    return inds


def pos_to_bed(sites, inds, ibd_pos_file, out=sys.stdout):
    """0/1 rows -> BED tracts (convert_ibd.pl:100-128)."""
    curr = -1
    with _open(ibd_pos_file) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("//"):
                continue
            curr += 1
            if curr > len(inds) - 1:
                break
            if not inds[curr]:
                continue
            n = len(sites)
            if len(line) > n:
                raise ValueError(
                    f"IBD row {curr} has {len(line)} sites but the "
                    f"positions file has {n}"
                )
            s = line.find("1")
            while s != -1 and s < n:
                chrom = sites[s][0]
                start = sites[s][1] - 1
                while s < n:
                    nxt = line[s + 1] if s + 1 < len(line) else "0"
                    if s == n - 1 or sites[s + 1][0] != chrom or nxt == "0":
                        end = sites[s][1]
                        out.write(
                            f"{chrom}\t{start}\t{end}\t{inds[curr]}\t{end - start}\n"
                        )
                        s += 1
                        break
                    s += 1
                s = line.find("1", s)


def bed_to_pos(sites, inds, ibd_bed_file, out=sys.stdout):
    """BED tracts -> 0/1 rows (convert_ibd.pl:131-158)."""
    ibd = {ind: ["0"] * len(sites) for ind in inds}
    with _open(ibd_bed_file) as fh:
        for line in fh:
            parts = line.rstrip("\n").replace(" ", "\t").split("\t")
            chrom = parts[0] if len(parts) > 0 else ""
            start = parts[1] if len(parts) > 1 else ""
            end = parts[2] if len(parts) > 2 else ""
            ids = parts[3] if len(parts) > 3 else None
            if not ids or ids == "*":
                ids = ",".join(inds)
            for ind_id in ids.split(","):
                # perl truthiness: empty or "0" fields skip the row
                if not ind_id or chrom in ("", "0") or start in ("", "0") \
                        or end in ("", "0"):
                    continue
                if ind_id not in ibd:
                    continue
                lo = int(start) + 1  # BED is 0-based
                hi = int(end)
                for s, (c, p) in enumerate(sites):
                    if c == chrom and lo <= p <= hi:
                        ibd[ind_id][s] = "1"
    for ind in inds:
        out.write("".join(ibd[ind]) + "\n")


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        prog="ngsf-hmm-convert-ibd",
        description=__doc__.splitlines()[0],
    )
    ap.add_argument("--ind", "-i", default="-")
    ap.add_argument("--pos", "-p", required=True)
    ap.add_argument("--ibd_pos")
    ap.add_argument("--ibd_bed")
    a = ap.parse_args(argv)
    if a.ibd_pos and a.ibd_bed:
        print("ERROR: both IBD_POS and IBD_BED files provided!", file=sys.stderr)
        return -1
    sites = read_sites(a.pos)
    inds = read_inds(a.ind)
    if a.ibd_pos:
        pos_to_bed(sites, inds, a.ibd_pos)
    elif a.ibd_bed:
        bed_to_pos(sites, inds, a.ibd_bed)
    else:
        print("ERROR: no IBD_POS or IBD_BED files provided!", file=sys.stderr)
        return -1
    return 0


if __name__ == "__main__":
    sys.exit(main())
