"""Dataset generation / conversion CLI (`convert-tpch`, tpch.rs:731
parity): write deterministic TPC-H tables as parquet, csv, or dbgen
.tbl ('|'-delimited, for diffing against dbgen output).

  python -m ballista_tpu.datagen --sf 1 --format parquet --out /tmp/tpch
"""

import argparse
import os

from .tpch import TPCH_TABLES, generate_table


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Generate/convert TPC-H data (tpch.rs convert-tpch)")
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", default="/tmp/tpch")
    ap.add_argument("--format", choices=("parquet", "csv", "tbl"),
                    default="parquet")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all 8)")
    ap.add_argument("--chunks", type=int, default=0,
                    help="stream each table as N independently-generated "
                         "parquet part files with bounded RAM (the SF100 "
                         "path; dbgen -C/-S chunking parity)")
    ap.add_argument("--workers", type=int, default=1,
                    help="parallel chunk-builder processes (chunks are "
                         "rng-independent, so output is identical)")
    args = ap.parse_args(argv)

    names = (args.tables.split(",") if args.tables else list(TPCH_TABLES))
    os.makedirs(args.out, exist_ok=True)
    if args.chunks:
        assert args.format == "parquet", "--chunks writes parquet part files"
        from .tpch import generate_tpch_parquet
        counts = generate_tpch_parquet(args.sf, args.out, args.chunks,
                                       tables=names, workers=args.workers)
        for name, rows in counts.items():
            print(f"{name}: {rows} rows -> {args.out}/{name}/part_*.parquet")
        return
    for name in names:
        t = generate_table(name, args.sf)
        path = os.path.join(args.out, f"{name}.{args.format}")
        if args.format == "parquet":
            import pyarrow.parquet as pq
            pq.write_table(t, path)
        elif args.format == "csv":
            import pyarrow.csv as pacsv
            pacsv.write_csv(t, path)
        else:  # dbgen .tbl: '|'-delimited, trailing '|', no header
            df = t.to_pandas()
            with open(path, "w") as f:
                for row in df.itertuples(index=False):
                    f.write("|".join(str(v) for v in row) + "|\n")
        print(f"{name}: {t.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
