"""Deterministic TPC-H-compatible data generator (numpy + pyarrow).

Reference parity: the benchmark harness's data path — the reference shells
out to dbgen (`benchmarks/tpch-gen.sh`) and converts tbl->parquet
(`benchmarks/src/bin/tpch.rs:731`). dbgen isn't available here (no Rust/
docker), so we generate statistically equivalent data directly: correct
schemas, key relationships (PK/FK), value domains, and the distributions
each TPC-H query filters on (dates, segments, ship modes, container/type
vocabularies, comment patterns). Seeded -> reproducible across runs, so
self-measured baselines are comparable.

String columns draw from bounded pools (dictionary-friendly); every value
domain a TPC-H predicate touches (e.g. '%special%requests%' comments,
'PROMO%' types, 'BUILDING' segment) is represented with dbgen-like
frequencies.
"""

from __future__ import annotations

import datetime
import os
from decimal import Decimal
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

EPOCH = datetime.date(1970, 1, 1)


def _days(y, m, d):
    return (datetime.date(y, m, d) - EPOCH).days


STARTDATE = _days(1992, 1, 1)
CURRENTDATE = _days(1995, 6, 17)
ENDDATE = _days(1998, 12, 31)

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
INSTRUCTIONS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAIN_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAIN_S2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
COLORS = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
          "black", "blanched", "blue", "blush", "brown", "burlywood",
          "burnished", "chartreuse", "chiffon", "chocolate", "coral",
          "cornflower", "cornsilk", "cream", "cyan", "dark", "deep",
          "dim", "dodger", "drab", "firebrick", "floral", "forest",
          "frosted", "gainsboro", "ghost", "goldenrod", "green", "grey",
          "honeydew", "hot", "hotpink", "indian", "ivory", "khaki",
          "lace", "lavender", "lawn", "lemon", "light", "lime", "linen",
          "magenta", "maroon", "medium", "metallic", "midnight", "mint",
          "misty", "moccasin", "navajo", "navy", "olive", "orange",
          "orchid", "pale", "papaya", "peach", "peru", "pink", "plum",
          "powder", "puff", "purple", "red", "rose", "rosy", "royal",
          "saddle", "salmon", "sandy", "seashell", "sienna", "sky",
          "slate", "smoke", "snow", "spring", "steel", "tan", "thistle",
          "tomato", "turquoise", "violet", "wheat", "white", "yellow"]
NOUNS = ["packages", "requests", "accounts", "deposits", "foxes", "ideas",
         "theodolites", "pinto beans", "instructions", "dependencies",
         "excuses", "platelets", "asymptotes", "courts", "dolphins",
         "multipliers", "sauternes", "warthogs", "frets", "dinos"]
VERBS = ["sleep", "wake", "are", "cajole", "haggle", "nag", "use", "boost",
         "affix", "detect", "integrate", "maintain", "nod", "was", "lose",
         "sublate", "solve", "thrash", "promise", "engage"]
ADJS = ["furious", "sly", "careful", "blithe", "quick", "fluffy", "slow",
        "quiet", "ruthless", "thin", "close", "dogged", "daring", "brave",
        "stealthy", "permanent", "enticing", "idle", "busy", "regular",
        "final", "ironic", "even", "bold", "silent", "special", "pending",
        "express", "unusual"]


def _comment_pool(rng: np.random.Generator, n_pool: int, with_special: bool = False):
    """Bounded pool of dbgen-flavored comment sentences."""
    adj = rng.choice(ADJS, n_pool)
    noun = rng.choice(NOUNS, n_pool)
    verb = rng.choice(VERBS, n_pool)
    adj2 = rng.choice(ADJS, n_pool)
    noun2 = rng.choice(NOUNS, n_pool)
    out = np.array([f"{a} {n} {v} {a2} {n2}"
                    for a, n, v, a2, n2 in zip(adj, noun, verb, adj2, noun2)],
                   dtype=object)
    if with_special:
        # dbgen: ~some o_comments contain 'special ... requests' (Q13)
        k = max(n_pool // 100, 1)
        idx = rng.choice(n_pool, k, replace=False)
        for i in idx:
            out[i] = f"special packages {rng.choice(VERBS)} requests"
    return out


def _dec(arr_cents: np.ndarray, precision=15, scale=2) -> pa.Array:
    """int64 scaled mantissas -> decimal128 array (zero-copy-ish via buffers;
    pyarrow's int->decimal cast would instead multiply by 10^scale)."""
    cents = np.ascontiguousarray(arr_cents.astype(np.int64))
    buf = np.zeros((len(cents), 2), dtype=np.uint64)
    buf[:, 0] = cents.view(np.uint64)
    buf[:, 1] = np.where(cents < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
    return pa.Array.from_buffers(pa.decimal128(precision, scale), len(cents),
                                 [None, pa.py_buffer(buf.tobytes())])


def _dates(days: np.ndarray) -> pa.Array:
    return pa.array(days.astype(np.int32), type=pa.int32()).cast(pa.date32())


def _phone(rng, nk):
    c = 10 + nk
    a = rng.integers(100, 1000, len(nk))
    b = rng.integers(100, 1000, len(nk))
    d = rng.integers(1000, 10000, len(nk))
    return np.array([f"{ci}-{ai}-{bi}-{di}" for ci, ai, bi, di in zip(c, a, b, d)],
                    dtype=object)


# table -> (row_count_fn(sf), primary_key)
TPCH_TABLES = {
    "region": (lambda sf: 5, ("r_regionkey",)),
    "nation": (lambda sf: 25, ("n_nationkey",)),
    "supplier": (lambda sf: int(10_000 * sf), ("s_suppkey",)),
    "customer": (lambda sf: int(150_000 * sf), ("c_custkey",)),
    "part": (lambda sf: int(200_000 * sf), ("p_partkey",)),
    "partsupp": (lambda sf: int(800_000 * sf), ("ps_partkey", "ps_suppkey")),
    "orders": (lambda sf: int(1_500_000 * sf), ("o_orderkey",)),
    "lineitem": (lambda sf: None, ("l_orderkey", "l_linenumber")),  # ~6M*sf
}


def generate_table(name: str, sf: float, seed: int = 19940101,
                   lo: int = None, hi: int = None,
                   rng: np.random.Generator = None) -> pa.Table:
    """Generate one table, or (lo, hi, rng given) one ROW-RANGE of it.

    The range form is the SF100 path (tpch-gen.sh's dbgen -S chunk
    parity): each chunk draws from its own rng stream, so chunks generate
    independently with bounded RAM and any degree of parallelism. The
    default (whole-table) stream is unchanged — committed answer fixtures
    stay valid. For orders/lineitem the range indexes ORDERS rows, so a
    lineitem chunk regenerates its orders chunk and stays key-consistent.
    """
    import zlib
    # NOTE: stable per-table seed — Python's hash() is salted per process
    if rng is None:
        rng = np.random.default_rng(seed + zlib.crc32(name.encode()) % 100000)
    if name == "region":
        return pa.table({
            "r_regionkey": pa.array(range(5), type=pa.int64()),
            "r_name": pa.array(REGIONS),
            "r_comment": pa.array(_comment_pool(rng, 5)),
        })
    if name == "nation":
        return pa.table({
            "n_nationkey": pa.array(range(25), type=pa.int64()),
            "n_name": pa.array([n for n, _ in NATIONS]),
            "n_regionkey": pa.array([r for _, r in NATIONS], type=pa.int64()),
            "n_comment": pa.array(_comment_pool(rng, 25)),
        })
    if name == "supplier":
        full_n = TPCH_TABLES[name][0](sf)
        lo, hi = (lo, hi) if lo is not None else (0, full_n)
        n = hi - lo
        keys = np.arange(lo + 1, hi + 1)
        nk = rng.integers(0, 25, n)
        pool = _comment_pool(rng, 1000)
        # dbgen: some suppliers have 'Customer ... Complaints' comments (Q16)
        comments = pool[rng.integers(0, 1000, n)].copy()
        idx = rng.choice(n, max(n // 100, 1), replace=False)
        comments[idx] = "take Customer deposits Complaints"
        return pa.table({
            "s_suppkey": pa.array(keys, type=pa.int64()),
            "s_name": pa.array([f"Supplier#{k:09d}" for k in keys]),
            "s_address": pa.array(pool[rng.integers(0, 1000, n)]),
            "s_nationkey": pa.array(nk, type=pa.int64()),
            "s_phone": pa.array(_phone(rng, nk)),
            "s_acctbal": _dec(rng.integers(-99999, 999999, n)),
            "s_comment": pa.array(comments),
        })
    if name == "customer":
        full_n = TPCH_TABLES[name][0](sf)
        lo, hi = (lo, hi) if lo is not None else (0, full_n)
        n = hi - lo
        keys = np.arange(lo + 1, hi + 1)
        nk = rng.integers(0, 25, n)
        pool = _comment_pool(rng, 1000)
        return pa.table({
            "c_custkey": pa.array(keys, type=pa.int64()),
            "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
            "c_address": pa.array(pool[rng.integers(0, 1000, n)]),
            "c_nationkey": pa.array(nk, type=pa.int64()),
            "c_phone": pa.array(_phone(rng, nk)),
            "c_acctbal": _dec(rng.integers(-99999, 999999, n)),
            "c_mktsegment": pa.array(np.array(SEGMENTS, dtype=object)[rng.integers(0, 5, n)]),
            "c_comment": pa.array(pool[rng.integers(0, 1000, n)]),
        })
    if name == "part":
        full_n = TPCH_TABLES[name][0](sf)
        lo, hi = (lo, hi) if lo is not None else (0, full_n)
        n = hi - lo
        keys = np.arange(lo + 1, hi + 1)
        c5 = np.array(COLORS, dtype=object)
        name_parts = [c5[rng.integers(0, len(c5), n)] for _ in range(5)]
        names = np.array([" ".join(p) for p in zip(*name_parts)], dtype=object)
        t1 = np.array(TYPE_S1, dtype=object)[rng.integers(0, 6, n)]
        t2 = np.array(TYPE_S2, dtype=object)[rng.integers(0, 5, n)]
        t3 = np.array(TYPE_S3, dtype=object)[rng.integers(0, 5, n)]
        types = np.array([f"{a} {b} {c}" for a, b, c in zip(t1, t2, t3)], dtype=object)
        k1 = np.array(CONTAIN_S1, dtype=object)[rng.integers(0, 5, n)]
        k2 = np.array(CONTAIN_S2, dtype=object)[rng.integers(0, 8, n)]
        containers = np.array([f"{a} {b}" for a, b in zip(k1, k2)], dtype=object)
        pool = _comment_pool(rng, 1000)
        # retail price formula per dbgen
        price = (90000 + (keys % 20001) / 10 + 100 * (keys % 1000)).astype(np.int64)
        return pa.table({
            "p_partkey": pa.array(keys, type=pa.int64()),
            "p_name": pa.array(names),
            "p_mfgr": pa.array([f"Manufacturer#{m}" for m in rng.integers(1, 6, n)]),
            "p_brand": pa.array([f"Brand#{m}{x}" for m, x in
                                 zip(rng.integers(1, 6, n), rng.integers(1, 6, n))]),
            "p_type": pa.array(types),
            "p_size": pa.array(rng.integers(1, 51, n), type=pa.int32()),
            "p_container": pa.array(containers),
            "p_retailprice": _dec(price),
            "p_comment": pa.array(pool[rng.integers(0, 1000, n)]),
        })
    if name == "partsupp":
        n_part = TPCH_TABLES["part"][0](sf)
        n_supp = TPCH_TABLES["supplier"][0](sf)
        # range indexes PART rows (4 partsupp rows per part)
        plo, phi = (lo, hi) if lo is not None else (0, n_part)
        pk = np.repeat(np.arange(plo + 1, phi + 1), 4)
        n = len(pk)
        sk = ((pk + (np.tile(np.arange(4), phi - plo) * (n_supp // 4 + 1))) % n_supp) + 1
        pool = _comment_pool(rng, 1000)
        return pa.table({
            "ps_partkey": pa.array(pk, type=pa.int64()),
            "ps_suppkey": pa.array(sk, type=pa.int64()),
            "ps_availqty": pa.array(rng.integers(1, 10000, n), type=pa.int32()),
            "ps_supplycost": _dec(rng.integers(100, 100100, n)),
            "ps_comment": pa.array(pool[rng.integers(0, 1000, n)]),
        })
    if name == "orders":
        full_n = TPCH_TABLES[name][0](sf)
        lo, hi = (lo, hi) if lo is not None else (0, full_n)
        n = hi - lo
        # dbgen: order keys are sparse (8 of each 32)
        base = np.arange(lo, hi)
        keys = (base // 8) * 32 + (base % 8) + 1
        n_cust = TPCH_TABLES["customer"][0](sf)
        # only 2/3 of customers have orders (dbgen skips custkey % 3 == 0)
        ck = rng.integers(1, n_cust + 1, n)
        ck = np.where(ck % 3 == 0, (ck % (n_cust - 1)) + 1, ck)
        ck = np.where(ck % 3 == 0, ck + 1, ck)
        odate = rng.integers(STARTDATE, ENDDATE - 151, n)
        pool = _comment_pool(rng, 2000, with_special=True)
        total = rng.integers(100000, 50000000, n)
        return pa.table({
            "o_orderkey": pa.array(keys, type=pa.int64()),
            "o_custkey": pa.array(ck, type=pa.int64()),
            "o_orderstatus": pa.array(np.array(["F", "O", "P"], dtype=object)[
                np.where(odate + 151 < CURRENTDATE, 0,
                         np.where(odate > CURRENTDATE, 1, 2))]),
            "o_totalprice": _dec(total),
            "o_orderdate": _dates(odate),
            "o_orderpriority": pa.array(np.array(PRIORITIES, dtype=object)[rng.integers(0, 5, n)]),
            "o_clerk": pa.array([f"Clerk#{c:09d}"
                                 for c in rng.integers(1, max(int(sf * 1000), 2), n)]),
            "o_shippriority": pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
            "o_comment": pa.array(pool[rng.integers(0, 2000, n)]),
        })
    if name == "lineitem":
        # range indexes ORDERS rows: the chunk's lineitems derive from the
        # matching orders chunk, regenerated with the orders-chunk rng so
        # keys/dates stay consistent across independently-built chunks
        if lo is not None:
            orders = generate_table("orders", sf, seed, lo, hi,
                                    rng=_chunk_rng("orders", seed, lo, hi))
        else:
            orders = generate_table("orders", sf, seed)
        okeys = np.asarray(orders["o_orderkey"])
        odates = np.asarray(orders["o_orderdate"].cast(pa.int32()))
        n_orders = len(okeys)
        per = rng.integers(1, 8, n_orders)  # 1..7 lineitems per order
        l_ok = np.repeat(okeys, per)
        l_od = np.repeat(odates, per)
        n = len(l_ok)
        ln = np.concatenate([np.arange(1, p + 1) for p in per]).astype(np.int32)
        n_part = TPCH_TABLES["part"][0](sf)
        n_supp = TPCH_TABLES["supplier"][0](sf)
        pk = rng.integers(1, n_part + 1, n)
        # supplier consistent with partsupp: one of the part's 4 suppliers
        j = rng.integers(0, 4, n)
        sk = ((pk + j * (n_supp // 4 + 1)) % n_supp) + 1
        qty = rng.integers(1, 51, n)
        # extendedprice = qty * p_retailprice(partkey)
        retail = (90000 + (pk % 20001) / 10 + 100 * (pk % 1000)).astype(np.int64)
        eprice = qty * retail
        disc = rng.integers(0, 11, n)      # 0.00 - 0.10
        tax = rng.integers(0, 9, n)        # 0.00 - 0.08
        shipdate = l_od + rng.integers(1, 122, n)
        commitdate = l_od + rng.integers(30, 91, n)
        receiptdate = shipdate + rng.integers(1, 31, n)
        returnflag = np.where(receiptdate <= CURRENTDATE,
                              np.array(["R", "A"], dtype=object)[rng.integers(0, 2, n)],
                              "N")
        linestatus = np.where(shipdate > CURRENTDATE, "O", "F").astype(object)
        pool = _comment_pool(rng, 2000)
        return pa.table({
            "l_orderkey": pa.array(l_ok, type=pa.int64()),
            "l_partkey": pa.array(pk, type=pa.int64()),
            "l_suppkey": pa.array(sk, type=pa.int64()),
            "l_linenumber": pa.array(ln, type=pa.int32()),
            "l_quantity": _dec(qty * 100),
            "l_extendedprice": _dec(eprice),
            "l_discount": _dec(disc),
            "l_tax": _dec(tax),
            "l_returnflag": pa.array(returnflag),
            "l_linestatus": pa.array(linestatus),
            "l_shipdate": _dates(shipdate),
            "l_commitdate": _dates(commitdate),
            "l_receiptdate": _dates(receiptdate),
            "l_shipinstruct": pa.array(np.array(INSTRUCTIONS, dtype=object)[rng.integers(0, 4, n)]),
            "l_shipmode": pa.array(np.array(SHIPMODES, dtype=object)[rng.integers(0, 7, n)]),
            "l_comment": pa.array(pool[rng.integers(0, 2000, n)]),
        })
    raise KeyError(name)


def _chunk_rng(name: str, seed: int, lo: int, hi: int) -> np.random.Generator:
    """Deterministic per-(table, range) stream: any process can build any
    chunk independently and get identical bytes."""
    import zlib
    return np.random.default_rng(
        [seed + zlib.crc32(name.encode()) % 100000, lo, hi])


def chunk_ranges(name: str, sf: float, n_chunks: int):
    """Row ranges of the table's DRIVING index (orders rows for lineitem,
    part rows for partsupp — 4 partsupp rows per part, ~4 lineitems per
    order)."""
    base = {"lineitem": "orders", "partsupp": "part"}.get(name, name)
    full = TPCH_TABLES[base][0](sf)
    bounds = [round(i * full / n_chunks) for i in range(n_chunks + 1)]
    return [(bounds[c], bounds[c + 1]) for c in range(n_chunks)
            if bounds[c + 1] > bounds[c]]


def generate_table_chunks(name: str, sf: float, n_chunks: int,
                          seed: int = 19940101):
    """Yield (chunk_index, pa.Table): bounded-RAM generation for scale
    factors whose tables don't fit in host memory (the SF100 path; dbgen's
    -C/-S chunking, benchmarks/tpch-gen.sh parity). Chunked streams differ
    from the whole-table stream — verify chunked data against an oracle on
    the same data, not against whole-table answer fixtures."""
    if name in ("region", "nation"):
        yield 0, generate_table(name, sf, seed)
        return
    base = {"lineitem": "orders", "partsupp": "part"}.get(name, name)
    for c, (lo, hi) in enumerate(chunk_ranges(name, sf, n_chunks)):
        yield c, generate_table(name, sf, seed, lo, hi,
                                rng=_chunk_rng(base if name == "partsupp"
                                               else name, seed, lo, hi))


def _write_chunk(args) -> tuple:
    """Worker for parallel chunked generation: one (table, chunk) part
    file, self-contained (chunks are independent by construction)."""
    sf, out_dir, name, c, lo, hi, seed, row_group_rows = args
    import pyarrow.parquet as pq
    base = {"lineitem": "orders", "partsupp": "part"}.get(name, name)
    t = generate_table(name, sf, seed, lo, hi,
                       rng=_chunk_rng(base if name == "partsupp" else name,
                                      seed, lo, hi))
    d = os.path.join(out_dir, name)
    path = os.path.join(d, f"part_{c:04d}.parquet")
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(t, tmp, row_group_size=row_group_rows)
    os.replace(tmp, path)
    return name, t.num_rows


def generate_tpch_parquet(sf: float, out_dir: str, n_chunks: int = 1,
                          seed: int = 19940101, tables=None,
                          row_group_rows: int = 1 << 20,
                          workers: int = 1) -> dict:
    """Stream every table to parquet part-files with bounded RAM:
    out_dir/<table>/part_<c>.parquet. Returns per-table row counts.
    workers > 1 builds chunks in parallel processes (chunks draw from
    independent rng streams, so parallel == sequential bytes)."""
    import pyarrow.parquet as pq
    names = tables or list(TPCH_TABLES)
    counts = {n: 0 for n in names}
    tasks = []
    for name in names:
        os.makedirs(os.path.join(out_dir, name), exist_ok=True)
        if name in ("region", "nation"):
            t = generate_table(name, sf, seed)
            pq.write_table(t, os.path.join(out_dir, name,
                                           "part_0000.parquet"))
            counts[name] = t.num_rows
            continue
        for c, (lo, hi) in enumerate(chunk_ranges(name, sf, n_chunks)):
            tasks.append((sf, out_dir, name, c, lo, hi, seed,
                          row_group_rows))
    if workers > 1:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for name, rows in ex.map(_write_chunk, tasks):
                counts[name] += rows
    else:
        for task in tasks:
            name, rows = _write_chunk(task)
            counts[name] += rows
    return counts


def generate_tpch(sf: float, seed: int = 19940101,
                  tables: Optional[list] = None) -> Dict[str, pa.Table]:
    names = tables or list(TPCH_TABLES)
    cache_dir = os.environ.get("BALLISTA_TPCH_CACHE")
    if not cache_dir:
        return {n: generate_table(n, sf, seed) for n in names}
    # disk cache: SF10 datagen is minutes of host CPU; benchmark sweeps
    # re-ingest the same tables many times (reference keeps .tbl/.parquet
    # on disk the same way, benchmarks/tpch-gen.sh)
    import pyarrow.parquet as pq
    out = {}
    for n in names:
        path = os.path.join(cache_dir, f"{n}_sf{sf:g}_s{seed}.parquet")
        if os.path.exists(path):
            out[n] = pq.read_table(path)
        else:
            out[n] = generate_table(n, sf, seed)
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{path}.tmp{os.getpid()}"
            pq.write_table(out[n], tmp)
            os.replace(tmp, path)
    return out


def register_tpch(ctx, sf: float, seed: int = 19940101,
                  tables: Optional[list] = None,
                  data: Optional[Dict[str, pa.Table]] = None) -> None:
    data = data or generate_tpch(sf, seed, tables)
    for name, table in data.items():
        ctx.register_arrow(name, table, primary_key=TPCH_TABLES[name][1])


if __name__ == "__main__":
    import argparse
    import pyarrow.parquet as pq
    import os

    ap = argparse.ArgumentParser(description="Generate TPC-H data to parquet")
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", default="/tmp/tpch")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in TPCH_TABLES:
        t = generate_table(name, args.sf)
        pq.write_table(t, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows")
