#!/usr/bin/env python3
"""Local fixture generator for scale factors above the driver-provided
sf0.1 (the driver owns /root/testdata — read-only; larger fixtures live
under the repo and are gitignored).

Reproduces the driver generator's schemas, arrow types, and measured
marginals (see SCALE.md "sf1 fixture" for the derivation):

  region 5 / nation 25 (fixed); customer 150k*sf; supplier 10k*sf;
  part 200k*sf; orders 1.5M*sf; lineitem 6M*sf (l_orderkey uniform =>
  Poisson(4) lines/order); events 1M*sf over a FIXED 30-day window
  (density scales, window doesn't — matches sf0.001..0.1); documents
  50k*sf from the 31-word vocab with ~0.2% planted exact dups;
  embeddings 20k*sf unit-norm 64-dim with weak label pull (same-label
  mean cos ~= 0.021 => pull 1.2 on N(0,1) coords).

Deterministic: seed fixed per table. Usage:
  python3 tools/gen_sf.py <sf> <outDir>     e.g.  1 testdata/sf1

Every run ends with a SCHEMA GUARD: the generated tables' arrow
schemas are diffed field-by-field (name, type, order) against the
driver's /root/testdata/sf0.01 fixture, and any mismatch fails the
run loudly. Round 7's lesson: the driver regenerated its fixture with
every timestamp as timestamp[us] and this generator silently drifted,
which surfaced as 11 red queries instead of one schema diff.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_MS = 86_400_000
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
ORDER_DAYS = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int) + 1
EV_LO_NS = np.datetime64("2024-01-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
EV_HI_NS = np.datetime64("2024-01-31T00:00:00").astype("datetime64[ns]").astype(np.int64)


def write(out_dir, name, cols):
    pq.write_table(pa.table(cols), os.path.join(out_dir, name + ".parquet"))
    print("wrote", name, len(next(iter(cols.values()))), "rows")


def i32(a): return pa.array(np.asarray(a, dtype=np.int32), pa.int32())
def i64(a): return pa.array(np.asarray(a, dtype=np.int64), pa.int64())
def f64(a): return pa.array(np.asarray(a, dtype=np.float64), pa.float64())
def s(a): return pa.array(list(a), pa.string())
# the round-7 driver fixture stores every timestamp as timestamp[us]
# (earlier rounds used ms for dates and ns for events.ts); helpers take
# the same ms/ns integers and widen/truncate to us at write time
def ts_ms(a): return pa.array(np.asarray(a, np.int64) * 1000, pa.timestamp("us"))
def ts_ns(a): return pa.array(np.asarray(a, np.int64) // 1000, pa.timestamp("us"))


def main(sf, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    n_cust = round(150_000 * sf)
    n_supp = round(10_000 * sf)
    n_part = round(200_000 * sf)
    n_ord = round(1_500_000 * sf)
    n_li = round(6_000_000 * sf)
    n_ev = round(1_000_000 * sf)
    n_users = round(15_000 * sf)
    n_doc = max(500, round(50_000 * sf))
    n_emb = max(500, round(20_000 * sf))

    write(out_dir, "region",
          {"r_regionkey": i32(np.arange(5)), "r_name": s(REGIONS)})
    write(out_dir, "nation",
          {"n_nationkey": i32(np.arange(25)),
           "n_name": s([f"NATION_{i}" for i in range(25)]),
           "n_regionkey": i32(np.arange(25) % 5)})

    r = np.random.default_rng(4201)
    write(out_dir, "customer", {
        "c_custkey": i64(np.arange(n_cust)),
        "c_name": s([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": i32(r.integers(0, 25, n_cust)),
        "c_acctbal": f64(np.round(r.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": s(np.array(SEGS)[r.integers(0, 5, n_cust)])})

    r = np.random.default_rng(4202)
    write(out_dir, "supplier", {
        "s_suppkey": i64(np.arange(n_supp)),
        "s_name": s([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": i32(r.integers(0, 25, n_supp)),
        "s_acctbal": f64(np.round(r.uniform(-1000, 10000, n_supp), 2))})

    r = np.random.default_rng(4203)
    pk = np.arange(n_part)
    write(out_dir, "part", {
        "p_partkey": i64(pk),
        "p_name": s([f"{ADJS[a]} {NOUNS[b]}" for a, b in
                     zip(r.integers(0, 8, n_part), r.integers(0, 8, n_part))]),
        "p_brand": s([f"Brand#{i}" for i in r.integers(0, 25, n_part)]),
        "p_type": s(np.array(TYPES)[r.integers(0, 6, n_part)]),
        "p_size": i32(r.integers(1, 51, n_part)),
        "p_retailprice": f64(np.round(900.0 + 0.1 * (pk % 1000), 1))})

    r = np.random.default_rng(4204)
    odate_day = r.integers(0, ORDER_DAYS, n_ord)
    odate_ms = EPOCH_1995 + odate_day * DAY_MS
    write(out_dir, "orders", {
        "o_orderkey": i64(np.arange(n_ord)),
        "o_custkey": i64(r.integers(0, n_cust, n_ord)),
        "o_orderstatus": s(np.array(["O", "F", "P"])[r.integers(0, 3, n_ord)]),
        "o_totalprice": f64(np.round(r.uniform(1000, 500_000, n_ord), 2)),
        "o_orderdate": ts_ms(odate_ms),
        "o_orderpriority": s(np.array(PRIOS)[r.integers(0, 5, n_ord)])})

    r = np.random.default_rng(4205)
    lok = r.integers(0, n_ord, n_li)
    write(out_dir, "lineitem", {
        "l_orderkey": i64(lok),
        "l_partkey": i64(r.integers(0, n_part, n_li)),
        "l_suppkey": i64(r.integers(0, n_supp, n_li)),
        "l_linenumber": i32(r.integers(1, 8, n_li)),
        "l_quantity": f64(r.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": f64(np.round(r.uniform(900, 105_000, n_li), 2)),
        "l_discount": f64(np.round(r.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": f64(np.round(r.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": s(np.array(["A", "N", "R"])[r.integers(0, 3, n_li)]),
        "l_linestatus": s(np.array(["F", "O"])[r.integers(0, 2, n_li)]),
        "l_shipdate": ts_ms(odate_ms[lok] + r.integers(1, 96, n_li) * DAY_MS)})

    r = np.random.default_rng(4206)
    ev_ts = np.sort(r.integers(EV_LO_NS, EV_HI_NS, n_ev))
    write(out_dir, "events", {
        "event_id": i64(np.arange(n_ev)),
        "ts": ts_ns(ev_ts),
        "user_id": i64(r.integers(0, n_users, n_ev)),
        "event_type": s(np.array(EVENT_TYPES)[r.integers(0, 5, n_ev)]),
        "value": f64(np.round(r.exponential(50.0, n_ev), 2)),
        "props": s([f'{{"k": {k}}}' for k in r.integers(0, 100, n_ev)])})

    r = np.random.default_rng(4207)
    nwords = r.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[r.integers(0, len(vocab), k)]) for k in nwords]
    # plant ~0.2% exact duplicates (copy an earlier doc), as in sf0.1
    for i in np.nonzero(r.random(n_doc) < 0.002)[0]:
        if i > 0:
            texts[i] = texts[r.integers(0, i)]
    write(out_dir, "documents", {
        "doc_id": i64(np.arange(n_doc)),
        "text": s(texts),
        "lang": s(r.choice(LANGS, n_doc, p=LANG_W)),
        "source": s([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": i64([len(t) for t in texts])})

    r = np.random.default_rng(4208)
    cent = r.normal(size=(10, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    label = r.integers(0, 10, n_emb)
    v = r.normal(size=(n_emb, 64)) + 1.2 * cent[label]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype(np.float32)
    write(out_dir, "embeddings", {
        "vec_id": i64(np.arange(n_emb)),
        "embedding": pa.array(list(v32), pa.list_(pa.float32())),
        "label": i32(label)})


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
DRIVER_FIXTURE = "/root/testdata/sf0.01"


def check_schemas(out_dir, ref_dir=DRIVER_FIXTURE):
    """Diff generated schemas against the driver fixture's; return a
    list of human-readable drift lines (empty = no drift)."""
    drift = []
    for t in TABLES:
        got_path = os.path.join(out_dir, t + ".parquet")
        ref_path = os.path.join(ref_dir, t + ".parquet")
        if not os.path.exists(ref_path):
            drift.append(f"{t}: driver fixture missing at {ref_path}")
            continue
        if not os.path.exists(got_path):
            drift.append(f"{t}: generator produced no table")
            continue
        got, ref = pq.read_schema(got_path), pq.read_schema(ref_path)
        if got.names != ref.names:
            drift.append(f"{t}: column names/order {got.names} != {ref.names}")
            continue
        for name in ref.names:
            gt, rt = got.field(name).type, ref.field(name).type
            if gt != rt:
                drift.append(f"{t}.{name}: type {gt} != driver's {rt}")
    return drift


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
    problems = check_schemas(sys.argv[2])
    if problems:
        print("SCHEMA DRIFT vs " + DRIVER_FIXTURE + ":", file=sys.stderr)
        for p in problems:
            print("  " + p, file=sys.stderr)
        sys.exit(1)
    print(f"schema guard: all {len(TABLES)} tables match {DRIVER_FIXTURE}")
