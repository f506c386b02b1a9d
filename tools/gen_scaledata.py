"""Generate repo-local scale-test data mirroring TESTDATA.md's tables.

The driver ships sf0.001/0.01/0.1; scale evidence above that needs
bigger inputs, so this tool regenerates the same ten tables at any sf
with the distributions measured from the driver data (row counts and
key cardinalities scale linearly with sf; date windows, categorical
domains, value distributions, the 5% near-duplicate / ~0.16%
exact-duplicate document structure, and unit-norm 64-dim embeddings
all match):

    python tools/gen_scaledata.py 1 /root/repo/scaledata/sf1
    python tools/gen_scaledata.py 0.1 /root/repo/scaledata/sf0.1

Generating a twin sf0.1 with the SAME generator gives
generator-consistent sf0.1 -> sf1 scaling ratios (and the twin's
bench numbers can be checked against the driver-sf0.1 numbers to
validate the distributions are faithful).

Determinism: every column is a pure function of the row id through
xxhash64 (no RNG state except numpy for the small embeddings table,
seeded) — any sf regenerates bit-identically. Each table lands as a
single parquet FILE named <table>.parquet so both Spark and DuckDB
read it exactly like the driver's layout.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

DRIVER_SF01 = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "zh", "fr", "es"]          # en 41%, rest ~14.75%
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]


def u(salt: int, *extra):
    """Uniform [0,1) as a pure function of (id, salt[, extra cols])."""
    h = F.xxhash64(F.col("id"), F.lit(salt), *extra)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def pick(arr: list[str], salt: int, *extra):
    h = F.xxhash64(F.col("id"), F.lit(salt), *extra)
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def write_one(df: DataFrame, out_dir: str, name: str) -> None:
    tmp = os.path.join(out_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(tmp, part), os.path.join(out_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)
    print(f"  {name}: written")


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    from datastream_spark.session import get_spark

    spark = get_spark("gen-scaledata")
    spark.sparkContext.setLogLevel("ERROR")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_lineitem = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_vecs = max(500, int(20_000 * sf))
    parts = max(8, int(32 * sf))

    # region / nation: fixed dimension tables — copy the driver's.
    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(DRIVER_SF01, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
        print(f"  {t}: copied (fixed table)")

    cust = spark.range(0, n_cust, 1, parts).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(25)).alias("c_nationkey"),
        F.round(-999.99 + u(12) * 10999.8, 2).alias("c_acctbal"),
        pick(SEGMENTS, 13).alias("c_mktsegment"),
    )
    write_one(cust, out_dir, "customer")

    supp = spark.range(0, n_supp, 1, parts).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(F.xxhash64("id", F.lit(21)), F.lit(25)).alias("s_nationkey"),
        F.round(u(22) * 9999.99, 2).alias("s_acctbal"),
    )
    write_one(supp, out_dir, "supplier")

    part = spark.range(0, n_part, 1, parts).select(
        F.col("id").alias("p_partkey"),
        F.concat(pick(P_ADJ, 31), F.lit(" "), pick(P_NOUN, 32)).alias("p_name"),
        F.concat(
            F.lit("Brand#"),
            (F.pmod(F.xxhash64("id", F.lit(33)), F.lit(25)) + 1).cast("string"),
        ).alias("p_brand"),
        pick(P_TYPES, 34).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(35)), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(900.0 + F.col("id") * 0.1, 2).alias("p_retailprice"),
    )
    write_one(part, out_dir, "part")

    epoch95 = 788918400  # 1995-01-01 UTC
    orders = spark.range(0, n_orders, 1, parts).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(41)), F.lit(n_cust)).alias("o_custkey"),
        pick(["O", "P", "F"], 42).alias("o_orderstatus"),
        F.round(1000.0 + u(43) * 499000.0, 2).alias("o_totalprice"),
        F.timestamp_seconds(
            (F.lit(epoch95) + (u(44) * 2400 * 86400).cast("bigint"))
        ).alias("o_orderdate"),
        pick(PRIORITIES, 45).alias("o_orderpriority"),
    )
    write_one(orders, out_dir, "orders")

    li = spark.range(0, n_lineitem, 1, parts).select(
        F.pmod(F.xxhash64("id", F.lit(51)), F.lit(n_orders)).alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(52)), F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64("id", F.lit(53)), F.lit(n_supp)).alias("l_suppkey"),
        (F.pmod(F.xxhash64("id", F.lit(54)), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64("id", F.lit(55)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(900.0 + u(56) * 104100.0, 2).alias("l_extendedprice"),
        (F.pmod(F.xxhash64("id", F.lit(57)), F.lit(11)).cast("double") / 100.0).alias("l_discount"),
        (F.pmod(F.xxhash64("id", F.lit(58)), F.lit(9)).cast("double") / 100.0).alias("l_tax"),
        pick(["A", "N", "R"], 59).alias("l_returnflag"),
        pick(["O", "F"], 60).alias("l_linestatus"),
        F.timestamp_seconds(
            (F.lit(epoch95) + (u(61) * 2500 * 86400).cast("bigint"))
        ).alias("l_shipdate"),
    )
    write_one(li, out_dir, "lineitem")

    epoch24 = 1704067200  # 2024-01-01 UTC
    ev = spark.range(0, n_events, 1, parts).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(epoch24 * 1_000_000)
            + (u(71) * 30 * 86400 * 1e6).cast("bigint")
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(72)), F.lit(n_users)).alias("user_id"),
        pick(EVENT_TYPES, 73).alias("event_type"),
        F.round(-50.0 * F.log(1.0 - u(74)), 2).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64("id", F.lit(75)), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )
    write_one(ev, out_dir, "events")

    # documents: word-salad from a 30-word vocab; 5% near-dups (an
    # earlier doc's text + ' dup') and ~0.16% exact dups, the same
    # duplicate structure the dedup probes exercise on driver data
    base = spark.range(0, n_docs, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1),
                    (F.pmod(F.xxhash64("id", F.lit(81)), F.lit(91)) + 10).cast("int"),
                ),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in VOCAB]),
                    (F.pmod(F.xxhash64(F.col("id"), F.lit(82), i), F.lit(len(VOCAB))) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("base_text"),
        F.when(u(83) < 0.41, F.lit("en")).otherwise(pick(LANGS[1:], 84)).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("id", F.lit(85)), F.lit(20)).cast("string")
        ).alias("source"),
        F.pmod(F.xxhash64("id", F.lit(86)), F.lit(1000)).alias("_dup_roll"),
        F.pmod(F.xxhash64("id", F.lit(87)), F.lit(max(1, n_docs // 2))).alias("_base_ref"),
    )
    lookup = base.select(
        F.col("doc_id").alias("_base_ref"), F.col("base_text").alias("_ref_text")
    )
    docs = (
        base.join(lookup, "_base_ref", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("_dup_roll") < 67) & (F.col("_base_ref") < F.col("doc_id")),
                F.concat(F.col("_ref_text"), F.lit(" dup")),
            )
            .when(
                (F.col("_dup_roll").between(67, 68))
                & (F.col("_base_ref") < F.col("doc_id")),
                F.col("_ref_text"),
            )
            .otherwise(F.col("base_text"))
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    write_one(docs.orderBy("doc_id"), out_dir, "documents")

    # embeddings: unit-norm 64-dim float32, labels uniform 0..9 with
    # no cluster structure (matches driver data: same/diff-label mean
    # cosine are both ~0)
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    x = rng.standard_normal((n_vecs, 64))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    lab = rng.integers(0, 10, size=n_vecs).astype(np.int32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n_vecs, dtype=np.int64), "embedding": list(map(list, x)), "label": lab}
    )
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>, label int")
    write_one(emb, out_dir, "embeddings")

    print(f"done: sf={sf} at {out_dir}")


if __name__ == "__main__":
    main()
