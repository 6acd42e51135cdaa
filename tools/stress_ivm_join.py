"""SF0.1 soak of the JOIN-view kitchen sink (r11 verdict item 5): a
filtered join view composing every aggregate kind — sum, count(*),
avg, min, max, count_distinct — maintained under a randomized
full-verb program (fact/dim upserts with deletes, join-key moves,
segment renames, source compactions) at REAL data volume
(sf0.1: 150k orders x 15k customers), with the broadcast byte gate
FORCED LOW on alternating steps so the catch-up (past-gate) lanes —
plain-shuffle folds, no isin peek, no broadcast hints — run against
sf0.1-sized slices instead of the toy rows the randomized pytest
model feeds them.

After every refresh the view must equal the direct filtered join
GROUP BY over the two resolved tables (integer cents exact; avg is
the same sum/count quotient on both sides).

Usage::

    python tools/stress_ivm_join.py [steps] [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from async_pipes_spark.functions.money import cents  # noqa: E402
from async_pipes_spark.session import get_spark  # noqa: E402
from async_pipes_spark.sources import ivm_join as ivj  # noqa: E402
from async_pipes_spark.sources.sinks import (  # noqa: E402
    compact_small_files,
    mor_upsert,
    read_table,
    write_manifest_table,
)
from async_pipes_spark.sources.tables import load_table  # noqa: E402

FILTER = "price_cents >= 100000"


def main() -> int:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    rng = random.Random(0x0F1)
    spark = get_spark("stress-ivm-join")
    base = tempfile.mkdtemp(prefix="stress_ivmj_")
    opath, cpath, view = f"{base}/orders", f"{base}/cust", f"{base}/view"

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.lit(0).cast("long").alias("over"),
        cents("o_totalprice").alias("price_cents"),
        F.col("o_custkey").alias("custkey"),
        F.lit(False).alias("odead"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.lit(0).cast("long").alias("cver"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(False).alias("cdead"),
    )
    write_manifest_table(spark, orders, opath)
    write_manifest_table(spark, cust, cpath)
    ivj.create_join_view(
        spark, opath, cpath, view, ["custkey"], ["seg"],
        {
            "sum_price": ("sum", "price_cents"),
            "n_ord": ("count", "*"),
            "avg_price": ("avg", "price_cents"),
            "min_price": ("min", "price_cents"),
            "max_price": ("max", "price_cents"),
            "n_cust": ("count_distinct", "custkey"),
        },
        left_tombstone_col="odead",
        right_tombstone_col="cdead",
        filter_expr=FILTER,
    )

    def expected():
        o = read_table(spark, opath).where(
            ~F.coalesce(F.col("odead"), F.lit(False)))
        c = read_table(spark, cpath).where(
            ~F.coalesce(F.col("cdead"), F.lit(False)))
        j = o.join(c, ["custkey"]).where(FILTER)
        rows = j.groupBy("seg").agg(
            F.sum("price_cents").alias("sum_price"),
            F.count(F.lit(1)).alias("n_ord"),
            (F.sum("price_cents") / F.count("price_cents")).alias("avg_price"),
            F.min("price_cents").alias("min_price"),
            F.max("price_cents").alias("max_price"),
            F.countDistinct("custkey").alias("n_cust"),
        ).collect()
        return {r["seg"]: tuple(r)[1:] for r in rows}

    def got():
        return {
            r["seg"]: tuple(r)[1:]
            for r in ivj.read_join_view(spark, view).select(
                "seg", "sum_price", "n_ord", "avg_price",
                "min_price", "max_price", "n_cust",
            ).collect()
        }

    real_gate = ivj._MOR_BROADCAST_MAX_BYTES
    record: list[dict] = []
    ok = True
    ver = 0
    try:
        assert got() == expected(), "create-time parity"
        m = F.col("ok") % 100
        cm = F.col("custkey") % 10
        for step in range(steps):
            ver += 1
            # force the PAST-GATE catch-up lane on odd steps: every
            # byte-gated decision (isin peek, broadcast hints, feed
            # pin) must degrade to the plain-shuffle lane and still
            # produce the identical view
            gated = step % 2 == 1
            ivj._MOR_BROADCAST_MAX_BYTES = -1 if gated else real_gate
            verbs = []
            lo = rng.randrange(0, 80)
            hi = lo + rng.randrange(5, 25)
            kind = rng.random()
            if kind < 0.5:
                # fact wave: price bumps + join-key moves + deletes,
                # extremes-holder removals included (min/max lane)
                verbs.append("fact-wave")
                mor_upsert(spark, opath, orders.where(
                    (m >= lo) & (m < hi)
                ).select(
                    "ok", F.lit(ver).cast("long").alias("over"),
                    (F.col("price_cents") + rng.randrange(-200000, 200000))
                    .alias("price_cents"),
                    ((F.col("custkey") % 1000) + 1).alias("custkey"),
                    (F.col("ok") % 7 == 0).alias("odead"),
                ), key_cols=["ok"], version_cols=["over"],
                    tombstone_col="odead")
            elif kind < 0.8:
                verbs.append("dim-wave")
                mor_upsert(spark, cpath, cust.where(
                    cm == rng.randrange(10)
                ).select(
                    "custkey", F.lit(ver).cast("long").alias("cver"),
                    F.lit(f"SEG{ver}").alias("seg"),
                    (F.col("custkey") % 5 == 0).alias("cdead"),
                ), key_cols=["custkey"], version_cols=["cver"],
                    tombstone_col="cdead")
            else:
                verbs.append("both-sides")
                mor_upsert(spark, opath, orders.where(m < 5).select(
                    (F.col("ok") + ver * 10_000_000).alias("ok"),
                    F.lit(ver).cast("long").alias("over"),
                    (F.col("price_cents") + 333).alias("price_cents"),
                    F.lit(1).cast(orders.schema["custkey"].dataType)
                    .alias("custkey"),
                    F.lit(False).alias("odead"),
                ), key_cols=["ok"], version_cols=["over"],
                    tombstone_col="odead")
                mor_upsert(spark, cpath, cust.where(cm == 3).select(
                    "custkey", F.lit(ver).cast("long").alias("cver"),
                    F.lit(None).cast("string").alias("seg"),
                    F.lit(True).alias("cdead"),
                ), key_cols=["custkey"], version_cols=["cver"],
                    tombstone_col="cdead")
            if rng.random() < 0.25:
                verbs.append("compact-fact")
                compact_small_files(spark, opath)
            t0 = time.perf_counter()
            s = ivj.refresh_join_view(spark, view)
            wall = round(time.perf_counter() - t0, 2)
            parity = got() == expected()
            ok = ok and parity
            row = {
                "step": step, "verbs": verbs, "gated_low": gated,
                "mode": s["mode"], "status": s, "refresh_sec": wall,
                "parity_ok": parity,
            }
            record.append(row)
            print(json.dumps(row), flush=True)
            if not parity:
                break
        # deterministic tail: kill the current max/min holders so the
        # NEEDY recompute lane provably runs — once past the gate
        # (plain-shuffle slices at sf0.1 volume), once under it
        for gated in (True, False):
            if not ok:
                break
            ver += 1
            ivj._MOR_BROADCAST_MAX_BYTES = -1 if gated else real_gate
            o_live = read_table(spark, opath).where(
                ~F.coalesce(F.col("odead"), F.lit(False)))
            order_by = (F.col("price_cents").desc() if gated
                        else F.col("price_cents").asc())
            holders = o_live.orderBy(order_by, "ok").limit(200).select(
                "ok", F.lit(ver).cast("long").alias("over"),
                "price_cents", "custkey", F.lit(True).alias("odead"),
            )
            mor_upsert(spark, opath, holders, key_cols=["ok"],
                       version_cols=["over"], tombstone_col="odead")
            t0 = time.perf_counter()
            s = ivj.refresh_join_view(spark, view)
            wall = round(time.perf_counter() - t0, 2)
            parity = got() == expected()
            ok = ok and parity
            row = {
                "step": f"kill-extremes-{'max' if gated else 'min'}",
                "verbs": ["kill-extremes"], "gated_low": gated,
                "mode": s["mode"], "status": s, "refresh_sec": wall,
                "parity_ok": parity,
            }
            record.append(row)
            print(json.dumps(row), flush=True)
    finally:
        ivj._MOR_BROADCAST_MAX_BYTES = real_gate
        shutil.rmtree(base, ignore_errors=True)
    out = {"sf_dir": sf_dir, "steps": record, "all_parity_ok": ok}
    if out_json:
        Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps({"all_parity_ok": ok, "steps": len(record)}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
