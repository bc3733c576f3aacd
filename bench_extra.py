"""Round-6 measurement harness (guide §1): per-query noop-sink timing
and ``.explain("formatted")`` capture, SEPARATE from the frozen
``bench.py`` (which the driver re-runs unchanged).

Usage:
  python bench_extra.py plans <outdir> [name ...]   # capture explain() per query
  python bench_extra.py time  [name ...]            # noop-sink min-of-3 per query

Timing methodology matches bench.py (same session config, same
warmup, min-of-N) but sinks through ``format("noop")`` so the
computation — not the collect/driver transfer — is what is timed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _session():
    from verdictdb_spark import queries as q
    from verdictdb_spark.session import get_spark

    spark = get_spark("verdictdb-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM, arrow workers, sketch imports, scrambles
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    nw = int(CPUS) if CPUS.isdigit() else 32
    spark.range(1000).repartition(nw).mapInPandas(lambda it: it, "id long").count()
    from verdictdb_spark.operators.distinct import approx_count_distinct_by
    from verdictdb_spark.operators.quantile import approx_quantiles

    warm = spark.range(10_000).repartition(nw).selectExpr(
        "id", "cast(id % 7 as string) g"
    )
    approx_count_distinct_by(warm, "id", ["g"], p=6).collect()
    approx_quantiles(warm, "id", [0.5], ["g"], k=64).collect()
    q.ensure_scrambles(spark, SF_DIR)
    return spark, q


def capture_plans(outdir: str, names: list[str]) -> None:
    spark, q = _session()
    reg = q.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names or list(reg):
        try:
            df = reg[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # plan-time failure must not kill the sweep
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name} ({len(txt)} bytes)")
    spark.stop()


def time_noop(names: list[str]) -> None:
    spark, q = _session()
    reg = q.queries()
    names = names or list(reg)
    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"noop:{name}")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.monotonic()
            reg[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        times[name] = round(best, 3)
        print(f"{name}: {times[name]}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"noop_min": times, "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        capture_plans(sys.argv[2], sys.argv[3:])
    else:
        time_noop(sys.argv[2:])
