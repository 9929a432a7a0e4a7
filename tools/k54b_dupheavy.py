"""Round-9 verdict ask #9: measure k54 vs k54b ABSOLUTE time on a
DUP-HEAVY planted corpus (~40% exact-duplicate rows — the regime real
web crawls live in; the registered fixture corpus is only ~18%
exact-dup, where k54b's representatives-first lever has little to
compress, so round 8 could only ARGUE the crossover).

Corpus: sf0.1 documents + TWO exact copies of every doc_id % 3 == 0
row (distinct doc_ids, same text) -> 3333/8333 + the fixture's own
curated copies ≈ 40% of rows are exact-duplicates of another row.
Both kernels run on the SAME frame, warm interleaved min-of-2 (the
scaling-curve procedure). Writes k54b_dupheavy.json and prints the
SCALE.md row.

Run: python tools/k54b_dupheavy.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

from pyspark.sql import functions as F  # noqa: E402

from glonassdatamining_spark.operators.llm_ops import (  # noqa: E402
    _k54_assign,
    _k54b_assign,
)
from glonassdatamining_spark.session import get_spark  # noqa: E402
from glonassdatamining_spark.sources import load  # noqa: E402

SF_DIR = os.environ.get("K54B_SF_DIR", "/root/testdata/sf0.1")
REPS = 2


def dup_heavy_corpus(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    copies1 = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.lit("mirror-a").alias("source"),
        "text",
    )
    copies2 = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 60_000_000).alias("doc_id"),
        F.lit("mirror-b").alias("source"),
        "text",
    )
    return d.unionByName(copies1).unionByName(copies2).localCheckpoint()


def main() -> None:
    spark = get_spark("gdm-k54b-dupheavy")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = dup_heavy_corpus(spark)
    n = corpus.count()
    n_dup = n - corpus.select("text").distinct().count()
    print(f"corpus rows={n}, exact-dup rows={n_dup} ({n_dup / n:.1%})")

    def run(fn):
        fn(corpus).write.format("noop").mode("overwrite").save()

    kernels = {"k54_assign": _k54_assign, "k54b_assign": _k54b_assign}
    for name, fn in kernels.items():  # warm pass
        run(fn)
    best = {name: float("inf") for name in kernels}
    for _ in range(REPS):
        for name, fn in kernels.items():
            t0 = time.perf_counter()
            run(fn)
            best[name] = min(best[name], time.perf_counter() - t0)
    # sanity: both must produce the SAME doc->split assignment
    a = _k54_assign(corpus).select("doc_id", "split")
    b = _k54b_assign(corpus).select("doc_id", "split")
    mismatch = a.join(b, "doc_id").filter(a.split != b.split).count()
    out = {
        "corpus_rows": n,
        "exact_dup_rows": n_dup,
        "dup_fraction": round(n_dup / n, 3),
        "k54_sec": round(best["k54_assign"], 3),
        "k54b_sec": round(best["k54b_assign"], 3),
        "split_mismatches": mismatch,
    }
    tag = os.path.basename(SF_DIR.rstrip("/"))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"k54b_dupheavy_{tag}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
