"""Skew-stress demonstration: measure a power-law-skewed join with and
without mitigation, and verify the mitigated plans return identical
results (BASELINE.json's 100 TB discipline, made measurable).

Synthesizes a fact table where ONE key owns half the rows (the
power-law user / null-ish default-key case), joins it to a dim that is
forced out of broadcast range, and compares:

  sortmerge        — plain sort-merge join, AQE skew splitting OFF
                     (the straggler baseline: one task gets half the rows)
  aqe_skew         — AQE skew-join splitting ON (Spark's built-in fix)
  salted           — operators/skew.salted_join (the explicit fix that
                     also works where AQE can't see the skew)

Usage: python tools/skew_stress.py [n_rows] [reps]
Prints one JSON line; the three modes must agree on the probe result.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from quack_reduce_spark.operators.skew import salted_join  # noqa: E402
from quack_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("skew-stress")

    # fact: half the rows hit key 0, the rest spread over 10k keys
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("key"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("key"), F.md5(F.col("id").cast("string")).alias("label")
    )

    def agg(df):
        return df.groupBy("label").agg(F.sum("v").alias("sv")).count()

    # demo-scale AQE thresholds: the default skew trigger is 256 MB per
    # partition — at stress-tool scale the hot partition is a few MB, so
    # the thresholds are lowered proportionally to show the mechanism
    # (at 100 TB the defaults fire on their own)
    _AQE_DEMO = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }

    def with_conf(skew_on: bool, fn):
        keys = ["spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.skewJoin.enabled"] + list(_AQE_DEMO)
        prior = {k: spark.conf.get(k, None) for k in keys}
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        if skew_on:
            for k, v in _AQE_DEMO.items():
                spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in prior.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    modes = {
        "sortmerge": lambda: with_conf(False, lambda: agg(fact.join(dim, "key"))),
        "aqe_skew": lambda: with_conf(True, lambda: agg(fact.join(dim, "key"))),
        "salted": lambda: with_conf(
            False, lambda: agg(salted_join(fact, dim, on="key", salt_buckets=16))
        ),
    }
    out, probe = {}, {}
    for name, fn in modes.items():
        probe[name] = fn()  # warmup + correctness probe
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        out[name] = {
            "mean_sec": round(statistics.mean(times), 3),
            "std_sec": round(statistics.pstdev(times), 3),
        }
    assert len(set(probe.values())) == 1, f"modes disagree: {probe}"
    out["groups"] = probe["sortmerge"]
    out["n_rows"] = n_rows
    out["hot_key_fraction"] = 0.5
    print(json.dumps(out))


if __name__ == "__main__":
    main()
