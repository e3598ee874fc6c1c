from __future__ import annotations

from pyspark.sql import functions as F

from lintdb_spark.operators.skew import salted_sum_count


def test_salted_aggregate_matches_plain(spark, sf_dir):
    """Salted two-phase sum/count must equal the direct aggregate —
    on the events table with a synthetic hot key (90% of rows mapped
    to user_id 0)."""
    from lintdb_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_id", F.when(F.col("event_id") % 10 < 9, F.lit(0)).otherwise(F.col("user_id"))
    )
    salted = {
        r["user_id"]: (round(r["total"], 6), r["n"])
        for r in salted_sum_count(ev, ["user_id"], "value").collect()
    }
    plain = {
        r["user_id"]: (round(r["total"], 6), r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert abs(salted[k][0] - plain[k][0]) < 1e-4  # float re-association
