"""The main correctness gate, run locally: every registry query with an
oracle must match DuckDB on the same parquet data (same comparison the
driver performs at sf0.01)."""

from __future__ import annotations

import pytest

from lintdb_spark.queries import ORACLE, REGISTRY
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    assert name in REGISTRY, f"oracle without spark impl: {name}"
    df = REGISTRY[name](spark, sf_dir)
    ok, msg = compare(df, ORACLE[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_has_oracle_or_is_declared():
    missing = set(REGISTRY) - set(ORACLE)
    # queries without oracle get the weaker rows-only driver check;
    # keep this list explicit and small.
    assert missing == set(), f"queries missing oracle entries: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def test_verification_window_holds_current_round_queries():
    """Rotation policy guard: every query added or rotated in THIS
    round must sit inside the driver's first-50 verification window —
    an accidental registry reorder would silently launch them without
    an independent driver verdict (the r04/r05 gap the policy fixes).
    Update the list when the round rotates."""
    ks = list(REGISTRY)
    assert len(ks) >= 50
    window = set(ks[:50])
    for q in (
        # r16 churn-biased re-entries (r15 verdict item 2): the
        # operators under these four were rewritten in r15 after the
        # queries rotated out — one round back under the driver's eyes.
        "q_artifact_covered",
        "q_artifact_cost_fold",
        "q_minhash_sig",
        "q_lsh_buckets",
        # r15 NEW: SemDeDup-style cluster-scoped semantic dedup
        # (greens r15 — needs >=3).
        "q_semantic_dedup",
        # r14 NEW: substring-level exact dedup, its scrub stage, and
        # substring decontamination (greens r14, r15 — need their
        # third).
        "q_substring_dedup",
        "q_substring_scrub",
        "q_substring_decontam",
        # r13 NEW: degraded-stats fold on a cold bridged-scheme store
        # (greens r13, r14, r15 — met the bar but stays: it serves
        # through the r15-rewritten commit path). q_pii_scrub rotated
        # OUT this round (greens r13, r14, r15); q_media_frames /
        # q_doc_chunks / q_len_histogram rotated OUT (ten greens each).
        "q_artifact_remote_fold",
        # (the r11 trio q_artifact_fold/_fold_remove/_minor rotated
        # OUT in r14: greens r11, r12, r13 met the >=3 bar; the three
        # r14 queries fill exactly those slots — q_media_frames and
        # q_artifact_flush stay in the tail.)
        # (the r09 trio q_artifact_tenant/_drift/_remove rotated OUT
        # in r12: greens r09, r10, r11 met the >=3 bar; r08's
        # q_artifact_verified / q_artifact_gate rotated OUT in r11:
        # greens r08, r09, r10.)
        # r07 NEW: verified-pair-fed clustering twins + simhash
        # near-dup pairs, each now with one driver green (r07).
        "q_dup_clusters_verified",
        "q_dedup_keep_verified",
        "q_simhash_neardup",
        # r06 rotations-in still in the window (q_doc_chunks and
        # q_len_histogram rotated OUT r16 with ten greens each).
        "q_cross_dedup",
        "q_events_props",
        "q_jaccard_verified",
    ):
        assert q in window, f"{q} fell out of the driver's first-50 window"
