"""Round-4 scale gates (VERDICT r03 directives 1+2).

1. The index df-cap must broadcast the tiny HOT-token list into a left-anti
   join — never the O(vocabulary) keep list (plan-shape asserted on the
   explain string, output pinned against the keep-list formula).
2. The pipeline's broadcast joins are gated; the salted/shuffle fallback
   (`broadcast_mode="never"`) must produce byte-identical triples through
   the FULL pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.operators import probe
from mannheimsearchjoinsengine_spark.operators.fuse import fuse_long
from mannheimsearchjoinsengine_spark.operators.index import build_postings
from mannheimsearchjoinsengine_spark.plans.adaptive import (
    broadcast_threshold_bytes,
    fits_broadcast,
)
from mannheimsearchjoinsengine_spark.plans.pipeline import run_pipeline
from mannheimsearchjoinsengine_spark.sources.transcripts import load_transcripts
from mannheimsearchjoinsengine_spark.operators.extract import (
    extract_facts,
    extract_mentions,
)


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


# --- directive 1: hot-side broadcast in the index df-cap ---------------------


def test_index_dfcap_plan_broadcasts_hot_side(spark, sf_dir):
    facts = extract_facts(load_transcripts(spark, sf_dir))
    plan = build_postings(facts, df_cap=0.5)._jdf.queryExecution().optimizedPlan().toString()
    # the df-cap filter must be an ANTI join (against the bounded hot list),
    # not an inner join against the O(vocabulary) keep list
    assert "LeftAnti" in plan, plan
    inner_token_joins = [
        ln for ln in plan.splitlines() if "Join Inner" in ln and "token" in ln
    ]
    assert not inner_token_joins, inner_token_joins


def test_index_dfcap_output_matches_keep_list_formula(spark):
    # 4 labels; token 'the' in 3/4 labels (> floor(0.5*4)+1 = 3? no: 3 <= 3
    # keeps it), token 'x' in all 4 (> 3 → dropped)
    rows = [
        ("x the alpha", 1), ("x the beta", 1), ("x the gamma", 2), ("x delta", 2),
    ]
    facts = spark.createDataFrame(rows, ["subj_norm", "conv_id"])
    got = build_postings(facts, df_cap=0.5)
    toks = {r.token for r in got.select("token").distinct().collect()}
    assert "x" not in toks  # df 4 > floor(0.5*4)+1 = 3 → hot, dropped
    assert "the" in toks  # df 3 <= 3 → kept
    assert {"alpha", "beta", "gamma", "delta"} <= toks
    # exact equivalence with the old keep-list formulation
    no_cap = build_postings(facts, df_cap=None)
    df_tok = no_cap.groupBy("token").agg(
        F.countDistinct("subj_norm").alias("df_labels")
    )
    keep = df_tok.filter(F.col("df_labels") <= 3).select("token")
    expected = no_cap.join(keep, "token")
    assert _rows(got) == _rows(expected)


# --- directive 2: gated broadcasts + salted full-pipeline equivalence --------


def test_threshold_parsing(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want in [("10485760b", 10485760), ("10MB", 10 * 1 << 20), ("-1", -1)]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert broadcast_threshold_bytes(spark) == want, raw
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
        assert fits_broadcast(spark, 100)
        assert not fits_broadcast(spark, 10_000_000)
        assert not fits_broadcast(spark, None)  # no measurement → shuffle path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert not fits_broadcast(spark, 1)  # broadcast disabled
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_join_results_salted_equivalence(spark, sf_dir):
    t = load_transcripts(spark, sf_dir)
    m, f = extract_mentions(t).localCheckpoint(), extract_facts(t).localCheckpoint()
    a = probe.join_results(m, f)
    b = probe.join_results(m, f, salted=True, n_salts=7)
    assert _rows(a) == _rows(b)


def test_fuse_long_salted_equivalence(spark, sf_dir):
    t = load_transcripts(spark, sf_dir)
    m, f = extract_mentions(t).localCheckpoint(), extract_facts(t).localCheckpoint()
    a = fuse_long(m, f)
    b = fuse_long(m, f, salted=True, n_salts=7)
    assert _rows(a) == _rows(b)


def test_pipeline_salted_branch_identical_triples(spark, sf_dir):
    """Full pipeline through the web-scale (no-broadcast, salted) branch ==
    the broadcast branch, byte-identical triples (VERDICT r03 #2 'Done')."""
    cols = ["subj", "pred", "obj", "obj_dtype"]
    forced = run_pipeline(spark, sf_dir, broadcast_mode="force")["triples"]
    never = run_pipeline(spark, sf_dir, broadcast_mode="never")["triples"]
    assert _rows(forced, cols) == _rows(never, cols)


def test_pipeline_auto_gate_uses_measured_rows(spark, sf_dir):
    """auto == force at test scale (everything fits); and with the
    threshold floored, auto must flip to the salted branch and still
    produce identical triples."""
    cols = ["subj", "pred", "obj", "obj_dtype"]
    base = _rows(run_pipeline(spark, sf_dir, broadcast_mode="force")["triples"], cols)
    auto = _rows(run_pipeline(spark, sf_dir)["triples"], cols)
    assert auto == base
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        flipped = _rows(run_pipeline(spark, sf_dir)["triples"], cols)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert flipped == base


# --- round-5 (VERDICT r04 #5): call-site gates on probe/join_results +
# --- row_density's kept-list broadcast ---------------------------------------


def test_probe_default_gate_flips_to_salted(spark, sf_dir):
    """probe()'s default salted=None measures the exploded query side: with
    the threshold floored the gate must pick the salted branch (salt key in
    the optimized plan, zero forced broadcast hints) and the output must
    equal the explicit-broadcast branch."""
    t = load_transcripts(spark, sf_dir)
    m, f = extract_mentions(t).localCheckpoint(), extract_facts(t).localCheckpoint()
    p = build_postings(f).localCheckpoint()
    base = _rows(probe.probe(m, p, salted=False))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64b")
        gated = probe.probe(m, p)
        plan = gated._jdf.queryExecution().optimizedPlan().toString()
        assert "salt" in plan, plan
        assert plan.count("strategy=broadcast") == 0, plan
        rows = _rows(gated)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert rows == base
    # at test scale under the real threshold the gate picks broadcast
    plan = probe.probe(m, p)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("strategy=broadcast") >= 1, plan


def test_join_results_default_gate_flips_to_salted(spark, sf_dir):
    t = load_transcripts(spark, sf_dir)
    m, f = extract_mentions(t).localCheckpoint(), extract_facts(t).localCheckpoint()
    base = _rows(probe.join_results(m, f, salted=False))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64b")
        gated = probe.join_results(m, f)
        plan = gated._jdf.queryExecution().optimizedPlan().toString()
        assert "salt" in plan, plan
        rows = _rows(gated)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert rows == base


def test_row_density_gated_kept_broadcast(spark):
    from mannheimsearchjoinsengine_spark.operators.fuse import row_density

    fused = spark.createDataFrame(
        [(f"s{i}", f"p{i % 3}", "v") for i in range(30)],
        ["query_norm", "pred_raw", "obj_raw"],
    )
    hinted = row_density(fused, broadcast_kept=True)
    unhinted = row_density(fused, broadcast_kept=False)
    n_hint = hinted._jdf.queryExecution().optimizedPlan().toString().count(
        "strategy=broadcast"
    )
    n_nohint = unhinted._jdf.queryExecution().optimizedPlan().toString().count(
        "strategy=broadcast"
    )
    # exactly the kept-list hint disappears; the 1-row scalar broadcasts stay
    assert n_hint == n_nohint + 1, (n_hint, n_nohint)
    assert _rows(hinted) == _rows(unhinted)
    # the measured default gate (None) resolves to the broadcast branch at
    # this scale and floors to the unhinted branch under a 0-byte threshold.
    # (the gate's localCheckpoint collapses column_density's subtree, so
    # hint counts are compared between the two GATED plans, not vs above)
    gated_normal = row_density(fused)
    n_normal = gated_normal._jdf.queryExecution().optimizedPlan().toString().count(
        "strategy=broadcast"
    )
    assert _rows(gated_normal) == _rows(hinted)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        floored = row_density(fused)
        n_floored = floored._jdf.queryExecution().optimizedPlan().toString().count(
            "strategy=broadcast"
        )
        # exactly the kept-list hint disappears under the floored threshold
        assert n_floored == n_normal - 1, (n_floored, n_normal)
        assert _rows(floored) == _rows(hinted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
