"""Round-12 additions: the generalized fixed-dp-round policy sweep and
cross-engine semantics tests for the exact-ppm publication helpers
(functions/exact.py).

THE POLICY (BASELINE.md, generalizing r11's
test_no_2dp_round_on_product_scale_decimal_sums): a fixed-dp round may
only be published when its operand carries an irrational factor (sqrt /
pow / log / exp — half-way cases have measure zero) or when BOTH
engines provably round the IDENTICAL IEEE double (same generated
expression over the same exact inputs). A ratio of integer-typed or
exact-decimal aggregates is an exact rational: round(n/m, d) ties
exactly whenever m's reduced denominator is 2^(d+1)·5^j, and there
Spark's BigDecimal HALF_UP and DuckDB's double round() split by one
ulp. Such ratios must be published as exact integer ppm
(functions/exact.py::ratio_ppm) instead.
"""

import importlib.util
import re

import duckdb
import pytest
from pyspark.sql import functions as F

spec = importlib.util.spec_from_file_location(
    "entry", "/root/repo/__spark_entry__.py"
)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)


# Operands containing these substrings carry an irrational factor —
# half-way cases have measure zero and fixed-dp rounds are legal.
_IRRATIONAL_MARKERS = (
    "sqrt",
    "power",
    "pow(",
    "exp(",
    "ln(",
    "log",
    "stddev",
    "corr(",
    "var_samp",
    "var_pop",
    "sin(",
    "cos(",
    "pi(",
)

# Queries whose surviving round-over-division is justified — each entry
# documents WHY the operand is not in the exact-rational-tie class.
# Removing a ppm migration elsewhere makes that query reappear here
# un-allowlisted and the sweep go red (red-on-revert).
_ALLOWLIST = {
    # Sums are cast to DOUBLE before the formula; both engines then
    # evaluate the identical IEEE expression and round the SAME double
    # — not the exact-rational-vs-double split (validated at three
    # scales; the boundary audit covers the gate scales).
    "agg_linreg": "identical-double-path regression formula",
    "agg_skew_kurtosis": "identical-double-path moment formula",
    # quality_score is a double composite evaluated from the same
    # generated expression on both engines; exact thresholding uses
    # the integer twin functions/text.py::quality_ppm instead.
    "dedup_canonical": "identical-double-path quality composite",
    "pipeline_corpus_clean": "identical-double-path quality composite",
    "pipeline_curation_funnel": "identical-double-path quality composite",
    "pipeline_curriculum": "identical-double-path quality composite",
    "pipeline_dataset_card": "identical-double-path quality composite",
    "pipeline_near_dedup_keep": "identical-double-path quality composite",
    "pipeline_training_mix": "identical-double-path quality composite",
    "sample_token_budget": "identical-double-path quality composite",
    "text_stats": "identical-double-path quality composite",
    # scale = max|x|/127 and x/scale run in double identically on both
    # engines; both round() tie rules are away-from-zero on doubles.
    "emb_quantize_int8": "identical-double-path quantizer",
    # Σprice/7: a reduced denominator of 7·10^k can never equal the
    # 2^(d+1)·5^j tie form — no 2dp half-way case exists.
    "h17_small_qty": "denominator 7 cannot tie at any fixed dp",
    # um/1e6 of an integer is an EXACT 6-decimal value; round(,6) is
    # the identity on it.
    "h2_min_cost": "exact micro-unit scaling, round is identity",
    # The oracle runs the SAME generated SQL string as the Spark side
    # (lag-chain dyadic truncation) — identical doubles by
    # construction.
    "ts_ewma": "oracle runs the identical generated expression",
}


def _round_args(sql):
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        i = m.end()
        depth, j = 1, i
        while depth and j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        yield sql[i : j - 1]


def test_no_fixed_dp_round_over_rational_ratio():
    """Generalized numeric-policy sweep: every oracle's round() whose
    operand contains a division must either carry an irrational factor
    or be allowlisted with a written justification. New integer-ratio
    publications must use functions/exact.py::ratio_ppm — reverting
    any ppm migration (evt_markov, gopher, ttr, jaccard family, …)
    re-introduces a bare round-over-ratio here and goes red."""
    offenders = []
    for name, sql in entry.oracle_sql().items():
        for arg in _round_args(sql):
            low = arg.lower()
            if "/" not in arg:
                continue
            if any(k in low for k in _IRRATIONAL_MARKERS):
                continue
            if name in _ALLOWLIST:
                continue
            offenders.append((name, " ".join(arg.split())[:70]))
    assert not offenders, (
        "fixed-dp round over a rational ratio (the evt_burstiness/"
        f"h7-h9 half-way class) — publish integer ppm instead: {offenders}"
    )


def test_allowlist_entries_still_needed():
    """The allowlist must not rot: every entry must still have at
    least one round-over-division in its oracle, else the entry is
    stale and should be deleted."""
    stale = []
    oracles = entry.oracle_sql()
    for name in _ALLOWLIST:
        sql = oracles.get(name)
        assert sql is not None, f"allowlisted query {name} vanished"
        live = any(
            "/" in arg
            and not any(
                k in arg.lower() for k in _IRRATIONAL_MARKERS
            )
            for arg in _round_args(sql)
        )
        if not live:
            stale.append(name)
    assert not stale, f"stale allowlist entries: {stale}"


@pytest.mark.parametrize(
    "num,den",
    [
        (1, 2_000_000),  # exact half-way ppm case
        (3, 2_000_000),
        (-7, 3),
        (7, -3),
        (2215, 3200),  # 0.6921875 — the 6dp tie the old round() hit
        (123456789012345, 9999991),
        (0, 5),
    ],
)
def test_ratio_ppm_matches_duckdb_hugeint_div(spark, num, den):
    """ratio_ppm (Spark decimal remainder identity) must equal
    DuckDB's (n·1e6) // d over HUGEINT — the oracle twin — for signs,
    half-way cases, and large magnitudes."""
    from broadway_spark.functions.exact import ratio_ppm

    got = (
        spark.createDataFrame([(num, den)], "n long, m long")
        .select(ratio_ppm(F.col("n"), F.col("m")).alias("ppm"))
        .collect()[0]["ppm"]
    )
    want = duckdb.sql(
        f"select CAST((CAST({num} AS HUGEINT) * 1000000)"
        f" // CAST({den} AS HUGEINT) AS BIGINT)"
    ).fetchone()[0]
    assert got == want


def test_div_trunc_decimal_scales(spark):
    """div_trunc is exact for scaled-decimal inputs (the winsorized /
    market-share pattern): scales cancel, truncation toward zero."""
    from broadway_spark.functions.exact import div_trunc, ratio_ppm

    df = spark.createDataFrame(
        [("12.34", "56.78"), ("-12.34", "56.78")], "a string, b string"
    ).select(
        F.col("a").cast("decimal(18,2)").alias("a"),
        F.col("b").cast("decimal(18,2)").alias("b"),
    )
    rows = df.select(
        ratio_ppm(F.col("a"), F.col("b")).alias("ppm"),
        div_trunc(F.col("a") * 1000, F.col("b")).alias("q"),
    ).collect()
    assert [r["ppm"] for r in rows] == [217330, -217330]
    assert [r["q"] for r in rows] == [217, -217]
