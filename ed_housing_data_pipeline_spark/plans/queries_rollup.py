"""Continuous-aggregate (incremental rollup) query family.

The production pattern these register: a per-(priority, month) revenue
rollup over the orders fact stream is maintained INCREMENTALLY — facts
arrive in time order, each ingest commits one O(batch)
partial-aggregate segment (operators/rollup over the segmented-commit
protocol), and serving merges partial states instead of re-scanning
facts. The time-ordered ingest gives every segment a narrow month
range, so a month-window read chunk-excludes whole segments from
driver-side manifest metadata (lake.zone_pruned_pins) before any job
is scheduled.

Both queries are fully hash-checked: the DuckDB twin aggregates the
raw facts directly, so bootstrap → append → append → merge-on-read
(and the zonemap-pruned range read) must reproduce the direct GROUP BY
to the rounded digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import rollup
from ed_housing_data_pipeline_spark.plans._base import t
from ed_housing_data_pipeline_spark.plans._caches import _audit, _session_mismatch
from ed_housing_data_pipeline_spark.plans.registry import register
from ed_housing_data_pipeline_spark.sources import lake

ROLLUP_KEYS = ["priority", "month"]
ROLLUP_MEASURES = {"price": "o_totalprice"}
# time-ordered ingest batches (the hypertable shape): bootstrap holds
# history ≤1996, then two later-year appends — so segments carry
# disjoint month ranges and window reads prune
ROLLUP_CUTS = (1996, 1998)
RANGE_LO, RANGE_HI = "1998-01", "1998-12"

_ROLLUP_DIR: dict[tuple[str], object] = {}
_ROLLUP_FRAMES: dict[tuple[str], tuple] = {}


def _orders_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with the view's group keys attached: priority plus the
    'yyyy-MM' month bucket (string form — lexicographic order is
    chronological, which is what lets the zonemap compare it)."""
    return t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_totalprice",
        F.year("o_orderdate").alias("_yr"),
    )


def _ensure_rollup(spark: SparkSession, sf_dir: str) -> None:
    """Build the persisted rollup once per sf_dir per session:
    bootstrap on facts through ROLLUP_CUTS[0] (NULL-dated facts ride
    with the bootstrap so no row is orphaned), then one O(batch)
    append per later period. Under AUDIT_LAZY_PLANS with no built
    view, callers take the lazy-expression path instead."""
    key = (sf_dir,)
    tmp = _ROLLUP_DIR.get(key)
    if tmp is None:
        import tempfile  # noqa: PLC0415

        tmp = tempfile.TemporaryDirectory(prefix="orders_rollup_")
        facts = _orders_keyed(spark, sf_dir)
        lo = ROLLUP_CUTS[0]
        rollup.bootstrap_rollup(
            spark,
            tmp.name,
            facts.filter((F.col("_yr") <= lo) | F.col("_yr").isNull()),
            ROLLUP_KEYS,
            ROLLUP_MEASURES,
            zone_keys=["month"],
        )
        for a, b in zip(ROLLUP_CUTS, [*ROLLUP_CUTS[1:], None]):
            batch = facts.filter(F.col("_yr") > a)
            if b is not None:
                batch = batch.filter(F.col("_yr") <= b)
            rollup.append_rollup_batch(
                spark, tmp.name, batch
            )
        # memoize only after the last manifest commit (a failed build
        # must not leave a memo pointing at an unreadable view)
        _ROLLUP_DIR[key] = tmp


def _rollup_frame(
    spark: SparkSession, sf_dir: str, lo: str | None = None, hi: str | None = None
) -> DataFrame:
    """The merged view (optionally month-windowed through the
    zonemap-pruned scan). Audit mode with no built view serves the
    lazy merge-over-partials expression so plan construction schedules
    no job while showing the real merge shape."""
    key = (sf_dir,)
    if _audit() and _ROLLUP_DIR.get(key) is None:
        parts = rollup.partial_rollup(
            _orders_keyed(spark, sf_dir), ROLLUP_KEYS, ROLLUP_MEASURES
        )
        if lo is not None:
            parts = parts.filter(F.col("month").between(lo, hi))
        return rollup.merge_rollup(parts, ROLLUP_KEYS, ROLLUP_MEASURES)
    _ensure_rollup(spark, sf_dir)
    tmp = _ROLLUP_DIR[key]
    cache_key = (lo, hi)
    hit = _ROLLUP_FRAMES.get((key, cache_key))
    if hit is not None and not _session_mismatch(hit, spark):
        return hit
    if lo is None:
        out = rollup.read_rollup(spark, tmp.name, derive_avg=False)
    else:
        out = rollup.read_rollup_range(
            spark, tmp.name, "month", lo=lo, hi=hi, derive_avg=False
        )
    _ROLLUP_FRAMES[(key, cache_key)] = out
    return out


def _export(view: DataFrame) -> DataFrame:
    return view.select(
        "priority",
        "month",
        F.col("_rows").alias("n_orders"),
        F.round("price_sum", 2).alias("price_sum"),
        F.col("price_cnt").cast("bigint").alias("price_cnt"),
        F.round("price_min", 2).alias("price_min"),
        F.round("price_max", 2).alias("price_max"),
        F.round(F.col("price_sum") / F.col("price_cnt"), 2).alias("price_avg"),
    )


_ROLLUP_SELECT = """
SELECT o_orderpriority AS priority,
       strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS price_sum,
       CAST(COUNT(o_totalprice) AS BIGINT) AS price_cnt,
       ROUND(MIN(o_totalprice), 2) AS price_min,
       ROUND(MAX(o_totalprice), 2) AS price_max,
       ROUND(SUM(o_totalprice) / COUNT(o_totalprice), 2) AS price_avg
FROM orders
"""


@register(
    "orders_incremental_rollup",
    oracle=_ROLLUP_SELECT + "GROUP BY 1, 2",
)
def q_orders_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The served continuous aggregate: merge of the view's partial
    segments (sum/count/min/max fold; avg derived from merged state) —
    committed by one bootstrap plus two O(batch) time-ordered appends,
    never by re-scanning accumulated facts. The DuckDB twin aggregates
    the raw fact table directly, so the entire incremental lifecycle
    is value-checked, not rows-only. Protocol/crash/pruning contracts:
    tests/test_rollup.py."""
    return _export(_rollup_frame(spark, sf_dir))


@register(
    "orders_stream_rollup",
    oracle=_ROLLUP_SELECT + "GROUP BY 1, 2",
)
def q_orders_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL streaming continuous-aggregate loop as a registered,
    oracle-checked query: bootstrap pins the spec + pre-1997 history,
    the later facts arrive AS A STREAM through the transactional
    foreachBatch sink (streaming/rollups.py — micro-batch id committed
    in the same manifest flip as the batch's partial segment, so
    replays are exactly-once without fact ids), and the served merge
    must reproduce DuckDB's direct GROUP BY over the raw fact table.
    Replay/restart contracts: tests/test_streaming_rollups.py."""
    import tempfile  # noqa: PLC0415

    from ed_housing_data_pipeline_spark.streaming import (  # noqa: PLC0415
        rollups as sr,
    )

    facts = _orders_keyed(spark, sf_dir)
    if _audit():  # job-free plan: the lazy merged-view expression
        return _export(
            rollup.merge_rollup(
                rollup.partial_rollup(facts, ROLLUP_KEYS, ROLLUP_MEASURES),
                ROLLUP_KEYS,
                ROLLUP_MEASURES,
            )
        )
    from ed_housing_data_pipeline_spark.plans import _caches  # noqa: PLC0415

    lo = ROLLUP_CUTS[0]
    with tempfile.TemporaryDirectory(prefix="stream_rollup_") as tmp:
        root = f"{tmp}/view"
        # session-built base (spec blob + pre-1997 history bootstrap),
        # copied per run; the streamed fact commits under test run the
        # production sink path on the copy (r16 VERDICT #5)
        _caches.clone_stream_base(
            sf_dir,
            "stream_rollup",
            lambda base: rollup.bootstrap_rollup(
                spark,
                base,
                facts.filter((F.col("_yr") <= lo) | F.col("_yr").isNull()),
                ROLLUP_KEYS,
                ROLLUP_MEASURES,
                zone_keys=["month"],
            ),
            root,
        )
        schema = t(spark, sf_dir, "orders").schema
        # glob form: FileStreamSource needs a directory basePath (the
        # events/documents stream sources use the same trick)
        stream = (
            spark.readStream.schema(schema)
            .parquet(f"{sf_dir}/orders.parque[t]")
            .filter(F.year("o_orderdate") > lo)
            .select(
                F.col("o_orderpriority").alias("priority"),
                F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                "o_totalprice",
            )
        )
        sr.run_stream_rollup(stream, root, f"{tmp}/ckpt")
        out = _export(rollup.read_rollup(spark, root, derive_avg=False))
        # the tempdir dies with the context manager: materialize the
        # small aggregate before the backing files vanish
        return out.localCheckpoint(eager=True)


@register(
    "orders_rollup_month_range",
    oracle=_ROLLUP_SELECT
    + f"WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '{RANGE_LO}' AND '{RANGE_HI}'\n"
    + "GROUP BY 1, 2",
)
def q_orders_rollup_month_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A month-window read of the same view through zonemap chunk
    exclusion: the manifest's per-segment month ranges (disjoint, by
    time-ordered ingest) prune non-intersecting segments on the driver
    before any job — at 100 TB this is the difference between reading
    one month's segments and scanning a years-deep rollup.
    tests/test_queries_rollup.py asserts the pruning actually dropped
    segments for this window; the oracle pins the values."""
    return _export(_rollup_frame(spark, sf_dir, lo=RANGE_LO, hi=RANGE_HI))


RETRACT_MOD = 53  # facts with o_orderkey % 53 == 0 get retracted (~2%)

_ROLLUP_RETRACT_DIR: dict[tuple[str], object] = {}


def _ensure_retracted_rollup(spark: SparkSession, sf_dir: str) -> str:
    """A second session view exercising the correction path: the same
    bootstrap + two appends, then ONE retract_rollup_batch commit
    negating every fact with o_orderkey ≡ 0 (mod RETRACT_MOD). Kept
    separate from _ensure_rollup so the no-retraction queries stay
    byte-stable."""
    key = (sf_dir,)
    tmp = _ROLLUP_RETRACT_DIR.get(key)
    if tmp is None:
        import tempfile  # noqa: PLC0415

        tmp = tempfile.TemporaryDirectory(prefix="orders_rollup_retract_")
        facts = t(spark, sf_dir, "orders").select(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_totalprice",
            F.year("o_orderdate").alias("_yr"),
            "o_orderkey",
        )
        lo = ROLLUP_CUTS[0]
        rollup.bootstrap_rollup(
            spark,
            tmp.name,
            facts.filter((F.col("_yr") <= lo) | F.col("_yr").isNull()).drop(
                "o_orderkey"
            ),
            ROLLUP_KEYS,
            ROLLUP_MEASURES,
            zone_keys=["month"],
        )
        for a, b in zip(ROLLUP_CUTS, [*ROLLUP_CUTS[1:], None]):
            batch = facts.filter(F.col("_yr") > a)
            if b is not None:
                batch = batch.filter(F.col("_yr") <= b)
            rollup.append_rollup_batch(
                spark, tmp.name, batch.drop("o_orderkey")
            )
        rollup.retract_rollup_batch(
            spark,
            tmp.name,
            facts.filter(F.col("o_orderkey") % RETRACT_MOD == 0).drop(
                "o_orderkey"
            ),
            # the corrected fact source: min/max stay EXACT — dirty
            # groups (retracted extreme ties the served extreme) get
            # re-aggregated override rows in the same commit
            remaining_facts=facts.filter(
                F.col("o_orderkey") % RETRACT_MOD != 0
            ).drop("o_orderkey"),
        )
        _ROLLUP_RETRACT_DIR[key] = tmp
    return _ROLLUP_RETRACT_DIR[key].name


@register(
    "orders_rollup_after_retraction",
    oracle="""
SELECT o_orderpriority AS priority,
       strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS price_sum,
       CAST(COUNT(o_totalprice) AS BIGINT) AS price_cnt,
       CAST(ROUND(ROUND(ROUND(SUM(o_totalprice), 2) * 100)
                  / COUNT(o_totalprice)) AS BIGINT) AS price_avg_cents,
       MIN(o_totalprice) AS price_min,
       MAX(o_totalprice) AS price_max
FROM orders
WHERE o_orderkey % 53 <> 0
GROUP BY 1, 2
""",
)
def q_orders_rollup_after_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The served view after a fact CORRECTION (rollup.
    retract_rollup_batch): ~2% of ingested facts are retracted by one
    O(retraction) commit appending a NEGATED partial segment — the
    merge's additive fold cancels their contribution exactly and
    fully-retracted groups drop out, with committed segments never
    rewritten. The retraction passes ``remaining_facts``, so the
    commit re-aggregates the dirty groups' min/max and appends them as
    reset override rows — the oracle aggregates the raw facts minus
    the retracted keys directly and value-checks counts, sums, the
    derived avg, AND the EXACT extremes (``price_min``/``price_max``).
    The backfill/mis-ingest repair path a year-deep 100 TB continuous
    aggregate cannot afford to rebuild for."""
    key = (sf_dir,)
    if _audit() and _ROLLUP_RETRACT_DIR.get(key) is None:
        facts = t(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % RETRACT_MOD != 0
        ).select(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_totalprice",
        )
        view = rollup.merge_rollup(
            rollup.partial_rollup(facts, ROLLUP_KEYS, ROLLUP_MEASURES),
            ROLLUP_KEYS,
            ROLLUP_MEASURES,
        )
    else:
        root = _ensure_retracted_rollup(spark, sf_dir)
        view = rollup.read_rollup(spark, root, derive_avg=False)
    # avg emits in integer CENTS derived from the rounded sum: the raw
    # double sums differ at ~1e-9 between merge-minus-retraction and
    # the oracle's direct aggregation, and a 2-decimal round of the
    # quotient can flip at an exact half-cent boundary where the two
    # engines' scaling algorithms diverge by 1 ulp. The rounded sum is
    # bit-identical across engines (checked by price_sum), cents are
    # then exact integers, and the only remaining half-case (quotient
    # exactly k.5) is exactly representable — both engines round it
    # away from zero.
    cents = F.round(F.round("price_sum", 2) * 100)
    return view.select(
        "priority",
        "month",
        F.col("_rows").alias("n_orders"),
        F.round("price_sum", 2).alias("price_sum"),
        F.col("price_cnt").cast("bigint").alias("price_cnt"),
        F.round(cents / F.col("price_cnt"))
        .cast("bigint")
        .alias("price_avg_cents"),
        # exact extremes through the retraction: stored doubles pass
        # through min/max folds unchanged on both engines — no rounding
        "price_min",
        "price_max",
    )


# --------------------------- incremental HLL sketch maintenance
# The sketch × rollup composition: an HLL register table IS rollup
# state — (group, register) keyed, merged by MAX — so the continuous-
# aggregate machinery maintains a distinct-count sketch incrementally
# with zero new protocol surface. Each ingest batch appends its
# O(batch) partial register maxima; serving folds registers and
# derives the estimate; history is never re-hashed.
HLL_ROLLUP_KEYS = ["bucket_s", "reg"]
HLL_ROLLUP_MEASURES = {"rho": "rho"}

_HLL_ROLLUP_DIR: dict[tuple[str], object] = {}


def _events_hll_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ed_housing_data_pipeline_spark.functions import (  # noqa: PLC0415
        sketches as sk,
    )
    from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
        hash60,
    )
    from ed_housing_data_pipeline_spark.plans._base import (  # noqa: PLC0415
        events_ts,
    )

    ev = events_ts(spark, sf_dir).filter(F.col("user_id").isNotNull())
    h = hash60(F.col("user_id").cast("string"))
    return ev.select(
        F.unix_seconds(F.date_trunc("day", F.col("ts"))).alias("bucket_s"),
        F.dayofmonth(F.col("ts")).alias("_dom"),
        sk.hll_register(h).alias("reg"),
        sk.hll_rho(h).alias("rho"),
    )


def _ensure_hll_rollup(spark: SparkSession, sf_dir: str) -> str:
    key = (sf_dir,)
    tmp = _HLL_ROLLUP_DIR.get(key)
    if tmp is None:
        import tempfile  # noqa: PLC0415

        tmp = tempfile.TemporaryDirectory(prefix="events_hll_rollup_")
        facts = _events_hll_facts(spark, sf_dir)
        rollup.bootstrap_rollup(
            spark,
            tmp.name,
            facts.filter((F.col("_dom") <= 10) | F.col("_dom").isNull()),
            HLL_ROLLUP_KEYS,
            HLL_ROLLUP_MEASURES,
            zone_keys=["bucket_s"],
        )
        for lo, hi in ((10, 20), (20, None)):
            batch = facts.filter(F.col("_dom") > lo)
            if hi is not None:
                batch = batch.filter(F.col("_dom") <= hi)
            rollup.append_rollup_batch(
                spark, tmp.name, batch
            )
        _HLL_ROLLUP_DIR[key] = tmp
    return _HLL_ROLLUP_DIR[key].name


def _hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    from ed_housing_data_pipeline_spark.functions import (  # noqa: PLC0415
        sketches as sk,
    )

    stats = regs.groupBy("bucket_s").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(sk.hll_indicator_term(F.col("rho_max"))).alias("sum_scaled"),
    )
    return stats.select(
        "bucket_s",
        F.round(
            sk.hll_estimate(F.col("n_present"), F.col("sum_scaled")), 4
        ).alias("hll_users"),
    )


def _hll_rollup_oracle() -> str:
    from ed_housing_data_pipeline_spark.functions import (  # noqa: PLC0415
        sketches as sk,
    )
    from ed_housing_data_pipeline_spark.plans._base import (  # noqa: PLC0415
        hash60_sql,
    )

    chain = sk.hll_sql("bucket_s", "hv", "src")
    return f"""
WITH src AS (
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_s,
           {hash60_sql("CAST(user_id AS VARCHAR)")} AS hv
    FROM events WHERE user_id IS NOT NULL
),{chain}
SELECT grp AS bucket_s, ROUND(hll_est, 4) AS hll_users FROM hll
"""


@register("events_hll_rollup", oracle=_hll_rollup_oracle())
def q_events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-MAINTAINED daily distinct-user sketch: the HLL
    register table rides the continuous-rollup protocol as plain
    (bucket, register)-keyed max-state — bootstrap on the first third
    of the month, two O(batch) appends for the rest — and serving
    merges register maxima across partial segments before deriving
    the Flajolet estimate. Because the register algebra is the
    cross-engine-deterministic construction (functions/sketches.py),
    the DuckDB twin recomputes the identical estimate from the raw
    events, pinning the whole incremental lifecycle: batch hashing,
    partial max-state commits, merge-on-read fold, and the estimator.
    The one-shot sibling events_hll_daily_users carries the exact
    count alongside for the accuracy trade; this one is the
    production shape — history is never re-hashed."""
    root = _ensure_hll_rollup_or_lazy(spark, sf_dir)
    if isinstance(root, DataFrame):  # audit mode: lazy expression
        return _hll_estimate_from_registers(root)
    view = rollup.read_rollup(spark, root, derive_avg=False)
    return _hll_estimate_from_registers(view.select("bucket_s", "reg", "rho_max"))


def _ensure_hll_rollup_or_lazy(spark: SparkSession, sf_dir: str):
    """Audit mode with no built view: the lazy merged register table
    (no filesystem, no job at plan-build). Otherwise the built view's
    root path."""
    if _audit() and _HLL_ROLLUP_DIR.get((sf_dir,)) is None:
        facts = _events_hll_facts(spark, sf_dir)
        parts = rollup.partial_rollup(facts, HLL_ROLLUP_KEYS, HLL_ROLLUP_MEASURES)
        return rollup.merge_rollup(
            parts, HLL_ROLLUP_KEYS, HLL_ROLLUP_MEASURES
        ).select("bucket_s", "reg", "rho_max")
    return _ensure_hll_rollup(spark, sf_dir)
