"""Property-based spot checks (SURVEY §5 item 4, hypothesis): the
native normalization expression vs the reference's Python regexes, and
safe_div vs exact rational arithmetic. Batched — hypothesis generates
value lists, each checked through one DataFrame pass."""

from __future__ import annotations

import os

import math
import re

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.functions.numeric import safe_div
from ed_housing_data_pipeline_spark.functions.text import normalize_join_key

# The reference's regexes, verbatim semantics (silver_to_gold.py:15-16,19-36)
_COUNTY = re.compile(r"\s+county\b", flags=re.IGNORECASE)
_STATE = re.compile(r",\s*georgia\b", flags=re.IGNORECASE)


def _reference_normalize(value):
    if value is None:
        return None
    s = str(value).strip()
    if not s:
        return None
    s = _STATE.sub("", s)
    s = _COUNTY.sub("", s)
    s = s.strip()
    return s.lower() if s else None


name_st = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Zs"), whitelist_characters=",-'"
        ),
        max_size=40,
    ),
)

suffix_st = st.sampled_from(["", " County", " county, Georgia", ", GEORGIA", " COUNTY "])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(name_st, suffix_st), min_size=1, max_size=30))
def test_normalize_matches_reference(spark, pairs):
    values = [None if base is None else base + suf for base, suf in pairs]
    df = spark.createDataFrame([(v,) for v in values], "c string")
    got = [r["out"] for r in df.select(normalize_join_key("c").alias("out")).collect()]
    expected = [_reference_normalize(v) for v in values]
    assert got == expected


finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=50))
def test_safe_div_matches_python(spark, pairs):
    df = spark.createDataFrame(pairs, "n double, d double")
    out = df.select(safe_div(F.col("n"), F.col("d"), scale=100.0).alias("r"))
    got = [r["r"] for r in out.collect()]
    for (n, d), g in zip(pairs, got):
        if d == 0.0:
            assert g is None  # never Inf/NaN
        else:
            assert g is not None and math.isclose(g, n / d * 100.0, rel_tol=1e-9)


P = (1 << 31) - 1
B = 1_000_003


def _py_hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="abc xyz", min_size=0, max_size=12),
                         max_size=8), min_size=1, max_size=10))
def test_rolling_hash_matches_python(spark, docs):
    """The native-fold rolling hash equals a pure-Python reference."""
    from ed_housing_data_pipeline_spark.plans.queries_llm import ROLL_B
    from ed_housing_data_pipeline_spark.operators.similarity import MINHASH_P

    texts = [" ".join(words) for words in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from ed_housing_data_pipeline_spark.functions.text import tokens
    from pyspark.sql import functions as F

    hashed = F.transform(
        tokens("text"),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
            F.lit(MINHASH_P),
        ),
    )
    fp = F.aggregate(
        hashed, F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * ROLL_B + x, F.lit(MINHASH_P)),
    )
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fp.alias("fp")).collect()}
    for i, text in enumerate(texts):
        toks = text.strip().split() if text.strip() else []
        acc = 0
        for tk in toks:
            acc = (acc * ROLL_B + _py_hash60(tk) % MINHASH_P) % MINHASH_P
        assert got[i] == acc, (i, text)


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.integers(min_value=-10**9, max_value=10**9),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
                    ),
                    max_size=40,
                ),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=30, deadline=None)
def test_xlsx_roundtrip_property(grid):
    """write_xlsx → read_xlsx_grid round-trips any grid: strings
    verbatim (incl. unicode), numbers as their repr text, None as
    None-padded sparse cells."""
    import tempfile
    from pathlib import Path

    from ed_housing_data_pipeline_spark.sources.xlsx import read_xlsx_grid
    from tests.conftest import write_xlsx

    width = max(len(r) for r in grid)
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "t.xlsx"
        write_xlsx(p, grid)
        got = read_xlsx_grid(str(p))
    assert len(got) == len(grid)
    for want_row, got_row in zip(grid, got):
        padded = list(want_row) + [None] * (width - len(want_row))
        for want, g in zip(padded, got_row):
            if want is None:
                assert g is None
            elif isinstance(want, str):
                assert g == want
            elif isinstance(want, int):
                assert g == repr(want)
            else:
                assert g is not None and abs(float(g) - want) <= 1e-6 * max(1.0, abs(want))


# ----------------------------- chunk-plan geometry invariants
@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=12),
)
def test_chunk_plan_geometry_invariants(spark, token_counts):
    """For ANY doc lengths: chunks tile [0, n) with stride spacing —
    starts are 0, stride, 2·stride, …; every end ≤ n; consecutive
    chunks overlap by exactly CHUNK_TOKENS-stride (except a short
    final chunk); a doc's token count is recoverable as the max end;
    zero-token docs produce no chunks."""
    from ed_housing_data_pipeline_spark.plans.queries_llm import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(token_counts)],
        "doc_id long, text string",
    )
    # reuse the registered query's expression shape on a local frame
    n = F.size(F.when(F.trim("text") == "", F.array().cast("array<string>"))
               .otherwise(F.split(F.trim("text"), r"\s+"))).cast("bigint")
    starts = F.when(n == 0, F.array().cast("array<bigint>")).otherwise(
        F.sequence(F.lit(0).cast("bigint"), n - 1, F.lit(CHUNK_STRIDE).cast("bigint"))
    )
    ex = docs.select("doc_id", n.alias("n"), F.explode(starts).alias("s"))
    rows = ex.select(
        "doc_id", "n", "s",
        F.least(F.col("s") + CHUNK_TOKENS, F.col("n")).alias("e"),
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["s"], r["e"], r["n"]))
    for i, n_tok in enumerate(token_counts):
        chunks = sorted(by_doc.get(i, []))
        if n_tok == 0:
            assert chunks == []
            continue
        assert [s for s, _, _ in chunks] == list(range(0, n_tok, CHUNK_STRIDE))
        assert all(e <= n_tok for _, e, _ in chunks)
        assert chunks[-1][1] == n_tok  # the final chunk reaches the end
        for (s1, e1, _), (s2, _, _) in zip(chunks, chunks[1:]):
            assert s2 - s1 == CHUNK_STRIDE
            assert e1 - s2 in range(0, CHUNK_TOKENS)  # genuine overlap


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # source bucket
            st.integers(min_value=0, max_value=50),  # value
        ),
        min_size=1,
        max_size=60,
    ),
)
def test_sharded_running_sum_property(spark, rows_in):
    """Sharded prefix sum == plain running sum for arbitrary
    source/value shapes and an arbitrary shard span."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import windows

    # source 0 becomes NULL: a window's partitionBy groups NULL keys,
    # so the decomposition's offset join must be null-safe too
    data = [
        (i, None if src == 0 else f"s{src}", v)
        for i, (src, v) in enumerate(rows_in)
    ]
    df = spark.createDataFrame(data, "doc_id long, source string, n long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r["source"], r["doc_id"]): r["cum"]
        for r in df.withColumn("cum", F.sum("n").over(w)).collect()
    }
    sharded = windows.sharded_running_sum(
        df, "n", ["source"], "doc_id", shard=F.floor(F.col("doc_id") / 7), out_col="cum"
    )
    got = {(r["source"], r["doc_id"]): r["cum"] for r in sharded.collect()}
    assert got == naive


# ---------------------------------------------------------------- global_rank
# The sharded decomposition's correctness-critical edge is duplicated
# keys straddling quantile cut points (equal keys MUST share a shard,
# and lower-shard offsets must count exactly the strictly-lower rows /
# distinct keys). Values are drawn from a tiny integer domain so
# duplicates land ON the learned boundaries with high probability, and
# num_partitions=4 keeps several cut points inside the data range.

_rank_vals = st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
    min_size=1,
    max_size=50,
)


def _expected_rank_maps(vals, ascending, nulls_last):
    """value → (rank, dense_rank) computed by definition in Python."""

    def keyf(v):
        if v is None:
            return (1 if nulls_last else -1, 0.0)
        return (0, float(v) if ascending else -float(v))

    order = sorted(vals, key=keyf)
    rank_of, dense_of = {}, {}
    dense = 0
    for i, v in enumerate(order):
        if v not in rank_of:
            dense += 1
            rank_of[v] = i + 1
            dense_of[v] = dense
    return rank_of, dense_of


@settings(max_examples=12, deadline=None)
@given(
    _rank_vals,
    st.booleans(),  # ascending
    st.booleans(),  # nulls_last
    st.sampled_from(["rank", "dense_rank", "row_number"]),
    st.booleans(),  # column key → repartitionByRange path (no quantile shard)
)
def test_global_rank_matches_definition(
    spark, vals, ascending, nulls_last, method, column_key
):
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import windows

    df = spark.createDataFrame(
        [(i, None if v is None else float(v)) for i, v in enumerate(vals)],
        "id long, v double",
    )
    key = F.col("v") if column_key else "v"
    out = windows.global_rank(
        df,
        key,
        ascending=ascending,
        nulls_last=nulls_last,
        method=method,
        num_partitions=4,
        out_col="rnk",
    ).collect()
    assert len(out) == len(vals)
    got = {r["id"]: r["rnk"] for r in out}
    rank_of, dense_of = _expected_rank_maps(vals, ascending, nulls_last)
    if method == "row_number":
        # ties are broken arbitrarily, but the result must be a
        # permutation of 1..n consistent with the global order: every
        # row's number falls inside its tie group's [rank, rank+ties)
        assert sorted(got.values()) == list(range(1, len(vals) + 1))
        for i, v in enumerate(vals):
            lo = rank_of[v]
            hi = lo + sum(1 for x in vals if x == v)
            assert lo <= got[i] < hi, (v, got[i], lo, hi)
    elif method == "rank":
        for i, v in enumerate(vals):
            assert got[i] == rank_of[v], (v, got[i], rank_of[v])
    else:
        for i, v in enumerate(vals):
            assert got[i] == dense_of[v], (v, got[i], dense_of[v])


# ------------------------------------------------- neardup_clusters
# The connected-components operator has two execution paths (driver
# union-find fast path vs distributed min-label propagation with
# pointer jumping) that must be label-identical on EVERY graph shape —
# cliques, chains, forests, self-contained singletons. Example-based
# tests cover known shapes; this drives random edge sets through both
# paths against an independent reference closure.


def _reference_components(n_docs, edges):
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {i: find(i) for i in range(n_docs)}


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="driver row doc_dedup_clusters hash-checks clusters vs a recursive-CTE oracle every round; RUN_SLOW=1 for the hypothesis sweep",
)
@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=2, max_value=14),
    st.data(),
)
def test_neardup_clusters_matches_reference_closure(spark, n_docs, data):
    from ed_housing_data_pipeline_spark.operators import similarity as sim

    edges = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n_docs - 1),
                st.integers(min_value=0, max_value=n_docs - 1),
            ).filter(lambda e: e[0] != e[1]),
            max_size=20,
        )
    )
    docs = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], "id_a long, id_b long"
    )
    expected = _reference_components(n_docs, edges)
    for max_local in (10_000, 0):  # driver fast path, distributed loop
        out = sim.neardup_clusters(docs, pairs, "doc_id", max_local_edges=max_local)
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        assert got == expected, f"path max_local_edges={max_local}"


# ------------------------------------------------------------ asof_join
# Backward as-of semantics by definition: for each left row, the
# matched right row is argmax(ts_right) subject to ts_right <= ts_left
# (and within tolerance when given), per key — ties at equal ts take
# the right row, NULL keys match NULL keys (documented caveat), and a
# matched row whose VALUE is NULL must be carried faithfully, never
# skipped in favor of an older non-NULL row (the struct-carry
# property). Small integer ts domain forces heavy tie/boundary traffic.

_EPOCH = __import__("datetime").datetime(2024, 1, 1)


def _ts(sec):
    import datetime

    return _EPOCH + datetime.timedelta(seconds=sec)


_key_st = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
_asof_left = st.lists(
    st.tuples(_key_st, st.integers(min_value=0, max_value=30)),
    min_size=1,
    max_size=25,
)
_asof_right = st.lists(
    st.tuples(
        _key_st,
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(_asof_left, _asof_right, st.sampled_from([None, 0, 3, 10]))
def test_asof_join_matches_definition(spark, left_rows, right_rows, tolerance):
    from ed_housing_data_pipeline_spark.operators.joins import asof_join

    # dedupe right (key, ts): ties there are documented as arbitrary
    seen, right = set(), []
    for k, ts, v in right_rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right.append((k, ts, v))

    left = spark.createDataFrame(
        [(i, k, _ts(ts)) for i, (k, ts) in enumerate(left_rows)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(ts), v) for k, ts, v in right],
        "k long, rts timestamp, v long",
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, rdf, on="k", ts_left="ts", ts_right="rts",
            value_cols=["v"], tolerance_sec=tolerance,
        ).collect()
    }
    assert len(got) == len(left_rows)
    for i, (k, ts) in enumerate(left_rows):
        matches = [
            (rts, v)
            for rk, rts, v in right
            if rk == k and rts <= ts and (tolerance is None or ts - rts <= tolerance)
        ]
        expected = max(matches)[1] if matches else None
        assert got[i] == expected, (i, k, ts, got[i], expected)


# ------------------------------------------------------------ sessionize
# Definition: per user, in (ts, event_id) order, a session break is a
# gap STRICTLY greater than gap_minutes*60; session_id is the running
# count of breaks. Equal-ts ties are ordered by the tiebreak id (gap 0
# keeps them in-session either way; the tiebreak pins lag() inputs).

_sess_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=400),  # ts seconds
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(_sess_rows, st.sampled_from([1, 2]))
def test_sessionize_matches_definition(spark, rows_in, gap_minutes):
    from ed_housing_data_pipeline_spark.operators.events import sessionize

    df = spark.createDataFrame(
        [(i, u, _ts(ts)) for i, (u, ts) in enumerate(rows_in)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, "ts", "user_id", gap_minutes).collect()
    }
    by_user = {}
    for i, (u, ts) in enumerate(rows_in):
        by_user.setdefault(u, []).append((ts, i))
    expected = {}
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, i in evs:
            if prev is None or ts - prev > gap_minutes * 60:
                sid += 1
            expected[i] = sid
            prev = ts
    assert got == expected


# -------------------------------------------------- range_join_binned
# The binning rewrite's correctness edges are bin-boundary landings
# (right ts exactly on a bin edge, interval endpoints exactly on
# right ts) and negative window bounds. Small integer ts domain +
# window widths of a few seconds put many rows on those edges.


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(0, 1), st.integers(0, 40)),
        min_size=1,
        max_size=20,
    ),
    st.lists(  # right: (key, ts)
        st.tuples(st.integers(0, 1), st.integers(0, 40)),
        min_size=0,
        max_size=20,
    ),
    st.integers(-10, 10),  # lower_sec
    st.integers(1, 15),  # width = upper - lower
    st.booleans(),  # join on the key too?
)
def test_range_join_binned_matches_definition(
    spark, left_rows, right_rows, lower, width, with_key
):
    from ed_housing_data_pipeline_spark.operators.joins import range_join_binned

    upper = lower + width
    left = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left_rows)],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(j, k, _ts(s)) for j, (k, s) in enumerate(right_rows)],
        "rid long, rk long, rts timestamp",
    )
    keys = []
    if with_key:
        right = right.withColumnRenamed("rk", "k")
        keys = ["k"]
    out = range_join_binned(
        left, right, "lts", "rts", lower, upper, extra_keys=keys
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    expected = sorted(
        (i, j)
        for i, (lk, ls) in enumerate(left_rows)
        for j, (rk, rs) in enumerate(right_rows)
        if (not with_key or lk == rk) and ls + lower <= rs <= ls + upper
    )
    assert got == expected


# ------------------------------------------------------- global_ntile
# ntile is a pure function of (row_number, n): with q = n div k and
# r = n mod k the first r tiles take q+1 rows. A unique tie-break makes
# the expected assignment closed-form; duplicates from a tiny value
# domain stress the shard-offset path exactly like the rank property.


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(0, 4)), min_size=1, max_size=40
    ),
    st.integers(1, 5),  # n_tiles
    st.booleans(),  # ascending
    st.booleans(),  # nulls_last
)
def test_global_ntile_matches_definition(spark, vals, k, ascending, nulls_last):
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import windows

    df = spark.createDataFrame(
        [(i, None if v is None else float(v)) for i, v in enumerate(vals)],
        "id long, v double",
    )
    out = windows.global_ntile(
        df,
        "v",
        n_tiles=k,
        ascending=ascending,
        nulls_last=nulls_last,
        extra_order=[F.col("id").asc()],
        num_partitions=3,
    ).collect()
    got = {r["id"]: r["tile"] for r in out}

    def keyf(item):
        i, v = item
        if v is None:
            return (1 if nulls_last else -1, 0.0, i)
        return (0, float(v) if ascending else -float(v), i)

    order = sorted(enumerate(vals), key=keyf)
    n, q, r = len(vals), len(vals) // k, len(vals) % k
    expected = {}
    for pos, (i, _v) in enumerate(order, start=1):
        if pos <= r * (q + 1):
            expected[i] = (pos + q) // (q + 1)
        else:
            expected[i] = r + ((pos - r * (q + 1)) + q - 1) // max(q, 1)
    assert got == expected


# ------------------------- manifest commit protocol crash fuzzing
# The multi-component snapshot protocol (sources/lake.commit_components)
# underpins both dedup indexes; fuzz interleavings of full commits,
# torn commits (component snapshots written, manifest never lands),
# and retention sweeps — after every step, readers must see exactly
# the last FULLY committed state, never a torn one, and expiry must
# never break the committed pin.

_proto_ops = st.lists(
    st.sampled_from(["commit", "torn_one", "torn_all", "expire"]),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(_proto_ops)
def test_manifest_protocol_crash_interleavings(spark, ops):
    import tempfile

    from ed_housing_data_pipeline_spark.sources import lake

    def frame(tag):
        return spark.createDataFrame([(tag,)], "v long")

    with tempfile.TemporaryDirectory(prefix="proto_fuzz_") as root:
        committed = None  # model: the (a, b) payloads readers must see
        seq = 0
        for op in ops:
            seq += 1
            if op == "commit":
                lake.commit_components(
                    spark, root, {"a": frame(seq), "b": frame(seq + 1000)}
                )
                committed = (seq, seq + 1000)
            elif op == "torn_one":
                # crash after ONE component write, before the manifest
                lake.write_snapshot(spark, frame(seq + 2000), f"{root}/a")
            elif op == "torn_all":
                # crash after EVERY component write, before the manifest
                lake.write_snapshot(spark, frame(seq + 3000), f"{root}/a")
                lake.write_snapshot(spark, frame(seq + 4000), f"{root}/b")
            else:  # expire (huge grace: live-writer debris must survive)
                # manifest-aware retention — the torn-commit ops above
                # advance component pointers PAST the manifest pin, so
                # component-local expire_snapshots(keep_latest=1) would
                # sweep the pinned version (the original finding that
                # motivated expire_components)
                if committed is not None:
                    lake.expire_components(
                        spark, root, keep_latest=1, orphan_grace_sec=10**6
                    )
            if committed is None:
                import pytest as _pytest

                with _pytest.raises(FileNotFoundError):
                    lake.read_components(spark, root, ["a", "b"])
            else:
                got = lake.read_components(spark, root, ["a", "b"])
                assert [r["v"] for r in got["a"].collect()] == [committed[0]]
                assert [r["v"] for r in got["b"].collect()] == [committed[1]]


# ----------------------------------- upsert_partitions LWW property
# Model: per (partition, key), the stored row is the last-writer-wins
# winner by order_col (greatest version wins; a STALE replay must not
# clobber a newer stored row; ties go to the newer batch; NULL
# versions lose to any concrete one). Batches are deduped per
# (partition, key) by the generator — within-batch ties are
# documented as arbitrary.

_upsert_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.sampled_from(["p1", "p2"]),  # partition
            st.one_of(st.none(), st.integers(0, 5)),  # version
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None)
@given(_upsert_batches)
def test_upsert_partitions_last_writer_wins_model(spark, batches):
    import tempfile

    from ed_housing_data_pipeline_spark.sources import lake

    def rank(ver):
        return (-1, -1) if ver is None else (0, ver)

    with tempfile.TemporaryDirectory(prefix="upsert_fuzz_") as tmp:
        root = f"{tmp}/ds"
        model = {}
        seq = 0
        for batch in batches:
            rows_b, seen = [], set()
            for key, part, ver in batch:
                if (part, key) in seen:
                    continue  # within-batch ties are arbitrary: skip
                seen.add((part, key))
                seq += 1
                rows_b.append((key, ver, seq, part))
                stored = model.get((part, key))
                # update wins on >= (the _is_update tie-break)
                if stored is None or rank(ver) >= rank(stored[0]):
                    model[(part, key)] = (ver, seq)
            df = spark.createDataFrame(
                rows_b, "id int, ver int, payload long, d string"
            )
            touched = lake.upsert_partitions(
                spark, root, df, key_cols=["id"], partition_col="d",
                order_col="ver",
            )
            assert touched == sorted({p for _, p, _ in batch})
        got = {
            (r["d"], r["id"]): (r["ver"], r["payload"])
            for r in spark.read.parquet(root).collect()
        }
        assert got == model


# ------------------------------------- MERGE grammar model property
# Model: the component is a dict key -> value (one live row per key,
# generated batches are unique per key). Each op applies one
# merge_rows call under a randomly drawn clause combination; the model
# applies the documented key-level semantics: matched keys update
# (whole-key replace) unless content-equal (skip_unchanged) or gated
# off by WHEN MATCHED AND; WHEN MATCHED AND <p> THEN DELETE wins a
# double match; unmatched batch keys insert under insert_unmatched;
# WHEN NOT MATCHED BY SOURCE delete/set act on target keys absent
# from the batch (delete first, then the row-wise SET under its
# condition, itself skip-if-unchanged). The merged view must equal
# the model after EVERY op — any clause-interaction bug surfaces as a
# divergence.

_merge_kinds = st.sampled_from(["plain", "pred", "del", "noins", "nmbs"])
_merge_ops = st.lists(
    st.tuples(
        _merge_kinds,
        st.dictionaries(
            st.integers(0, 5), st.integers(-5, 5), min_size=1, max_size=4
        ),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None)
@given(_merge_ops)
def test_merge_grammar_matches_model(spark, ops):
    import tempfile

    from ed_housing_data_pipeline_spark.sources import lake

    def frame(d):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(d.items())], "k bigint, v bigint"
        )

    with tempfile.TemporaryDirectory(prefix="merge_fuzz_") as tmp:
        root = f"{tmp}/ds"
        model = {0: 0, 1: 1, 2: 2}
        lake.append_segments(spark, root, {"t": frame(model)}, init=True)
        for kind, batch in ops:
            kw = {}
            if kind == "pred":
                kw["when_matched"] = "source.v > target.v"
            elif kind == "del":
                kw["when_matched_delete"] = "source.v < 0"
            elif kind == "noins":
                kw["insert_unmatched"] = False
            elif kind == "nmbs":
                kw["when_not_matched_by_source_delete"] = "target.v < -2"
                kw["when_not_matched_by_source_set"] = {"v": "target.v + 10"}
                kw["when_not_matched_by_source_condition"] = "target.v > 3"
            lake.merge_rows(spark, root, "t", "k", frame(batch), **kw)
            # the model, per the documented key-level semantics
            for k, v in batch.items():
                matched = k in model
                if kind == "del" and matched and v < 0:
                    del model[k]  # delete wins any double match
                    continue
                if matched:
                    if model[k] == v:
                        continue  # skip_unchanged
                    if kind == "pred" and not (v > model[k]):
                        continue  # WHEN MATCHED AND gate
                    model[k] = v
                elif kind != "noins":
                    model[k] = v
            if kind == "nmbs":
                for k in [k for k in model if k not in batch]:
                    if model[k] < -2:
                        del model[k]
                    elif model[k] > 3:
                        model[k] = model[k] + 10
            got = {
                r.k: r.v
                for r in lake.read_segmented_merged(spark, root, "t", "k")
                .collect()
            }
            assert got == model, (kind, batch, got, model)
