"""Paginated Python DataSource tests (sources/paged.py): page
partitioning, count probe, filter pushdown, missing-field defaults."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.sources import paged


@pytest.fixture()
def api_file(tmp_path):
    path = tmp_path / "api.jsonl"
    with open(path, "w") as f:
        for i in range(10):
            rec = {"id": i, "name": f"rec{i}", "value": float(i) * 1.5}
            if i == 7:
                del rec["value"]  # missing field → None (.get default)
            f.write(json.dumps(rec) + "\n")
    return str(path)


def _read(spark, api_file, page_size=3):
    paged.register(spark)
    return (
        spark.read.format("paged_json")
        .schema("id bigint, name string, value double")
        .option("path", api_file)
        .option("pageSize", page_size)
        .load()
    )


def test_pages_become_partitions(spark, api_file):
    df = _read(spark, api_file, page_size=3)
    # 10 rows / 3 per page → 4 page partitions (S1/S2 + S3 count probe)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10


def test_all_rows_and_missing_fields(spark, api_file):
    rows = {r.id: r for r in _read(spark, api_file).collect()}
    assert len(rows) == 10
    assert rows[3].name == "rec3" and rows[3].value == 4.5
    assert rows[7].value is None  # missing key → null


def test_filter_pushdown_in_and_range(spark, api_file):
    df = _read(spark, api_file)
    got = sorted(r.id for r in df.filter(F.col("id").isin(2, 5, 9)).collect())
    assert got == [2, 5, 9]  # S4: the $filter=ID in (…) analog
    got = sorted(r.id for r in df.filter(F.col("value") > 9.0).collect())
    assert got == [8, 9]  # 12.0, 13.5 (row 7 has null value)


def test_pushdown_preserves_correctness_with_unsupported_filters(spark, api_file):
    df = _read(spark, api_file)
    # contains() is not pushed — Spark must evaluate it post-scan
    got = sorted(r.id for r in df.filter(F.col("name").contains("rec1")).collect())
    assert got == [1]


def test_with_retries_recovers_from_transient_failures():
    calls, sleeps = [], []
    def flaky():
        calls.append(1)
        if len(calls) <= 2:
            raise ConnectionError("transient")
        return "ok"
    got = paged.with_retries(
        flaky, paged.RetryPolicy(attempts=3, base_delay=0.5), sleep=sleeps.append
    )
    assert got == "ok" and len(calls) == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff


def test_with_retries_fails_loud_on_exhaustion():
    def always_down():
        raise TimeoutError("still down")
    with pytest.raises(TimeoutError):
        paged.with_retries(
            always_down, paged.RetryPolicy(attempts=3, base_delay=0.0),
            sleep=lambda _: None,
        )


def test_with_retries_does_not_swallow_non_transient():
    def broken():
        raise ValueError("a bug, not the network")
    with pytest.raises(ValueError):
        paged.with_retries(broken, sleep=lambda _: None)


def test_lax_coercion_int_in_string_field(spark, tmp_path):
    # the strict Arrow build rejects ints in a string field; the
    # fallback infers-then-casts (ADVICE r4), restoring the laxity the
    # row-at-a-time path had
    path = tmp_path / "lax.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"id": 1, "name": "alpha", "value": 1.5}) + "\n")
        f.write(json.dumps({"id": 2, "name": 42, "value": 2}) + "\n")
    rows = {r.id: r for r in _read(spark, str(path)).collect()}
    assert rows[2].name == "42" and rows[2].value == 2.0


def test_uncoercible_value_names_the_field(spark, tmp_path):
    path = tmp_path / "bad.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"id": 1, "name": "a", "value": {"nested": True}}) + "\n")
    with pytest.raises(Exception, match="field 'value'"):
        _read(spark, str(path)).collect()


# ---------------------------------------------------------------------------
# property tests for the Arrow-batch coercion fallback (VERDICT r5 #8):
# reader-level (no Spark session), so hypothesis can afford real volume


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _reader_rows(path, schema_ddl, page_size=4):
    """Drive PagedJsonReader directly: partitions() → read() → Arrow
    batches → list of per-field python values, in row order."""
    schema = _ddl_schema(schema_ddl)  # context-free (see ADVICE r7 note)
    rdr = paged.PagedJsonReader(
        {"path": str(path), "pagesize": str(page_size)}, schema
    )
    out = []
    for part in rdr.partitions():
        for batch in rdr.read(part):
            out.extend(batch.to_pylist())
    return out


def _expected_string(v):
    """the documented string-column laxity: one deterministic function
    of each value, independent of what else shares the page"""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, (dict, list)):
        return json.dumps(v)
    return str(v)


_json_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
    st.dictionaries(st.text(max_size=5), st.integers(), max_size=3),
    st.lists(st.integers(), max_size=3),
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_json_scalar, min_size=1, max_size=25),
       page_size=st.integers(min_value=1, max_value=7))
def test_string_column_coercion_is_per_value_deterministic(
    tmp_path_factory, vals, page_size
):
    # ANY mix of ints/floats/bools/strings/nulls/dicts/lists in a
    # string-typed column must coerce per value — never via Arrow's
    # infer+cast, whose rendering depends on the page's OTHER values
    tmp = tmp_path_factory.mktemp("prop")
    path = tmp / "page.jsonl"
    with open(path, "w") as f:
        for i, v in enumerate(vals):
            f.write(json.dumps({"id": i, "name": v}) + "\n")
    rows = _reader_rows(path, "id bigint, name string", page_size)
    assert [r["name"] for r in rows] == [_expected_string(v) for v in vals]
    assert [r["id"] for r in rows] == list(range(len(vals)))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.one_of(st.none(), st.integers(min_value=-(2**53), max_value=2**53)),
    min_size=1, max_size=25,
), page_size=st.integers(min_value=1, max_value=7))
def test_long_column_ints_and_nulls_round_trip(
    tmp_path_factory, vals, page_size
):
    tmp = tmp_path_factory.mktemp("prop")
    path = tmp / "page.jsonl"
    with open(path, "w") as f:
        for i, v in enumerate(vals):
            f.write(json.dumps({"id": i, "n": v}) + "\n")
    rows = _reader_rows(path, "id bigint, n bigint", page_size)
    assert [r["n"] for r in rows] == vals


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_rows=st.integers(min_value=0, max_value=40),
       page_size=st.integers(min_value=1, max_value=9))
def test_page_size_never_changes_the_result(
    tmp_path_factory, n_rows, page_size
):
    # pagination is pure partitioning: the union of all page reads is
    # the file, for ANY page size — no dropped/duplicated boundary rows
    tmp = tmp_path_factory.mktemp("prop")
    path = tmp / "page.jsonl"
    with open(path, "w") as f:
        for i in range(n_rows):
            f.write(json.dumps({"id": i}) + "\n")
    rows = _reader_rows(path, "id bigint", page_size)
    assert sorted(r["id"] for r in rows) == list(range(n_rows))


def test_numeric_strings_cast_into_long_column(tmp_path):
    # non-string targets keep the infer+cast laxity: an all-numeric-
    # string page lands as ints (the old row-at-a-time tolerance)
    path = tmp_path / "numstr.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"id": 1, "n": "123"}) + "\n")
        f.write(json.dumps({"id": 2, "n": "456"}) + "\n")
    rows = _reader_rows(path, "id bigint, n bigint", 4)
    assert [r["n"] for r in rows] == [123, 456]


# ---------------------------------------------------------------------------
# streaming reader (late r7): offset discipline, replay, schema order


def _ddl_schema(ddl):
    # ADVICE r7: _parse_datatype_string needs an active SparkContext,
    # which made these unit tests order-dependent (green only after an
    # earlier test created a session).  The reader tests exercise pure
    # Python — build the StructType directly, no JVM required.
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    by_name = {"bigint": LongType(), "string": StringType()}
    fields = []
    for part in ddl.split(","):
        name, typ = part.split()
        fields.append(StructField(name, by_name[typ]))
    return StructType(fields)


def _stream_reader(path, ddl, page_size):
    from magshield_data_pipeline_spark.sources.paged import (
        PagedJsonStreamReader,
    )

    return PagedJsonStreamReader(
        {"path": str(path), "pagesize": str(page_size)},
        _ddl_schema(ddl),
    )


def _write_jsonl(path, records):
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")


def test_stream_reader_pages_partition_the_feed(tmp_path):
    path = tmp_path / "feed.jsonl"
    _write_jsonl(path, [{"id": i, "v": i * 3} for i in range(11)])
    r = _stream_reader(path, "id bigint, v bigint", 4)
    off = r.initialOffset()
    seen = []
    for expect_len in (4, 4, 3, 0):
        rows, off = r.read(off)
        batch = list(rows)
        assert len(batch) == expect_len
        seen.extend(batch)
    assert seen == [(i, i * 3) for i in range(11)]
    assert off == {"row": 11}  # a drained source stops advancing


def test_stream_reader_replay_is_exact(tmp_path):
    # checkpoint recovery calls readBetweenOffsets — it must reproduce
    # the original batch bit-for-bit, not re-window it
    path = tmp_path / "feed.jsonl"
    _write_jsonl(path, [{"id": i} for i in range(9)])
    r = _stream_reader(path, "id bigint", 3)
    o0 = r.initialOffset()
    b1, o1 = r.read(o0)
    b2, o2 = r.read(o1)
    assert list(r.readBetweenOffsets(o0, o1)) == list(b1) == [(0,), (1,), (2,)]
    assert list(r.readBetweenOffsets(o1, o2)) == list(b2) == [(3,), (4,), (5,)]


def test_stream_reader_field_order_follows_schema_not_json(tmp_path):
    # JSON object key order must not leak into column order
    path = tmp_path / "feed.jsonl"
    _write_jsonl(path, [{"b": 2, "a": 1}])
    r = _stream_reader(path, "a bigint, b bigint", 10)
    rows, _ = r.read(r.initialOffset())
    assert list(rows) == [(1, 2)]


def test_stream_reader_rows_are_picklable(tmp_path):
    # the simple-reader protocol prefetches driver-side and PICKLES the
    # batch; a generator here fails planPartitions at runtime
    import pickle

    path = tmp_path / "feed.jsonl"
    _write_jsonl(path, [{"id": 1}])
    r = _stream_reader(path, "id bigint", 10)
    rows, off = r.read(r.initialOffset())
    pickle.dumps(list(rows))
    pickle.dumps(off)
