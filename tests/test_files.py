"""File utility tests — FIXTURES.md F-F (distcp tree copy, weak-check
path: target tree equals source tree)."""

from __future__ import annotations

import os

import pytest

from geektime_bigdata_spark.sources.files import dist_copy, list_tree


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    for rel in ["a.txt", "d1/b.txt", "d1/d2/c.txt", "d3/e.bin"]:
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(f"content:{rel}".encode())
    return src


def test_dist_copy_mirrors_tree(spark, tree, tmp_path):
    dst = tmp_path / "dst"
    statuses = dist_copy(spark, str(tree), str(dst), parallelism=3)
    assert len(statuses) == 4
    assert all(s.startswith("OK ") for s in statuses)
    assert list_tree(str(dst)) == list_tree(str(tree))
    # content preserved
    assert (dst / "d1/d2/c.txt").read_bytes() == (tree / "d1/d2/c.txt").read_bytes()


def test_dist_copy_empty_dir(spark, tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    assert dist_copy(spark, str(src), str(tmp_path / "dst2")) == []


def test_dist_copy_invalid_source_raises(spark, tmp_path):
    """Reference bug fixed: invalid args must raise, not print-and-continue
    (DistCopyMain.scala:18-20,47-49)."""
    with pytest.raises(ValueError):
        dist_copy(spark, str(tmp_path / "nope"), str(tmp_path / "dst3"))


def test_dist_copy_ignore_failures(spark, tree, tmp_path):
    """ignoreFailures actually gates behavior (unlike DistCopyMain.scala:23,
    which parses it and never reads it). Failure injected by pre-creating a
    directory where a target FILE must go — copyfile raises on it."""
    dst = tmp_path / "dst4"
    (dst / "a.txt").mkdir(parents=True)

    with pytest.raises(Exception):
        dist_copy(spark, str(tree), str(dst), ignore_failures=False)

    statuses = dist_copy(spark, str(tree), str(dst), ignore_failures=True)
    fails = [s for s in statuses if s.startswith("FAIL ")]
    oks = [s for s in statuses if s.startswith("OK ")]
    assert len(fails) == 1 and "a.txt" in fails[0]
    assert len(oks) == 3


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    """JSONL sink/source round-trip on the documents table: schema'd
    re-read must reproduce the rows exactly (jsonl is the training-data
    interchange format; S1/S2 extension)."""
    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources.textio import read_jsonl, write_jsonl

    docs = table(spark, sf_dir, "documents")
    out = tmp_path / "docs_jsonl"
    write_jsonl(docs, str(out))
    back = read_jsonl(spark, str(out), schema=docs.schema)
    a = sorted(tuple(map(str, r)) for r in docs.collect())
    b = sorted(tuple(map(str, r)) for r in back.collect())
    assert a == b


def test_jsonl_corrupt_records_captured(spark, tmp_path):
    """PERMISSIVE jsonl ingest: malformed lines land in _corrupt_record
    instead of failing the job — the ingest-robustness contract a 100 TB
    crawl feed needs (a single bad line must never kill the batch)."""
    from geektime_bigdata_spark.sources.textio import read_jsonl

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "{BROKEN LINE\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    schema = "doc_id long, text string, _corrupt_record string"
    df = read_jsonl(spark, str(src), schema=schema).cache()
    try:
        good = df.filter("_corrupt_record IS NULL").count()
        bad = df.filter("_corrupt_record IS NOT NULL").count()
        assert (good, bad) == (2, 1), df.collect()
    finally:
        df.unpersist()


def test_orc_round_trip(spark, sf_dir, tmp_path):
    """ORC sink/source round-trip (the second columnar format Spark ships
    natively; some lakehouse estates are ORC-standardized)."""
    from geektime_bigdata_spark.registry import table

    c = table(spark, sf_dir, "customer")
    out = str(tmp_path / "customer_orc")
    c.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    a = sorted(tuple(map(str, r)) for r in c.collect())
    b = sorted(tuple(map(str, r)) for r in back.collect())
    assert a == b


def test_orc_events_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    """write_orc/read_orc on events must reproduce TIMESTAMP and DOUBLE
    columns bit-exactly — the types JSONL cannot carry, and precisely
    what the ORC surface exists for (str() of a float is shortest
    round-trip repr, so the compare is bit-faithful)."""
    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources.columnar import read_orc, write_orc

    ev = table(spark, sf_dir, "events")
    out = str(tmp_path / "events_orc")
    write_orc(ev, out)
    back = read_orc(spark, out, schema=ev.schema)
    a = sorted(tuple(map(str, r)) for r in ev.collect())
    b = sorted(tuple(map(str, r)) for r in back.collect())
    assert a == b


@pytest.mark.parametrize("fmt", ["orc", "csv", "xml"])
def test_roundtrip_stats_matches_direct(spark, sf_dir, fmt):
    """Each registered roundtrip aggregate must equal the same aggregate
    computed straight off the parquet — any loss in the trip flips a
    sum. The direct side reuses the operator's own shared aggregate
    helper (event_interchange_aggs), so this test pins the TRIP is
    lossless while the independent DuckDB oracle pins the aggregate
    itself (ADVICE r13: the former verbatim copy of the expressions
    could silently drift from the operator)."""
    from pyspark.sql import functions as F

    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources.columnar import (
        event_interchange_aggs,
        orc_roundtrip_stats,
    )
    from geektime_bigdata_spark.sources.textio import (
        csv_roundtrip_stats,
        xml_roundtrip_stats,
    )

    op = {
        "orc": orc_roundtrip_stats,
        "csv": csv_roundtrip_stats,
        "xml": xml_roundtrip_stats,
    }[fmt]
    got = sorted(tuple(map(str, r)) for r in op(spark, sf_dir).collect())
    direct = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase", "signup"))
        .groupBy("event_type")
        .agg(*event_interchange_aggs())
    )
    want = sorted(tuple(map(str, r)) for r in direct.collect())
    assert got == want and len(got) == 3


@pytest.mark.parametrize("fmt", ["csv", "xml"])
def test_text_events_roundtrip_bit_exact(spark, sf_dir, tmp_path, fmt):
    """write_csv/read_csv and write_xml/read_xml on events must
    reproduce TIMESTAMP micros and DOUBLE bit-exactly — both formats'
    defaults are lossy (millisecond timestampFormat), so this pins
    that the explicit option discipline in each sink/source pair
    actually restores losslessness (str() of a float is shortest
    round-trip repr, so the compare is bit-faithful)."""
    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources import textio

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = str(tmp_path / f"events_{fmt}")
    if fmt == "csv":
        textio.write_csv(ev, out)
        back = textio.read_csv(spark, out, schema=ev.schema)
    else:
        textio.write_xml(ev, out, row_tag="event")
        back = textio.read_xml(spark, out, schema=ev.schema, row_tag="event")
    a = sorted(tuple(map(str, r)) for r in ev.collect())
    b = sorted(tuple(map(str, r)) for r in back.collect())
    assert a == b


def test_compact_parquet(spark, sf_dir, tmp_path):
    """Compaction must preserve every row while collapsing the file count."""
    from geektime_bigdata_spark.operators.scale import write_date_partitioned
    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources.files import compact_parquet

    out = str(tmp_path / "frag")
    # fragment: one file per of many partitions via repartition(16)
    table(spark, sf_dir, "events").repartition(16).write.parquet(out)
    before_rows = spark.read.parquet(out).count()
    import os

    before_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    after_files = compact_parquet(spark, out, target_files=2)
    assert after_files <= 2 < before_files
    assert spark.read.parquet(out).count() == before_rows


def test_schema_evolution_merge_read(spark, tmp_path):
    """mergeSchema ingest: batches written with evolving schemas (a new
    column appears later) must read as one table with NULLs backfilled —
    the append-only corpus evolution path."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.parquet(out + "/batch=1")
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.parquet(out + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(df.columns) >= {"doc_id", "text", "lang"}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "en"


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema evolution across parquet writes: an added column must
    surface via mergeSchema with NULLs for the old files — the
    lakehouse append pattern (new ingest adds a field; historical
    files stay valid)."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(d + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(d + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


# The value classes text interchange classically mangles: delimiters,
# quotes, newlines/CR, XML metacharacters and CDATA terminators,
# whitespace padding, empty-vs-null, unicode, escape characters, and
# strings that look like format keywords. Each of these broke at least
# one DEFAULT option during the r14 probe that produced the option
# discipline in write_csv/read_csv and write_xml/read_xml.
ADVERSARIAL_STRINGS = [
    "a,b",
    'q"uote"',
    "line\nbreak",
    "crlf\r\n",
    "\rsolo\r",
    "tab\there",
    "<xml>&amp;</xml>",
    "apos'trophe",
    "]]>",
    "unié中文",
    " lead/trail ",
    "  double  space",
    "",
    None,
    "\\backslash\\",
    "null",
    "NaN",
    '"--"',
    "&#x27;",
]


@pytest.mark.parametrize("fmt", ["csv", "xml"])
def test_interchange_adversarial_strings(spark, tmp_path, fmt):
    """The CSV and XML sink/source pairs must round-trip the classic
    text-interchange hazard classes byte-exactly — embedded
    delimiters, quotes, newlines AND carriage returns (the XML writer
    character-reference-escapes CR, sidestepping XML-spec line-ending
    normalization), metacharacters, padding, empty-vs-NULL. Measured
    r14: with DEFAULT options, CSV mangled four of these classes and
    XML two; the explicit option discipline in textio restores all of
    them. The one documented exception is CSV's reserved NULL marker
    (see test_csv_null_sentinel_is_reserved)."""
    from geektime_bigdata_spark.sources import textio

    df = spark.createDataFrame(
        list(enumerate(ADVERSARIAL_STRINGS)), "id long, s string"
    )
    out = str(tmp_path / f"adv_{fmt}")
    if fmt == "csv":
        textio.write_csv(df, out)
        back = textio.read_csv(spark, out, schema=df.schema)
    else:
        textio.write_xml(df, out, row_tag="r")
        back = textio.read_xml(spark, out, schema=df.schema, row_tag="r")
    want = {r["id"]: r["s"] for r in df.collect()}
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == want


def test_csv_null_sentinel_is_reserved(spark, tmp_path):
    """The documented CSV boundary: NULL needs SOME in-file byte
    representation, ours is the Hive/MySQL '\\N' marker, and univocity
    matches it post-unescape — so a DATA value of exactly
    backslash-N reads back as NULL (quoting does not protect it).
    Pinning the collision keeps the boundary visible instead of
    latent; everything else in the adversarial corpus round-trips."""
    from geektime_bigdata_spark.sources import textio

    df = spark.createDataFrame(
        [(0, "\\N"), (1, None), (2, "x")], "id long, s string"
    )
    out = str(tmp_path / "sentinel_csv")
    textio.write_csv(df, out)
    back = textio.read_csv(spark, out, schema=df.schema)
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == {0: None, 1: None, 2: "x"}


def test_binary_export_ingest_roundtrip(spark, tmp_path):
    """export_blobs must write one file per row from the executors and
    return the verified count; read_binary_files must reproduce the
    exact bytes (binary AND string payloads) and prune non-matching
    names at the LISTING via pathGlobFilter — the decoy costs a
    directory entry, never a read."""
    from geektime_bigdata_spark.sources.binfiles import (
        export_blobs,
        read_binary_files,
    )

    rows = [("a", "68656c6c6f"), ("b", "00ff10"), ("c", "")]
    df = spark.createDataFrame(rows, "name string, payload string")
    out = str(tmp_path / "blobs")
    assert export_blobs(df, out) == 3
    (tmp_path / "blobs" / "decoy.tmp").write_bytes(b"nope")
    back = read_binary_files(spark, out)
    got = {
        r["path"].rsplit("/", 1)[-1]: bytes(r["content"])
        for r in back.collect()
    }
    # the zero-byte file exists on disk but the binaryFile source
    # DROPS it (no empty split is ever planned) — the documented
    # boundary in read_binary_files; pin it so a Spark version that
    # changes the behavior surfaces here
    assert (tmp_path / "blobs" / "c.bin").exists()
    assert got == {
        "a.bin": b"68656c6c6f",
        "b.bin": b"00ff10",
    }
    # length column matches content without reading twice
    lens = {r["path"].rsplit("/", 1)[-1]: r["length"] for r in back.collect()}
    assert lens == {"a.bin": 10, "b.bin": 6}


def test_binary_export_accepts_raw_bytes(spark, tmp_path):
    """Binary payload columns (real media blobs) export byte-exact —
    the string path is a convenience, not a constraint."""
    from geektime_bigdata_spark.sources.binfiles import (
        export_blobs,
        read_binary_files,
    )

    blob = bytes(range(256))
    df = spark.createDataFrame(
        [("x", bytearray(blob))], "name string, payload binary"
    )
    out = str(tmp_path / "raw")
    assert export_blobs(df, out) == 1
    back = read_binary_files(spark, out).collect()
    assert len(back) == 1 and bytes(back[0]["content"]) == blob


def test_binary_export_rejects_hostile_names_and_nulls(spark, tmp_path):
    """export_blobs guards (ADVICE r14): a name is a leaf filename — a
    path separator or '..' segment must raise rather than write outside
    the export directory; NULL names/payloads raise a named ValueError
    instead of serializing as the literal 'None'; non-ASCII string
    payloads export utf-8 (no UnicodeEncodeError deep in a task)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from geektime_bigdata_spark.sources.binfiles import (
        export_blobs,
        read_binary_files,
    )

    out = str(tmp_path / "guard")
    # '' and '.' (ADVICE r15): no traversal, but they'd write the
    # hidden artifacts '.bin' / '..bin' — dirty data, rejected too
    for bad in ["../escape", "a/b", "..", "x/../y", "", "."]:
        df = spark.createDataFrame(
            [(bad, "p")], "name string, payload string"
        )
        with pytest.raises(PythonException, match="path separator"):
            export_blobs(df, out)
    assert not (tmp_path / "escape.bin").exists()
    # with separators banned, an EMBEDDED '..' cannot traverse — a
    # legitimate leaf name like 'v1..v2' must export, not raise
    df = spark.createDataFrame(
        [("v1..v2", "p")], "name string, payload string"
    )
    assert export_blobs(df, out) == 1
    import os as _os

    assert _os.path.exists(_os.path.join(out, "v1..v2.bin"))

    for row in [(None, "p"), ("ok", None)]:
        df = spark.createDataFrame([row], "name string, payload string")
        with pytest.raises(PythonException, match="NULL"):
            export_blobs(df, out)

    df = spark.createDataFrame(
        [("utf8", "héllo wörld 世界")], "name string, payload string"
    )
    assert export_blobs(df, out) == 1
    back = read_binary_files(spark, out).collect()
    assert bytes(back[0]["content"]).decode("utf-8") == "héllo wörld 世界"
