"""WARC source (sources/warc.py): framing round-trips across all three
gzip layouts, truncated-tail tolerance, and the no-shuffle plan shape —
the byte-level truth the s9_warc_roundtrip oracle is held to."""

from __future__ import annotations

from etl_sendas_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_record,
    write_warc,
)


def _records(n=5):
    out = []
    for i in range(n):
        out.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i}>",
                    "WARC-Target-URI": f"https://example.org/doc/{i}",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "Content-Type": "text/plain",
                },
                f"payload {i} éñ".encode("utf-8"),
            )
        )
    # adversarial payload: contains a fake record header — framing is
    # Content-Length based, so this must NOT split the record
    out.append(
        (
            {"WARC-Type": "metadata", "WARC-Record-ID": "<urn:uuid:meta>"},
            b"WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a real record",
        )
    )
    return out


def test_warc_roundtrip_all_gzip_layouts(spark, tmp_path):
    recs = _records()
    for mode, name in ((None, "plain.warc"), ("file", "f.warc.gz"), ("record", "r.warc.gz")):
        path = str(tmp_path / name)
        write_warc(recs, path, gzip_mode=mode)
        rows = sorted(
            read_warc(spark, path).collect(),
            key=lambda r: r["record_id"],
        )
        assert len(rows) == len(recs), mode
        by_id = {r["record_id"]: r for r in rows}
        for hdrs, payload in recs:
            got = by_id[hdrs["WARC-Record-ID"]]
            assert bytes(got["payload"]) == payload, mode
            assert got["content_length"] == len(payload)
            assert got["warc_type"] == hdrs["WARC-Type"]


def test_warc_truncated_tail_is_tolerated(spark, tmp_path):
    recs = _records(3)  # 3 responses + the adversarial metadata record
    blob = b"".join(warc_record(h, p) for h, p in recs)
    cut = blob[: len(blob) - 15]  # last record's payload truncated
    parsed = list(parse_warc_bytes(cut))
    assert len(parsed) == 3  # whole records only, no exception
    path = str(tmp_path / "trunc.warc")
    with open(path, "wb") as fh:
        fh.write(cut)
    assert read_warc(spark, path).count() == 3


def test_warc_parse_is_shuffle_free(spark, tmp_path):
    path = str(tmp_path / "p.warc")
    write_warc(_records(4), path)
    plan = (
        read_warc(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # one binaryFile scan + one Arrow stage


def test_wet_conversion_records(spark, tmp_path):
    """WARC→WET: response payloads extract through the shared HTML
    chain into conversion records (text/plain, refers-to source id,
    UTF-8 byte-exact Content-Length); non-response records drop; the
    transform is shuffle-free; and the WET rows survive a
    write_warc/read_warc roundtrip byte-for-byte."""
    from etl_sendas_spark.sources.warc import to_wet

    html = "<html><body><p>Hello &amp; wörld.</p><p>Two.</p></body></html>"
    recs = [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:1>",
                "WARC-Target-URI": "https://x/1",
                "WARC-Date": "2026-01-01T00:00:00Z",
                "Content-Type": "text/html",
            },
            html.encode("utf-8"),
        ),
        ({"WARC-Type": "request", "WARC-Record-ID": "<urn:uuid:req>"}, b"GET /"),
    ]
    src = str(tmp_path / "src.warc")
    write_warc(recs, src)
    wet = to_wet(read_warc(spark, src))
    rows = wet.collect()
    assert len(rows) == 1  # the request record dropped
    r = rows[0]
    assert r["warc_type"] == "conversion"
    assert r["content_type"] == "text/plain"
    assert r["refers_to"] == "<urn:uuid:1>"
    # conversion id is a VALID ISO 28500 '<uri>': the source id's
    # brackets are stripped before embedding (ADVICE r7 — nested
    # '<urn:wet:<urn:uuid:...>>' is not a legal WARC-Record-ID)
    assert r["record_id"] == "<urn:wet:urn:uuid:1>"
    assert "<urn:wet:<" not in r["record_id"]
    assert bytes(r["payload"]).decode("utf-8") == "Hello & wörld.\nTwo."
    assert r["content_length"] == len("Hello & wörld.\nTwo.".encode("utf-8"))

    plan = wet._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # WET records are themselves valid WARC: roundtrip one segment
    wet_path = str(tmp_path / "out.wet.gz")
    write_warc(
        [
            (
                {
                    "WARC-Type": r["warc_type"],
                    "WARC-Record-ID": r["record_id"],
                    "WARC-Target-URI": r["target_uri"],
                    "WARC-Refers-To": r["refers_to"],
                    "Content-Type": r["content_type"],
                },
                bytes(r["payload"]),
            )
        ],
        wet_path,
        gzip_mode="record",
    )
    back = read_warc(spark, wet_path).collect()[0]
    assert bytes(back["payload"]) == bytes(r["payload"])
    assert back["warc_type"] == "conversion"


def test_write_warc_distributed_roundtrip_and_mechanism(spark, tmp_path):
    """Distributed WARC export (VERDICT r8 #2): each task writes ONE
    segment for its partition — manifest row count == non-empty
    partition count, the plan is a single Arrow mapInPandas over the
    records (no collect, no driver materialization), and read_warc
    over the written segments round-trips every record's id/uri/bytes
    exactly. WET conversion records (refers_to) export through the
    same call and keep their Refers-To lineage."""
    import glob

    from pyspark.sql import functions as F

    from etl_sendas_spark.sources.warc import (
        to_wet,
        write_warc_distributed,
    )

    src = str(tmp_path / "src.warc")
    write_warc(_records(40), src)
    recs = read_warc(spark, src).repartition(4)

    out_dir = str(tmp_path / "shards")
    manifest = write_warc_distributed(recs, out_dir)
    # mechanism: the manifest plan is mapInPandas over the record scan
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Collect" not in plan
    rows = manifest.collect()  # caller triggers the export
    assert len(rows) == 4 and sum(r["n_records"] for r in rows) == 41
    segs = sorted(glob.glob(f"{out_dir}/segment_p*.warc.gz"))
    assert segs == sorted(r["segment"] for r in rows)

    back = read_warc(spark, f"{out_dir}/*.warc.gz")
    want = {
        (r["record_id"], r["target_uri"], bytes(r["payload"]))
        for r in recs.collect()
    }
    got = {
        (r["record_id"], r["target_uri"], bytes(r["payload"]))
        for r in back.collect()
    }
    assert got == want

    # gzip_mode=None plain segments parse too
    plain_dir = str(tmp_path / "plain")
    write_warc_distributed(recs, plain_dir, gzip_mode=None).collect()
    assert read_warc(spark, f"{plain_dir}/*.warc").count() == 41

    # WET shards through the same writer, lineage preserved
    html = spark.createDataFrame(
        [
            (
                "s",
                "response",
                f"<urn:uuid:h{i}>",
                f"https://example.org/h{i}",
                "2026-01-01T00:00:00Z",
                "text/html",
                0,
                f"<html><body><p>hola {i}</p></body></html>".encode(),
            )
            for i in range(6)
        ],
        "source_file string, warc_type string, record_id string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, payload binary",
    )
    wet_dir = str(tmp_path / "wet")
    write_warc_distributed(to_wet(html).repartition(2), wet_dir).collect()
    wet = read_warc(spark, f"{wet_dir}/*.warc.gz")
    assert wet.count() == 6
    assert wet.filter(F.col("warc_type") == "conversion").count() == 6
    texts = {bytes(r["payload"]).decode() for r in wet.collect()}
    assert any("hola 3" in t for t in texts)
    # Refers-To lineage survives in the written bytes
    seg = glob.glob(f"{wet_dir}/*.warc.gz")[0]
    hdrs = [h for h, _ in parse_warc_bytes(open(seg, "rb").read())]
    assert all(
        h.get("WARC-Refers-To", "").startswith("<urn:uuid:h") for h in hdrs
    )
