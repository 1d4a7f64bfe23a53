"""WARC (Web ARChive, ISO 28500) source — the format web crawls ship
in (Common Crawl's WARC/WAT/WET files), parsed by hand the way the
multimodal module parses RIFF/AVI: the container is simple enough
(text header block + Content-Length-framed payload) that a dependency
would buy nothing, and hand-framing keeps the byte math testable.

Scale shape: one WARC segment file = one row of
``spark.read.format("binaryFile")`` (crawl segments are ~1 GB by
convention, well under the 2 GB binaryFile ceiling), and parsing is an
Arrow ``mapInPandas`` stage — per-file sequential record walk, no
shuffle; downstream filtering/extraction (html_extract, langid,
dedup) runs on the emitted rows. Gzip segments (.warc.gz) decompress
in-stage via zlib; per-RECORD gzip members (the Common Crawl layout)
also work — zlib consumes one member at a time and reports the byte
offset where the next begins.

Record framing (WARC/1.0): ``WARC/1.0\\r\\n`` + header lines +
``\\r\\n`` + exactly Content-Length payload bytes + ``\\r\\n\\r\\n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WARC_FIELDS = (
    "warc_type",
    "record_id",
    "target_uri",
    "warc_date",
    "content_type",
)

_SCHEMA = (
    "source_file string, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary"
)


def warc_record(headers: dict, payload: bytes) -> bytes:
    """Frame one WARC/1.0 record (writer half — used by the sink and
    the tests' synthesized segments). ``Content-Length`` is computed,
    not caller-supplied."""
    head = "WARC/1.0\r\n"
    for k, v in headers.items():
        head += f"{k}: {v}\r\n"
    head += f"Content-Length: {len(payload)}\r\n\r\n"
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def parse_warc_bytes(data: bytes):
    """Yield (headers dict, payload bytes) per record from one segment.

    Accepts plain concatenated records, a whole-file gzip member, or
    concatenated per-record gzip members (Common Crawl); gzip is
    detected by magic. Tolerates trailing garbage and stops at the
    first frame that no longer parses (crawl files are append-streams;
    a truncated tail record is normal after a crawler crash).
    """
    import zlib

    if data[:2] == b"\x1f\x8b":  # gzip member(s)
        out = bytearray()
        pos = 0
        while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            out += d.decompress(data[pos:])
            pos = len(data) - len(d.unused_data)
            if not d.eof:  # truncated member: keep what decompressed
                break
        data = bytes(out)

    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict = {}
        lines = data[start:hdr_end].decode("utf-8", errors="replace").split("\r\n")
        for line in lines[1:]:
            if ": " in line:
                k, v = line.split(": ", 1)
                headers[k.strip()] = v.strip()
        try:
            clen = int(headers.get("Content-Length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > len(data):
            return  # truncated tail record
        yield headers, data[body_start:body_end]
        pos = body_end


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC segment(s) into rows: (source_file, warc_type,
    record_id, target_uri, warc_date, content_type, content_length,
    payload). One binaryFile row per segment, one Arrow stage to
    records, no shuffle."""
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(str(fpath))
                for headers, payload in parse_warc_bytes(bytes(content)):
                    rows.append(
                        {
                            "source_file": name,
                            "warc_type": headers.get("WARC-Type"),
                            "record_id": headers.get("WARC-Record-ID"),
                            "target_uri": headers.get("WARC-Target-URI"),
                            "warc_date": headers.get("WARC-Date"),
                            "content_type": headers.get("Content-Type"),
                            "content_length": len(payload),
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_file",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, schema=_SCHEMA)


def to_wet(records: DataFrame) -> DataFrame:
    """WARC response records → WET "conversion" records (Common
    Crawl's extracted-text sibling format): HTML payloads run through
    :func:`..functions.html.html_to_text` (the scan-local regex
    chain), non-response records drop, and the header fields are
    rewritten per the WET convention — ``warc_type='conversion'``,
    ``WARC-Refers-To`` carrying the source record id, text/plain
    content type, UTF-8 payload. Stays a pure DataFrame transform so a
    crawl-scale WARC→WET pass is scan + projection, no shuffle."""
    from pyspark.sql import functions as F

    from ..functions.html import html_to_text

    text = html_to_text(F.col("payload").cast("string"))
    return (
        records.filter(F.col("warc_type") == "response")
        .withColumn("__t", text)
        .select(
            "source_file",
            F.lit("conversion").alias("warc_type"),
            # the source id is already bracketed ('<urn:uuid:...>');
            # strip before embedding so the conversion id stays a valid
            # ISO 28500 '<uri>' (no nested angle brackets) — lineage to
            # the source record rides in refers_to, as in real WET files
            F.concat(
                F.lit("<urn:wet:"),
                F.regexp_replace(F.col("record_id"), "^<|>$", ""),
                F.lit(">"),
            ).alias("record_id"),
            "target_uri",
            "warc_date",
            F.lit("text/plain").alias("content_type"),
            F.length(F.encode(F.col("__t"), "utf-8")).cast("long").alias(
                "content_length"
            ),
            F.encode(F.col("__t"), "utf-8").alias("payload"),
            F.col("record_id").alias("refers_to"),
        )
    )


def write_warc(records: list[tuple[dict, bytes]], path: str, gzip_mode: str | None = None) -> None:
    """Write framed records to ONE segment file (driver-side writer —
    segments are the unit crawls ship in; a distributed crawl writes
    one segment per task the same way). ``gzip_mode``: None (plain),
    "file" (one member), "record" (one member per record — the Common
    Crawl layout)."""
    import gzip as _gzip

    if gzip_mode not in (None, "file", "record"):
        raise ValueError(f"write_warc: bad gzip_mode {gzip_mode!r}")
    frames = [warc_record(h, p) for h, p in records]
    if gzip_mode == "record":
        blob = b"".join(
            _gzip.compress(f, compresslevel=6, mtime=0) for f in frames
        )
    elif gzip_mode == "file":
        blob = _gzip.compress(b"".join(frames), compresslevel=6, mtime=0)
    else:
        blob = b"".join(frames)
    with open(path, "wb") as fh:
        fh.write(blob)


def write_warc_distributed(
    records: DataFrame,
    out_dir: str,
    gzip_mode: str | None = "record",
    prefix: str = "segment",
) -> DataFrame:
    """EXECUTOR-side WARC export: each task frames its partition's
    records into ONE segment file ``{out_dir}/{prefix}_p{pid}.warc
    [.gz]`` and emits a one-row manifest (segment, n_records,
    n_bytes) — no driver collect anywhere, segment count = partition
    count, so exporting a filtered 100 TB corpus scales with the
    executors exactly like :func:`..operators.multimodal.
    write_blob_store_distributed` (same task-owns-its-file pattern,
    same determinism caveats: a retried task truncates and reproduces
    identical bytes from its deterministic input partition; keep
    speculative execution off for the export stage). The driver-side
    :func:`write_warc` remains for single-segment/test use.

    ``records`` needs the :func:`read_warc` columns (``warc_type
    record_id target_uri warc_date content_type payload``); a
    ``refers_to`` column (WET conversion records, :func:`to_wet`)
    rides along as ``WARC-Refers-To``, so a crawl→WET pipeline writes
    shards with the same call. ``gzip_mode`` as in :func:`write_warc`
    ("record" default — the Common Crawl layout, and what
    :func:`parse_warc_bytes` round-trips member by member).

    Returns the manifest DataFrame — an ACTION-free plan; the caller
    triggers the export by consuming it (collect/write), which is also
    what makes the export restartable as a unit.
    """
    import gzip as _gzip
    import os

    import pandas as pd

    if gzip_mode not in (None, "file", "record"):
        raise ValueError(f"write_warc_distributed: bad gzip_mode {gzip_mode!r}")
    has_refers = "refers_to" in records.columns
    cols = [
        "warc_type",
        "record_id",
        "target_uri",
        "warc_date",
        "content_type",
        "payload",
    ] + (["refers_to"] if has_refers else [])
    ext = ".warc.gz" if gzip_mode else ".warc"

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}_p{pid:05d}{ext}")
        fh = None
        n_rec = n_bytes = 0
        plain: list[bytes] = []  # only used for gzip_mode="file"
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fh is None:
                os.makedirs(out_dir, exist_ok=True)
                fh = open(path, "wb")
            for row in pdf.itertuples(index=False):
                headers = {
                    "WARC-Type": row.warc_type,
                    "WARC-Record-ID": row.record_id,
                    "WARC-Target-URI": row.target_uri,
                    "WARC-Date": row.warc_date,
                    "Content-Type": row.content_type,
                }
                if has_refers:
                    headers["WARC-Refers-To"] = row.refers_to
                headers = {k: v for k, v in headers.items() if v is not None}
                frame = warc_record(headers, bytes(row.payload))
                if gzip_mode == "record":
                    blob = _gzip.compress(frame, compresslevel=6, mtime=0)
                elif gzip_mode == "file":
                    plain.append(frame)
                    blob = b""
                else:
                    blob = frame
                fh.write(blob)
                n_rec += 1
                n_bytes += len(blob)
            fh.flush()
        if fh is not None:
            if gzip_mode == "file":
                blob = _gzip.compress(
                    b"".join(plain), compresslevel=6, mtime=0
                )
                fh.write(blob)
                n_bytes = len(blob)
            fh.close()
            yield pd.DataFrame(
                [{"segment": path, "n_records": n_rec, "n_bytes": n_bytes}]
            )

    return records.select(*cols).mapInPandas(
        run, schema="segment string, n_records long, n_bytes long"
    )
