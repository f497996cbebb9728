"""Multimodal-column plumbing (SURVEY.md §2.K, BASELINE.json north star).

Image/audio/video payloads are OPAQUE BINARY columns with a typed metadata
struct — the layout a 100 TB multimodal corpus uses (payload bytes in
parquet, metadata queryable without touching payloads, so column pruning
keeps metadata-only scans cheap). The fixture set has no real media, so a
deterministic payload is fabricated from documents.text (utf-8 bytes) and
every byte-level transform is exact and replayable.

The decode / feature-extract / resize / frame-sample ladder runs as
Arrow-batched mapInPandas — the real plumbing (schema, partitioning, UDF
signature, batch shape). The resize step uses a VENDORED pure-numpy
bilinear codec (_bilinear_resize_bytes — real resampling math,
deterministic in every environment; no optional-import branch); the
remaining decode steps are clearly-marked deterministic byte math over
the same payloads. Swapping in a real media decoder (PIL/ffmpeg, absent
in this container) changes ONE function body, no plan shape.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
gather on the driver; per-type rollups aggregate metadata columns only
(payload pruned from the scan); frame sampling emits rows proportional to
sampled frames, not payload size.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register

_MEDIA_TYPES = ("image", "audio", "video")
_FRAME_BYTES = 64
_FRAME_STRIDE = 4

_SQL_MEDIA_TYPE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, media_type, meta struct, payload binary).

    The payload is the utf-8 encoding of the text; metadata is derived
    deterministically (fake dims keyed off doc_id) — stands in for the
    (payload, exif/probe metadata) pair a real ingest job lands."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
        payload.alias("payload"),
    )


@register(
    "mm_binary_metadata",
    category="multimodal",
    oracle=f"""
SELECT {_SQL_MEDIA_TYPE} AS media_type,
       COUNT(*) AS n,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX(doc_id % 640 + 16) AS max_width
FROM documents
GROUP BY 1
""",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over the multimodal table: per media type,
    count / total payload bytes / max width. The payload column is pruned
    from the scan (metadata lives in its own parquet columns at scale)."""
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
    )


def _decode_payload(payload: bytes) -> list[int]:
    """STUB decoder. A real deployment decodes payload -> pixel/sample
    array here (PIL / libsndfile / pyav — not in this container). The
    deterministic fake treats the raw bytes as the decoded samples, which
    keeps every downstream feature exact and testable."""
    return list(payload)


@register(
    "mm_decode_features",
    category="multimodal",
    oracle=f"""
SELECT doc_id,
       {_SQL_MEDIA_TYPE} AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE list_aggregate(list_transform(range(1, length(text) + 1),
                                               i -> ord(text[i])), 'sum')
                 / CAST(length(text) AS DOUBLE) END AS mean_sample,
       CAST(CASE WHEN length(text) = 0 THEN 0
            ELSE list_aggregate(list_transform(range(1, length(text) + 1),
                                               i -> ord(text[i])), 'max')
            END AS BIGINT) AS max_sample,
       md5(text) AS checksum
FROM documents
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract as Arrow-batched mapInPandas: per doc,
    emit (n_samples, mean_sample, max_sample, checksum). Upgraded from
    rows-only to a full SQL oracle in round 3: the deterministic fake
    decode is byte math DuckDB can replay (ord() over the ASCII corpus,
    md5 of the same UTF-8 bytes), so even the Python codec path is
    hash-checked end to end."""
    m = media_table(spark, sf_dir).select("doc_id", "media_type", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples = pdf["payload"].map(_decode_payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_samples": samples.map(len),
                    "mean_sample": samples.map(
                        lambda s: float(sum(s)) / len(s) if s else 0.0
                    ),
                    "max_sample": samples.map(lambda s: max(s) if s else 0),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return m.mapInPandas(
        extract,
        schema=(
            "doc_id long, media_type string, n_samples long, "
            "mean_sample double, max_sample long, checksum string"
        ),
    )


def _bilinear_resize_bytes(
    payload: bytes, w: int, h: int, tw: int, th: int
) -> bytes:
    """Vendored pure-numpy bilinear codec: rasterize the payload bytes as
    a (h, w) 8-bit grayscale image (np.resize tiles/truncates
    deterministically to w*h pixels) and bilinear-resample to (tw, th)
    with pixel-center sampling and edge replication — the same math class
    as PIL's Image.BILINEAR, but with zero external dependency, so the
    thumbnail bytes are identical in EVERY environment (the earlier
    PIL-when-importable branch made results environment-dependent and
    left an importorskip'd test). Output is always tw*th bytes."""
    import numpy as np

    arr = (
        np.resize(np.frombuffer(payload, dtype=np.uint8), w * h)
        .reshape(h, w)
        .astype(np.float64)
    )
    xs = (np.arange(tw) + 0.5) * (w / tw) - 0.5
    ys = (np.arange(th) + 0.5) * (h / th) - 0.5
    x0f = np.floor(xs)
    y0f = np.floor(ys)
    fx = xs - x0f
    fy = ys - y0f
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, w - 1)
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, h - 1)
    top = arr[y0][:, x0] * (1.0 - fx) + arr[y0][:, x1] * fx
    bot = arr[y1][:, x0] * (1.0 - fx) + arr[y1][:, x1] * fx
    out = top * (1.0 - fy)[:, None] + bot * fy[:, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8).tobytes()


def mm_resize_stub_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-thumbnail over image payloads via the vendored bilinear
    codec (_bilinear_resize_bytes — deterministic on every worker, no
    import probe). The Spark-side contract is fixed: mapInPandas in,
    (doc_id, out_w, out_h, out_payload, out_bytes) out; swapping in a
    real media decoder changes one function body, no plan shape."""
    target_w, target_h = 64, 64
    m = (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "image")
        .select("doc_id", "meta", "payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.Series(
                [
                    _bilinear_resize_bytes(
                        b, meta["width"], meta["height"], target_w, target_h
                    )
                    for b, meta in zip(pdf["payload"], pdf["meta"])
                ],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": target_w,
                    "out_h": target_h,
                    "out_payload": out,
                    "out_bytes": out.map(len),
                }
            )

    return m.mapInPandas(
        resize,
        schema=(
            "doc_id long, out_w int, out_h int, out_payload binary, "
            "out_bytes long"
        ),
    )


@register(
    "mm_resize_stub",
    category="multimodal",
    oracle="""
SELECT COUNT(*) AS n_images, TRUE AS dims_ok, TRUE AS payload_ok
FROM documents WHERE doc_id % 3 = 0
""",
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable resize contract: exactly one output row per
    image doc (doc_id % 3 = 0 — exact count), every thumbnail is 64x64,
    and every payload is EXACTLY 64*64 bytes matching its recorded
    length (the vendored bilinear codec always emits tw*th bytes, so the
    size is part of the hash-checked contract — tighter than the old
    codec-dependent non-empty check). A batching bug (dropped rows), a
    dimension bug, or a payload/length mismatch all hash-fail. The
    thumbnail bytes themselves are mm_resize_stub_raw (determinism and
    codec math pytest-asserted)."""
    out = mm_resize_stub_raw(spark, sf_dir)
    stats = out.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min((F.col("out_w") == 64) & (F.col("out_h") == 64)).alias("dims"),
        F.min(
            (F.col("out_bytes") == 64 * 64)
            & (F.col("out_bytes") == F.octet_length("out_payload"))
        ).alias("payload"),
    )
    return stats.select(
        "n_images",
        F.col("dims").alias("dims_ok"),
        F.col("payload").alias("payload_ok"),
    )


@register(
    "mm_frame_sample",
    category="multimodal",
    oracle=f"""
WITH v AS (
  SELECT doc_id, text,
         CAST(ceil(octet_length(encode(text)) / {_FRAME_BYTES}.0) AS INT) AS nf
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id,
       CAST(t.i AS INT) AS frame_idx,
       CAST(octet_length(encode(substr(text, t.i * {_FRAME_BYTES} + 1,
                                       {_FRAME_BYTES}))) AS INT) AS frame_len,
       md5(substr(text, t.i * {_FRAME_BYTES} + 1, {_FRAME_BYTES})) AS frame_md5
FROM v, UNNEST(range(0, nf, {_FRAME_STRIDE})) AS t(i)
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads: split the byte stream into
    fixed 64-byte 'frames', keep every 4th, EXPLODE to one row per kept
    frame (the fan-out shape of real video sampling — output rows scale
    with sampled frames, and each Arrow batch yields its frames without
    driver involvement). Upgraded from rows-only to a full SQL oracle in
    round 3: frames project to (length, md5) and DuckDB replays the same
    byte windows with substr over the ASCII corpus."""
    m = (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = -(-len(payload) // _FRAME_BYTES)
                for i in range(0, n_frames, _FRAME_STRIDE):
                    frame = payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_md5": md5s,
                }
            )

    return m.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_len int, frame_md5 string"
    )


_PHASH_SQL = """
WITH base AS (
  SELECT doc_id, text, octet_length(encode(text)) AS L
  FROM documents
),
pre AS (
  SELECT doc_id,
         CASE WHEN L >= 64
              THEN list_transform(range(1, L + 1), i -> ord(text[i]))
              ELSE list_concat(
                     list_transform(range(1, L + 1), i -> ord(text[i])),
                     list_transform(range(1, 64 - L + 1), i -> 0))
         END AS b,
         greatest(L, 64) // 64 AS q,
         greatest(L, 64) % 64 AS r
  FROM base
),
sums AS (
  SELECT doc_id, q, r,
         list_transform(range(0, 64), i ->
           list_aggregate(
             b[i * q + least(i, r) + 1 :
               i * q + least(i, r) + q + CASE WHEN i < r THEN 1 ELSE 0 END],
             'sum')) AS bs
  FROM pre
),
scored AS (
  SELECT doc_id, q, r, bs,
         list_aggregate(
           list_transform(range(0, 64), j ->
             bs[j + 1] * (q + CASE WHEN j < r THEN 0 ELSE 1 END)), 'sum') AS S
  FROM sums
),
bits AS (
  SELECT doc_id,
         list_transform(range(0, 64), i ->
           CASE WHEN bs[i + 1] * 64 * q * (q + 1)
                     > S * (q + CASE WHEN i < r THEN 1 ELSE 0 END)
                THEN 1 ELSE 0 END) AS bv
  FROM scored
),
ph AS (
  SELECT doc_id,
         CAST(-bv[1] * CAST(9223372036854775808 AS HUGEINT)
              + list_aggregate(
                  list_transform(range(1, 64), i ->
                    CAST(bv[i + 1] AS HUGEINT)
                    * (CAST(1 AS HUGEINT) << (63 - i))), 'sum')
              AS BIGINT) AS phash
  FROM bits
),
u AS (
  SELECT doc_id, phash,
         CAST(phash AS HUGEINT) + CAST(9223372036854775808 AS HUGEINT) AS uh
  FROM ph
),
bands AS (
  SELECT doc_id, phash, t.i AS band,
         CAST((uh // (CASE t.i WHEN 0 THEN 1 WHEN 1 THEN 65536
                      WHEN 2 THEN 4294967296
                      ELSE 281474976710656 END)) % 65536 AS BIGINT) AS key
  FROM u, UNNEST(range(0, 4)) AS t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.phash AS pa, b.phash AS pb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= 3
"""


@register("mm_phash_dedup", category="multimodal", oracle=_PHASH_SQL, heavy=True)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate candidates over the media table: a
    64-bit pHash-style signature from the decoded sample stream (block
    means vs global mean — the standard aHash/pHash construction, here on
    the deterministic fake decode), then 4x16-bit pigeonhole banding for
    hamming<=3 candidate pairs — the dedup_simhash machinery applied to
    multimodal payloads.

    Scale shape: signature extraction is one Arrow-batched pass (no
    shuffle); candidates come from 4 equi-joins on (band, 16-bit key) —
    only same-bucket payloads ever meet. Upgraded from rows-only to a
    full SQL oracle in round 3: the bit test is EXACT integer arithmetic
    (sum_i * 64q(q+1) > S * size_i over the common denominator instead of
    float block means), so DuckDB replays the identical signature,
    banding, and hamming refine end to end.
    """
    m = media_table(spark, sf_dir).select("doc_id", "payload")

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_h = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if len(data) < 64:
                    data = data + b"\x00" * (64 - len(data))
                L2 = len(data)
                q, r = L2 // 64, L2 % 64
                sums, pos = [], 0
                for i in range(64):
                    size = q + (1 if i < r else 0)
                    sums.append(sum(data[pos : pos + size]))
                    pos += size
                # S = sum_j block_mean_j scaled by the common denominator
                # q(q+1): mean_j = sums[j]/size_j -> factor q(q+1)/size_j
                S = sum(
                    sums[j] * (q if j < r else q + 1) for j in range(64)
                )
                h = 0
                for i in range(64):
                    size = q + (1 if i < r else 0)
                    bit = 1 if sums[i] * 64 * q * (q + 1) > S * size else 0
                    h = (h << 1) | bit
                out_ids.append(doc_id)
                out_h.append(h - (1 << 63))  # to signed long
            yield pd.DataFrame({"doc_id": out_ids, "phash": out_h})

    sigs = m.mapInPandas(phash, schema="doc_id long, phash long").localCheckpoint()
    # 4 x 16-bit pigeonhole bands: hamming<=3 pairs share at least one band
    bands = None
    for i in range(4):
        band_key = F.shiftrightunsigned(F.col("phash"), 16 * i).bitwiseAND(0xFFFF)
        b = sigs.select("doc_id", "phash", F.lit(i).alias("band"), band_key.alias("key"))
        bands = b if bands is None else bands.unionByName(b)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


_SCENE_CUT_DELTA = 500


@register(
    "mm_video_scene_cut",
    category="multimodal",
    oracle=f"""
WITH vids AS (
  SELECT doc_id, text, octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT v.doc_id, CAST(t.i AS INT) AS frame_idx,
         substr(v.text, t.i * {_FRAME_BYTES} + 1, {_FRAME_BYTES}) AS frame
  FROM vids v,
       LATERAL (SELECT unnest(range((v.L + {_FRAME_BYTES} - 1)
                                    // {_FRAME_BYTES})) AS i) t
),
energy AS (
  SELECT doc_id, frame_idx,
         CAST((SELECT COALESCE(SUM(ord(substr(frame, c.j + 1, 1))), 0)
               FROM (SELECT unnest(range(length(frame))) AS j) c)
              AS BIGINT) AS energy
  FROM frames
),
lagged AS (
  SELECT doc_id, frame_idx, energy,
         LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx)
           AS prev_energy
  FROM energy
)
SELECT doc_id, frame_idx, energy,
       energy - prev_energy AS delta,
       CASE WHEN prev_energy IS NULL THEN NULL
            ELSE abs(energy - prev_energy) > {_SCENE_CUT_DELTA} END
         AS is_cut
FROM lagged
""",
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video payloads: the Python decode stage
    (mapInPandas, Arrow-batched — where a real ffmpeg/pyav frame
    decoder slots in) emits one row per 64-byte frame with its energy
    (byte sum, the deterministic stand-in for a frame histogram), and
    the DETECTION runs as ordinary Spark — a lag window per video and
    a threshold on the energy delta. This split is the load-bearing
    design: Python touches bytes once, shuffle-free; the stateful
    cross-frame logic stays JVM-side where Catalyst can see it. The
    oracle replays the exact byte windows and sums over the ASCII
    corpus, so even the Python stage is hash-verified.

    Scale shape: decode is embarrassingly parallel over payload rows;
    the window shuffles on doc_id once, frames-per-video rows each."""
    m = (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
    )

    def frame_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, energies = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = -(-len(payload) // _FRAME_BYTES)
                for i in range(n_frames):
                    frame = payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    energies.append(sum(frame))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "energy": energies}
            )

    frames = m.mapInPandas(
        frame_energy, schema="doc_id long, frame_idx int, energy long"
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("energy").over(w)
    delta = F.col("energy") - prev
    return frames.select(
        "doc_id",
        "frame_idx",
        "energy",
        delta.alias("delta"),
        F.when(
            prev.isNotNull(), F.abs(delta) > _SCENE_CUT_DELTA
        ).alias("is_cut"),
    )


_SILENCE_MAX = 102  # bytes <= this ASCII code count as "silence"


@register(
    "mm_audio_silence_trim",
    category="multimodal",
    oracle=f"""
WITH aud AS (
  SELECT doc_id, text, octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 1
),
pos AS (
  SELECT doc_id, text, L,
         (SELECT COALESCE(MIN(i.n), L)
          FROM (SELECT unnest(range(L)) AS n) i
          WHERE ord(substr(text, i.n + 1, 1)) > {_SILENCE_MAX}) AS lead_n,
         (SELECT COALESCE(L - 1 - MAX(i.n), L)
          FROM (SELECT unnest(range(L)) AS n) i
          WHERE ord(substr(text, i.n + 1, 1)) > {_SILENCE_MAX}) AS trail_n
  FROM aud
)
SELECT doc_id, CAST(L AS BIGINT) AS n_samples,
       CAST(lead_n AS BIGINT) AS lead_trimmed,
       CAST(trail_n AS BIGINT) AS trail_trimmed,
       CAST(CASE WHEN lead_n >= L THEN 0
            ELSE L - lead_n - trail_n END AS BIGINT) AS kept_samples,
       CASE WHEN lead_n >= L THEN md5('')
            ELSE md5(substr(text, lead_n + 1, L - lead_n - trail_n))
       END AS kept_md5
FROM pos
""",
)
def mm_audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence trimming over audio payloads: strip leading and trailing
    low-amplitude samples (bytes under the threshold — the
    deterministic stand-in for an RMS gate) and report the trim
    geometry plus an md5 of the kept middle — the first preprocessing
    step of every speech pipeline, here with the byte-window replay
    oracle so the Python stage is hash-verified like mm_video_scene_cut.
    Degenerate cases are exercised: payloads that are all 'silence'
    keep zero samples.

    Scale shape: pure mapInPandas over payload rows, embarrassingly
    parallel, output one row per clip regardless of payload size."""
    m = (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "audio")
        .select("doc_id", "payload")
    )

    def trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_samples": [],
                "lead_trimmed": [],
                "trail_trimmed": [],
                "kept_samples": [],
                "kept_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                lead = next(
                    (i for i, x in enumerate(b) if x > _SILENCE_MAX), n
                )
                trail = next(
                    (i for i, x in enumerate(reversed(b)) if x > _SILENCE_MAX),
                    n,
                )
                if lead >= n:
                    kept = b""
                    lead_n, trail_n, kept_n = n, n, 0
                else:
                    kept = b[lead : n - trail]
                    lead_n, trail_n, kept_n = lead, trail, n - lead - trail
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["lead_trimmed"].append(lead_n)
                out["trail_trimmed"].append(trail_n)
                out["kept_samples"].append(kept_n)
                out["kept_md5"].append(hashlib.md5(kept).hexdigest())
            yield pd.DataFrame(out)

    return m.mapInPandas(
        trim,
        schema=(
            "doc_id long, n_samples long, lead_trimmed long, "
            "trail_trimmed long, kept_samples long, kept_md5 string"
        ),
    )


def _media_zone_oracle() -> str:
    from .geo import _ZONE

    n = len(_ZONE)
    edges = [(_ZONE[i], _ZONE[(i + 1) % n]) for i in range(n)]
    crosses = " AND ".join(
        f"(({xj}) - ({xi})) * (lat - ({yi}))"
        f" - (({yj}) - ({yi})) * (lon - ({xi})) >= 0"
        for (yi, xi), (yj, xj) in edges
    )
    return f"""
WITH media AS (
  SELECT doc_id, {_SQL_MEDIA_TYPE} AS media_type,
         octet_length(encode(text)) AS n_bytes,
         (25.0 + ((doc_id * 73) % 2300) / 100.0) AS lat,
         (-122.0 + ((doc_id * 37) % 5100) / 100.0) AS lon
  FROM documents
)
SELECT media_type, ({crosses}) AS in_zone,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS sample_doc
FROM media
GROUP BY media_type, ({crosses})
"""


@register(
    "mm_geo_tagged_media",
    category="multimodal",
    oracle=_media_zone_oracle(),
)
def mm_geo_tagged_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-tagged media triage — the reference's own domain ("Open
    Disaster Data Store"): media capture coordinates (the EXIF-GPS
    stand-in, same deterministic lattice as the geo family keyed on
    doc_id) tested against the evacuation-zone polygon
    (geo_point_in_polygon's convex half-plane test), rolled up per
    (media type, in/out of zone) with payload byte mass and a sample
    doc — the "what imagery do we have FROM INSIDE the zone" question
    an incident commander actually asks, composed entirely from
    verified pieces: the multimodal metadata table and the geo
    containment predicate.

    Scale shape: narrow projection + cross-product test + one
    map-combined rollup; payloads never load (metadata columns only)."""
    from .geo import _ZONE

    m = media_table(spark, sf_dir).select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        (25.0 + ((F.col("doc_id") * 73) % 2300) / 100.0).alias("lat"),
        (-122.0 + ((F.col("doc_id") * 37) % 5100) / 100.0).alias("lon"),
    )
    n = len(_ZONE)
    cond = None
    for i in range(n):
        (yi, xi), (yj, xj) = _ZONE[i], _ZONE[(i + 1) % n]
        edge = (
            (F.lit(xj) - F.lit(xi)) * (F.col("lat") - F.lit(yi))
            - (F.lit(yj) - F.lit(yi)) * (F.col("lon") - F.lit(xi))
        ) >= 0
        cond = edge if cond is None else (cond & edge)
    return m.select(
        "media_type", cond.alias("in_zone"), "n_bytes", "doc_id"
    ).groupBy("media_type", "in_zone").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.min("doc_id").alias("sample_doc"),
    )
