"""Multimodal wave 2: audio (WAV), video (MP4), and image-metadata
(TIFF/EXIF) container decode — oracle-gated like the image formats.

Same verification shape as ``multimodal.py``'s pixel operators: each
document synthesizes a REAL container (``functions/containers.py``
encoders) whose contents derive arithmetically from ``doc_id``, the
REAL byte-level parser decodes it inside an Arrow-batched
``mapInPandas`` kernel, and the DuckDB oracle recomputes the expected
values from the same arithmetic — so the RIFF chunk walker, the
ISO-BMFF box recursion, and the TIFF IFD walker are verified
value-exactly on every row. All three are one Arrow pass, zero
shuffle, linear at 100 TB; on a real lake the synth step is replaced
by stored payload bytes and the kernel seam is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table


@query(
    "multimodal_wav_decode",
    oracle="""
    WITH pcm AS (
        SELECT doc_id,
               (doc_id * 7 + t.i * 13) % 4096 - 2048 AS s
        FROM documents,
             unnest(range(0, 64 + doc_id % 129)) AS t(i))
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(s) AS BIGINT) AS peak
    FROM pcm GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "llm-pipeline"),
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE decode under the oracle gate: each document
    synthesizes a PCM16 WAV (``encode_wav``: RIFF header, fmt chunk,
    word-aligned data chunk) whose samples derive arithmetically from
    ``doc_id``, then ``decode_wav`` walks the chunks back and the
    emitted loudness statistics come from the DECODED int16 samples.
    int16 covers the ±2048 synth range exactly, and every statistic
    is integer arithmetic — bit-identical to the oracle's recompute."""
    import numpy as np

    from watermill_kinesis_spark.functions.containers import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "sum_abs", "energy", "peak"
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 129
                s = ((did * 7 + np.arange(n, dtype=np.int64) * 13) % 4096 - 2048)
                payload = encode_wav(s.astype(np.int16), 8000 + (did % 3) * 4000)
                rate, ch, dec = decode_wav(payload)  # the real chunk walker
                assert ch == 1 and dec.shape == (n, 1)
                v = dec[:, 0].astype(np.int64)
                out["doc_id"].append(did)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(v))
                out["sum_abs"].append(int(np.abs(v).sum()))
                out["energy"].append(int((v * v).sum()))
                out["peak"].append(int(v.max()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_decode,
        "doc_id long, sample_rate long, n_samples long, "
        "sum_abs long, energy long, peak long",
    )


@query(
    "multimodal_mp4_probe",
    oracle="""
    SELECT doc_id,
           'isom' AS brand,
           CAST(600 + (doc_id % 5) * 200 AS BIGINT) AS timescale,
           CAST(n_chars * 100 AS BIGINT) AS duration,
           CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
           CAST(n_chars * 100 * 1000 // (600 + (doc_id % 5) * 200) AS BIGINT)
               AS duration_ms
    FROM documents
    """,
    tags=("multimodal", "video", "llm-pipeline"),
)
def multimodal_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF (MP4) probing under the oracle gate: each
    document synthesizes a valid box tree (``encode_mp4``: ftyp +
    moov{mvhd + trak×k}) with movie timescale/duration/track-count
    derived arithmetically from ``doc_id``/``n_chars``, and
    ``probe_mp4`` recovers them by WALKING THE BOXES (size+type
    headers, container recursion, mvhd v0/v1 layouts) — the media-
    catalog indexing pass a video lake runs before any frame decode.
    duration_ms is exact integer division on both engines."""
    from watermill_kinesis_spark.functions.containers import encode_mp4, probe_mp4

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth_probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "brand", "timescale", "duration", "n_tracks", "duration_ms"
            )}
            for did, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did, n_chars = int(did), int(n_chars)
                ts = 600 + (did % 5) * 200
                dur = n_chars * 100
                payload = encode_mp4(ts, dur, 1 + did % 3)
                info = probe_mp4(payload)  # the real box walker
                out["doc_id"].append(did)
                out["brand"].append(info["brand"])
                out["timescale"].append(info["timescale"])
                out["duration"].append(info["duration"])
                out["n_tracks"].append(info["n_tracks"])
                out["duration_ms"].append(info["duration"] * 1000 // info["timescale"])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_probe,
        "doc_id long, brand string, timescale long, duration long, "
        "n_tracks long, duration_ms long",
    )


#: EXIF tag numbers (TIFF 6.0 / EXIF 2.3 baseline)
TAG_IMAGE_WIDTH = 0x0100
TAG_IMAGE_LENGTH = 0x0101
TAG_ORIENTATION = 0x0112


@query(
    "multimodal_exif_orientation",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
           CAST(160 + (doc_id % 11) * 16 AS BIGINT) AS width,
           CAST(120 + (doc_id % 7) * 16 AS BIGINT) AS height,
           CAST(1 + doc_id % 8 AS BIGINT) AS orientation
    FROM documents
    """,
    tags=("multimodal", "exif", "llm-pipeline"),
)
def multimodal_exif_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF/EXIF IFD metadata extraction under the oracle gate:
    each document synthesizes a minimal TIFF (``encode_tiff``) in a
    byte order cycled by parity — little-endian ``II`` and big-endian
    ``MM`` rows both flow through the gate — carrying
    ImageWidth/ImageLength (LONG) and Orientation (SHORT, the one EXIF
    field every image pipeline must respect before resizing), and
    ``decode_tiff_tags`` walks IFD0's 12-byte entries to recover them.
    All eight EXIF orientation values appear across the corpus."""
    from watermill_kinesis_spark.functions.containers import (
        decode_tiff_tags,
        encode_tiff,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth_walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "byte_order", "width", "height", "orientation"
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                big = did % 2 == 1
                payload = encode_tiff(
                    {
                        TAG_IMAGE_WIDTH: (4, 160 + (did % 11) * 16),
                        TAG_IMAGE_LENGTH: (4, 120 + (did % 7) * 16),
                        TAG_ORIENTATION: (3, 1 + did % 8),
                    },
                    big_endian=big,
                )
                tags = decode_tiff_tags(payload)  # the real IFD walker
                out["doc_id"].append(did)
                out["byte_order"].append("MM" if big else "II")
                out["width"].append(tags[TAG_IMAGE_WIDTH])
                out["height"].append(tags[TAG_IMAGE_LENGTH])
                out["orientation"].append(tags[TAG_ORIENTATION])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_walk,
        "doc_id long, byte_order string, width long, height long, orientation long",
    )


@query(
    "multimodal_gif_animation_probe",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 4 AS BIGINT) AS n_frames,
           CAST(4 + doc_id % 6 AS BIGINT) AS frame_delay_cs,
           CAST((1 + doc_id % 4) * (4 + doc_id % 6) AS BIGINT)
               AS total_delay_cs,
           CAST((1 + doc_id % 4) * (4 + doc_id % 6) * 10 AS BIGINT)
               AS duration_ms,
           CAST(doc_id % 3 AS BIGINT) AS loops
    FROM documents
    """,
    tags=("multimodal", "video", "llm-pipeline"),
)
def multimodal_gif_animation_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF block-stream walking under the oracle gate:
    each document synthesizes a multi-frame GIF89a
    (``encode_animated_gif``: NETSCAPE loop extension + per-frame
    Graphic Control Extensions + LZW image data) with frame count,
    delay, and loop count derived arithmetically from ``doc_id``, and
    ``probe_gif_animation`` recovers them by WALKING THE BLOCKS —
    sub-block skipping, GCE delay accumulation, app-extension parse —
    without decoding any pixels (the animation-index pass of a media
    catalog; frame-level pixel decode stays ``decode_gif``'s job).
    One Arrow pass, zero shuffle, linear at 100 TB."""
    import numpy as np

    from watermill_kinesis_spark.functions.containers import (
        encode_animated_gif,
        probe_gif_animation,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]

    def synth_probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "n_frames",
                    "frame_delay_cs",
                    "total_delay_cs",
                    "duration_ms",
                    "loops",
                )
            }
            for did in pdf["doc_id"]:
                did = int(did)
                k = 1 + did % 4
                delay = 4 + did % 6
                frames = [
                    np.full((8, 8), (did + f) % 4, dtype=np.uint8)
                    for f in range(k)
                ]
                payload = encode_animated_gif(
                    frames, pal, [delay] * k, loops=did % 3
                )
                info = probe_gif_animation(payload)  # the real block walker
                out["doc_id"].append(did)
                out["n_frames"].append(info["n_frames"])
                out["frame_delay_cs"].append(delay)
                out["total_delay_cs"].append(info["total_delay_cs"])
                out["duration_ms"].append(info["total_delay_cs"] * 10)
                out["loops"].append(info["loops"])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_probe,
        "doc_id long, n_frames long, frame_delay_cs long, "
        "total_delay_cs long, duration_ms long, loops long",
    )


@query(
    "multimodal_png_text_probe",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 16 AS BIGINT) AS width,
           CAST(1 + doc_id % 9 AS BIGINT) AS height,
           CAST(5 AS BIGINT) AS n_chunks,
           'Title=doc-' || CAST(doc_id AS VARCHAR) || ';Source=' || source
               AS text_meta
    FROM documents
    """,
    tags=("multimodal", "image", "llm-pipeline"),
)
def multimodal_png_text_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG chunk-stream walking with CRC verification under the
    oracle gate: each document synthesizes a valid PNG
    (``encode_png_text``: IHDR + tEXt metadata + real zlib IDAT +
    IEND, every chunk CRC32-sealed) carrying Title/Source text chunks
    derived from the row, and ``probe_png_chunks`` walks the chunks
    back, RECOMPUTING every CRC (a flipped bit anywhere raises into
    the corrupt-skip contract) and extracting the metadata pairs —
    the ingest-integrity + sidecar-metadata pass of an image lake.
    One Arrow pass, zero shuffle."""
    from watermill_kinesis_spark.functions.containers import (
        encode_png_text,
        probe_png_chunks,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def synth_walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "n_chunks", "text_meta")}
            for did, src in zip(pdf["doc_id"], pdf["source"]):
                did = int(did)
                w, h = 1 + did % 16, 1 + did % 9
                payload = encode_png_text(
                    w, h, [("Title", f"doc-{did}"), ("Source", str(src))]
                )
                info = probe_png_chunks(payload)  # CRC-verified walk
                out["doc_id"].append(did)
                out["width"].append(info["width"])
                out["height"].append(info["height"])
                out["n_chunks"].append(info["n_chunks"])
                out["text_meta"].append(
                    ";".join(f"{k}={v}" for k, v in info["texts"])
                )
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_walk,
        "doc_id long, width long, height long, n_chunks long, text_meta string",
    )


@query(
    "multimodal_id3_tag_probe",
    oracle="""
    SELECT doc_id,
           'track-' || CAST(doc_id AS VARCHAR) AS title,
           source AS artist,
           CAST(2 AS BIGINT) AS n_frames,
           CAST(10 + (10 + 1 + 6 + length(CAST(doc_id AS VARCHAR)))
                + (10 + 1 + length(source))
                + 16 AS BIGINT) AS tag_bytes
    FROM documents
    """,
    tags=("multimodal", "audio", "llm-pipeline"),
)
def multimodal_id3_tag_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ID3v2.3 tag walking under the oracle gate: each document
    synthesizes a spec-valid tag (``encode_id3v2``: synchsafe header
    size, 32-bit frame sizes, latin-1 text frames, zero padding) with
    title/artist derived from the row, and ``probe_id3v2`` recovers
    them by WALKING THE FRAMES — the music-catalog metadata pass that
    indexes an audio lake before any sample decode. The oracle
    recomputes the title/artist strings AND the exact byte-level tag
    size (header 10 + per-frame 10+1+text + padding 16) from the same
    row arithmetic, so the synchsafe size round-trip is value-checked
    per row. One Arrow pass, zero shuffle."""
    from watermill_kinesis_spark.functions.containers import (
        encode_id3v2,
        probe_id3v2,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def synth_walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "title", "artist", "n_frames", "tag_bytes")}
            for did, src in zip(pdf["doc_id"], pdf["source"]):
                did, src = int(did), str(src)
                payload = encode_id3v2(
                    [("TIT2", f"track-{did}"), ("TPE1", src)]
                )
                info = probe_id3v2(payload)  # the real frame walker
                frames = dict(info["frames"])
                out["doc_id"].append(did)
                out["title"].append(frames["TIT2"])
                out["artist"].append(frames["TPE1"])
                out["n_frames"].append(len(info["frames"]))
                out["tag_bytes"].append(info["tag_bytes"])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_walk,
        "doc_id long, title string, artist string, n_frames long, tag_bytes long",
    )
