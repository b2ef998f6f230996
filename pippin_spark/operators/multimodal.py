"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension).

Codec policy: ``fake=True`` (default here) runs a deterministic
stand-in decoder so the plumbing is fully testable in codec-less
containers. ``fake=False`` routes images through PIL when it is
importable on the executors (detected inside the UDF closure at run
time, never at module import) and raises NotImplementedError
otherwise; audio/video always require ffmpeg, which has no pure-Python
fallback, so they stay stubbed. Everything Spark-side — schema,
partition-preserving mapInPandas, Arrow batch shapes, metadata
projection — is identical on every path.

Scale notes: media bytes ride as BinaryType columns; decode runs as
mapInPandas so each Arrow batch amortizes Python crossing; byte-heavy
stages should repartition by size (``target_rows_per_batch``) before
the UDF, and metadata-only queries never touch the binary column
(column pruning keeps it out of the scan).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pippin_spark.operators.util import ensure_parallelism

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str, id_col: str, kind: str = "image") -> DataFrame:
    """Derive a deterministic binary media column from text (test/bench
    stand-in for reading real blobs): content = utf-8 bytes; metadata
    filled from the bytes."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            F.lit(f"{kind}/fake").alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow-batched).

    fake=True runs the deterministic stand-in. fake=False decodes
    images with PIL when the executors have it (checked inside the
    UDF, so a cluster with pillow installed gets the real path with no
    code change) — feature is an 8-bin grayscale histogram, width and
    height the real pixel dims. Audio/video need ffmpeg and raise
    NotImplementedError either way."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NB: self-contained closure (no pippin_spark imports) so the
        # pickled UDF runs on executors that don't have the package
        # on their PYTHONPATH
        import hashlib as _hl

        import pandas as _pd

        if not fake:
            try:
                import io as _io

                from PIL import Image as _Image
            except ImportError:
                _Image = None

        def _decode(media_id, kind, content):
            digest = _hl.md5(content or b"").digest()
            width = 64 + digest[0] % 192
            height = 64 + digest[1] % 192
            duration = (digest[2] << 8 | digest[3]) if kind in ("audio", "video") else 0
            feature = [round(b / 255.0, 6) for b in digest[:8]]
            return media_id, kind, width, height, duration, feature

        def _decode_real(media_id, kind, content):
            if kind != "image":
                raise NotImplementedError(
                    "real audio/video decode requires ffmpeg — not available; "
                    "use fake=True for the deterministic stand-in"
                )
            if _Image is None:
                raise NotImplementedError(
                    "real image decode requires PIL — not installed on this "
                    "executor; use fake=True for the deterministic stand-in"
                )
            try:
                img = _Image.open(_io.BytesIO(content)).convert("L")
            except Exception:
                # NULL/empty/corrupt blob: a null feature row, not a
                # stage-killing executor exception (missing-PIL and
                # wrong-kind stay loud above — those are config errors)
                return media_id, kind, None, None, 0, None
            width, height = img.size
            hist = img.histogram()  # 256 gray bins
            total = float(sum(hist)) or 1.0
            feature = [
                round(sum(hist[b * 32 : (b + 1) * 32]) / total, 6) for b in range(8)
            ]
            return media_id, kind, width, height, 0, feature

        fn = _decode if fake else _decode_real
        for pdf in batches:
            rows = [
                fn(m, k, c)
                for m, k, c in zip(pdf["media_id"], pdf["kind"], pdf["content"])
            ]
            yield _pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "duration_ms", "feature"],
            )

    return ensure_parallelism(df.select("media_id", "kind", "content")).mapInPandas(
        decode_batches, FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: decode (one mapInPandas pass) then
    expand each video into frame timestamps with native
    sequence/explode — no join, no second scan; the per-frame decode is
    the stubbed step, the *plumbing* is the real distributed op."""
    feats = decode_media(df.filter(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias(
            "frame_ts_ms"
        ),
    )


def audio_chunks(df: DataFrame, chunk_ms: int = 5000, hop_ms: int = 2500) -> DataFrame:
    """Audio chunking plan (ASR/pretraining prep): decode audio metadata
    (one mapInPandas pass — duration is the stubbed codec's output, the
    plumbing is the real distributed op), then expand each clip into
    overlapping chunk windows with native sequence/explode — no join,
    no second scan, no per-chunk Python crossing. Completes the
    image (decode/resize) / video (frame_sample) / audio triple over
    the same MEDIA_SCHEMA."""
    feats = decode_media(df.filter(F.col("kind") == "audio"))
    start = F.explode(
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(hop_ms))
    ).alias("chunk_start_ms")
    return (
        feats.select("media_id", F.col("duration_ms"), start)
        # sequence() is stop-inclusive: when duration is a multiple of
        # hop it lands a start AT duration — a zero-length chunk no
        # consumer wants. Drop it (a zero-duration clip then yields no
        # chunks, which is the honest answer).
        .filter(F.col("chunk_start_ms") < F.col("duration_ms"))
        .select(
            "media_id",
            "chunk_start_ms",
            F.least(
                F.col("chunk_start_ms") + F.lit(chunk_ms), F.col("duration_ms")
            ).alias("chunk_end_ms"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Aspect-fit resize, fused with decode in ONE mapInPandas pass (at
    scale you never decode in one stage and resize in another — the
    pixel buffer would cross the Python↔JVM boundary twice). Output
    dims use exact integer math (floor((w·th)/h) etc.) so the op is
    oracle-checkable; fake=True passes bytes through, fake=False
    decodes + resizes + re-encodes PNG with PIL when the executors
    have it (NotImplementedError otherwise)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        if not fake:
            try:
                import io as _io

                from PIL import Image as _Image
            except ImportError:
                _Image = None

        def _fit(w: int, h: int):
            if w <= target_w and h <= target_h:
                return w, h  # never upscale
            if w * target_h <= h * target_w:  # height is binding
                ow, oh = (w * target_h) // h, target_h
            else:  # width is binding
                ow, oh = target_w, (h * target_w) // w
            # extreme aspect ratios floor to 0 — clamp so the encoder
            # never sees a zero-sized image (unreachable for the fake
            # dims, which are bounded 64-255)
            return max(1, ow), max(1, oh)

        for pdf in batches:
            rows = []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                if fake:
                    d = _hl.md5(c or b"").digest()
                    w, h = 64 + d[0] % 192, 64 + d[1] % 192
                    ow, oh = _fit(w, h)
                    out = c
                else:
                    if _Image is None:
                        raise NotImplementedError(
                            "real image resize requires PIL — not installed on "
                            "this executor; use fake=True for the stand-in"
                        )
                    try:
                        img = _Image.open(_io.BytesIO(c))
                        w, h = img.size
                        ow, oh = _fit(w, h)
                        if img.mode not in ("RGB", "RGBA", "L"):
                            img = img.convert("RGB")  # CMYK/P → PNG-safe
                        buf = _io.BytesIO()
                        img.resize((ow, oh)).save(buf, format="PNG")
                        out = buf.getvalue()
                    except Exception:
                        # undecodable blob: degrade to a null row, never
                        # kill the stage on one bad image
                        w = h = ow = oh = None
                        out = None
                rows.append((m, w, h, ow, oh, out))
            yield _pd.DataFrame(
                rows, columns=["media_id", "width", "height", "out_w", "out_h", "content"]
            )

    return ensure_parallelism(df.select("media_id", "content")).mapInPandas(
        rs, RESIZED_SCHEMA
    )
