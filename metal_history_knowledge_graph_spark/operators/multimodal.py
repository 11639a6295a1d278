"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark side — schemas, partitioning, UDF signatures, batch shapes —
is real and tested. The actual media decode is STUBBED behind
``decode_image_stub`` (the sandbox has no image/audio libraries): it
produces deterministic fake features from the bytes, clearly marked.
Swapping in a real decoder (PIL/torchvision/ffmpeg) changes ONE
function and nothing about the distributed plan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "features array<float>, decoder string"
)

FRAME_SCHEMA = "media_id long, frame_index int, frame_ts_ms int, frame bytes".replace(
    "bytes", "binary"
)


def decode_image_stub(content: bytes, dim: int = 16) -> list[float]:
    """STUB decoder — deterministic fake feature vector derived from a
    sha256 of the bytes. Replace with a real decode+embed when media
    libraries are available. Raises on empty payloads the way a real
    decoder would."""
    if not content:
        raise ValueError("empty media payload")
    digest = hashlib.sha256(content).digest()
    # map 2-byte windows to floats in [-1, 1)
    return [
        int.from_bytes(digest[(2 * i) % 32:(2 * i) % 32 + 2], "little") / 32768.0 - 1.0
        for i in range(dim)
    ]


def extract_media_features(
    media: DataFrame, dim: int = 16, decoder=None, decoder_name: str | None = None,
) -> DataFrame:
    """binary → feature vectors, one Arrow batch at a time. Narrow (no
    shuffle); batch size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
    holds ≤ batch_size × max_media_bytes at once.

    ``decoder`` is THE swap point: any ``(bytes, dim) -> list[float]``
    callable (e.g. a real PIL/torchvision decode+embed) replaces the
    stub without touching the distributed plan, schema, or batch shape
    — pinned by test_trainingdata_ops's injected-decoder test. It is
    serialized into the task closure, so it must be picklable."""
    import pandas as pd

    decode = decoder or decode_image_stub
    dname = decoder_name or ("stub-sha256" if decoder is None else "injected")

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                try:
                    feats = decode(content, dim)
                    decoder = dname
                except ValueError:
                    feats, decoder = None, "failed"
                rows.append(dict(
                    media_id=rec.media_id, kind=rec.kind,
                    n_bytes=len(content),
                    sha256=hashlib.sha256(content).hexdigest(),
                    features=feats, decoder=decoder,
                ))
            out = pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "sha256",
                               "features", "decoder"],
            )
            yield out.astype(object).where(out.notna(), None)

    return media.select("media_id", "kind", "content").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing (1 row in → N frame rows out).
    STUB: 'frames' are deterministic byte slices; a real implementation
    would ffmpeg-decode inside the same batch loop with the same output
    schema."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                duration = rec.duration_ms or 0
                n = min(max_frames, max(0, duration // every_ms))
                for i in range(int(n)):
                    lo = (i * len(content)) // max(int(n), 1)
                    rows.append(dict(
                        media_id=rec.media_id, frame_index=i,
                        frame_ts_ms=i * every_ms,
                        frame=content[lo:lo + 64],
                    ))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_ts_ms", "frame"]
            )

    return media.filter("kind = 'video'").select(
        "media_id", "content", "duration_ms"
    ).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int, resize string"
)


def resize_images(
    media: DataFrame, target_w: int = 256, target_h: int = 256
) -> DataFrame:
    """Image resize plumbing (1 row in → 1 row out, narrow). STUB: the
    'resized' payload is a deterministic transform of the bytes sized
    proportionally to target_area/source_area (floor 64 bytes), and the
    width/height metadata are updated to the letterboxed fit (aspect
    ratio preserved — the real integer math a resizer performs, tested
    as such); a real implementation swaps the payload transform for
    PIL/torchvision inside the same batch loop with the same schema.
    Non-image rows pass through untouched with resize='passthrough';
    images missing dimensions resize to exactly (target_w, target_h).
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                row = dict(
                    media_id=rec.media_id, kind=rec.kind, content=content,
                    mime=rec.mime, width=rec.width, height=rec.height,
                    duration_ms=rec.duration_ms, resize="passthrough",
                )
                if rec.kind == "image" and content:
                    if rec.width and rec.height:
                        # letterbox fit: one integer scale factor, ties
                        # to the tighter axis
                        scale_num = min(target_w * rec.height,
                                        target_h * rec.width)
                        new_w = scale_num // rec.height
                        new_h = scale_num // rec.width
                    else:
                        new_w, new_h = target_w, target_h
                    src_area = (rec.width or target_w) * (rec.height or target_h)
                    new_len = max(64, (len(content) * new_w * new_h)
                                  // max(src_area, 1))
                    resized = (content * (new_len // max(len(content), 1) + 1))[:new_len]
                    row.update(content=resized, width=int(new_w),
                               height=int(new_h), resize="stub-letterbox")
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "mime",
                               "width", "height", "duration_ms", "resize"],
            )

    return media.select(
        "media_id", "kind", "content", "mime", "width", "height", "duration_ms"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)
