"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata.

The container image has no image/audio codecs, so the *decode* step is
a stub (deterministic fake behind ``decode_stub``), but everything
Spark-side is real and tested: schema, Arrow batch shape, partitioning,
and the `mapInPandas` signature a real decoder would use (Arrow-batched
bytes in, feature struct out — the exact shape of a 100 TB media
feature-extraction pass).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DECODE_AVAILABLE = False  # no PIL/ffmpeg in this image

META_SCHEMA = (
    "url string, n_bytes long, magic string, kind string, "
    "fake_width int, fake_height int, content_digest string"
)

_MAGICS = {
    b"\x89PNG": ("png", "image"),
    b"\xff\xd8\xff": ("jpeg", "image"),
    b"RIFF": ("riff", "audio"),
    b"<htm": ("html", "text"),
    b"<HTM": ("html", "text"),
}


def decode_stub(payload: bytes):
    """Deterministic fake 'decode' — stands in for PIL/ffmpeg.

    A real deployment swaps this single function for the codec call;
    the Spark plumbing around it is unchanged.  Raises if someone
    expects real pixels.
    """
    if DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real decoder not wired in this image")
    d = hashlib.md5(payload[:64]).digest()
    return {"fake_width": 16 + d[0] % 64, "fake_height": 16 + d[1] % 64}


def _sniff(payload: bytes):
    for magic, (name, kind) in _MAGICS.items():
        if payload[: len(magic)] == magic:
            return name, kind
    return "bin", "unknown"


def extract_media_meta(pages: DataFrame, payload_col: str = "html"):
    """binary column → typed metadata via Arrow-batched mapInPandas.

    Batches arrive as pandas Series of ``bytes``; output is one typed
    row per input row.  At scale this stage is embarrassingly parallel
    (no shuffle) and the binary column is the only one read.
    """

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                magic, kind = _sniff(b)
                fake = decode_stub(b)
                recs.append(
                    {
                        "url": url,
                        "n_bytes": len(b),
                        "magic": magic,
                        "kind": kind,
                        "fake_width": fake["fake_width"],
                        "fake_height": fake["fake_height"],
                        "content_digest": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "n_bytes", "magic", "kind",
                    "fake_width", "fake_height", "content_digest",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(fn, META_SCHEMA)


def media_size_rollup(pages: DataFrame, payload_col: str = "html"):
    """Pure-native variant for the oracle: byte sizes straight off the
    binary column (column-pruned scan, codegen only)."""
    return pages.select(
        "url",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_digest"),
    )
