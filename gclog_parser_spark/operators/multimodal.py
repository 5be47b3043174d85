"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata.

The *decode* step is REAL for the formats the standard library can
decode — PNG (zlib inflate + scanline unfilter) and WAV (the ``wave``
module), see ``operators.mediacodec`` — and a deterministic stub
(``decode_stub``) for formats that genuinely need codecs (JPEG, MP4;
no PIL/ffmpeg in this image).  Everything Spark-side is real and
tested either way: schema, Arrow batch shape, partitioning, and the
`mapInPandas` signature (Arrow-batched bytes in, feature struct out —
the exact shape of a 100 TB media feature-extraction pass).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gclog_parser_spark.operators.mediacodec import (
    decode_media,
    value_digest,
)

DECODE_AVAILABLE = ("png", "wav")  # stdlib-decodable; others stub

META_SCHEMA = (
    "url string, n_bytes long, magic string, kind string, "
    "width int, height int, content_digest string, decoder string"
)

_MAGICS = {
    b"\x89PNG": ("png", "image"),
    b"\xff\xd8\xff": ("jpeg", "image"),
    b"RIFF": ("riff", "audio"),
    b"<htm": ("html", "text"),
    b"<HTM": ("html", "text"),
}


def decode_stub(payload: bytes):
    """Deterministic fake 'decode' — stands in for the codecs the
    image lacks (JPEG, MP4, ...).  PNG/WAV never reach this: they
    route to the REAL stdlib decoders in ``mediacodec``.

    A real deployment swaps this single function for the codec call;
    the Spark plumbing around it is unchanged.
    """
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

    PNG payloads get REAL width/height (stdlib inflate + unfilter);
    WAV payloads decode for real too (dims are NULL — not an image);
    everything else gets the documented stub dims.  ``content_digest``
    is the dedup identity: the digest of the DECODED values for
    decodable formats (same pixels re-compressed ⇒ same digest — the
    identity an image-dedup pass actually wants) and of the raw bytes
    otherwise.  ``decoder`` says which path produced the row.
    """

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                magic, kind = _sniff(b)
                dec = decode_media(b)
                if dec is not None:
                    width, height = dec["width"], dec["height"]
                    digest = value_digest(dec["values"])
                    decoder = dec["codec"]
                else:
                    fake = decode_stub(b)
                    width = fake["fake_width"]
                    height = fake["fake_height"]
                    digest = hashlib.md5(b).hexdigest()
                    decoder = "stub"
                recs.append(
                    {
                        "url": url,
                        "n_bytes": len(b),
                        "magic": magic,
                        "kind": kind,
                        "width": width,
                        "height": height,
                        "content_digest": digest,
                        "decoder": decoder,
                    }
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "n_bytes", "magic", "kind",
                    "width", "height", "content_digest", "decoder",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(fn, META_SCHEMA)


RESIZE_SCHEMA = (
    "url string, kind string, target_w int, target_h int, "
    "resized_digest string"
)


def resize_media(
    pages: DataFrame,
    target_w: int = 16,
    target_h: int = 16,
    payload_col: str = "html",
) -> DataFrame:
    """Fake-resize every payload to ``target_w×target_h`` via the same
    Arrow-batched ``mapInPandas`` shape a real thumbnailer uses (bytes
    in → one feature row out, no shuffle, payload column only).

    The pixel work is the documented stub (no codecs in this image):
    the 'resized' artifact is a deterministic digest of
    ``decoded_text + '<w>x<h>'`` so the DuckDB oracle can verify the
    plumbing value-for-value.  A real deployment replaces ONLY the
    digest line with the codec + resample call."""

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                _, kind = _sniff(b)
                text = b.decode("utf-8", errors="replace")
                recs.append(
                    {
                        "url": url,
                        "kind": kind,
                        "target_w": target_w,
                        "target_h": target_h,
                        "resized_digest": hashlib.md5(
                            (text + f"{target_w}x{target_h}").encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "kind", "target_w", "target_h",
                    "resized_digest",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, RESIZE_SCHEMA
    )


FRAMES_SCHEMA = "url string, frame_idx int, frame_digest string"
FRAME_CHARS = 4096  # fake 'frame' = 4 KiB character window


def sample_frames(
    pages: DataFrame,
    every_n: int = 2,
    payload_col: str = "html",
) -> DataFrame:
    """Fake video frame sampling: one input row fans out to one row per
    sampled frame — the real shape of a frame-extraction pass (row
    explosion inside ``mapInPandas``, still shuffle-free; a 100 TB
    video corpus maps to billions of frame rows without a single
    exchange).

    Frames are consecutive ``FRAME_CHARS`` windows of the decoded
    payload; every ``every_n``-th window is 'decoded' (deterministic
    digest stub, same contract as ``decode_stub``)."""

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                text = bytes(payload).decode("utf-8", errors="replace")
                n_frames = (len(text) + FRAME_CHARS - 1) // FRAME_CHARS
                for i in range(0, n_frames, every_n):
                    chunk = text[i * FRAME_CHARS: (i + 1) * FRAME_CHARS]
                    recs.append(
                        {
                            "url": url,
                            "frame_idx": i,
                            "frame_digest": hashlib.md5(
                                chunk.encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame.from_records(
                recs, columns=["url", "frame_idx", "frame_digest"]
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, FRAMES_SCHEMA
    )


def media_size_rollup(pages: DataFrame, payload_col: str = "html"):
    """Pure-native variant for the oracle: byte sizes straight off the
    binary column (column-pruned scan, codegen only)."""
    return pages.select(
        "url",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_digest"),
    )


PHASH_BITS = 60  # fits BIGINT positive; bands must divide it
PHASH_SCHEMA = "url string, n_cp long, phash long"


def media_phash(
    pages: DataFrame,
    payload_col: str = "html",
    bits: int = PHASH_BITS,
) -> DataFrame:
    """Perceptual-style average-hash of every media payload — the
    image-dedup signature (pHash family): split the decoded payload
    into ``bits`` contiguous blocks, bit_i = (block mean >= global
    mean), compared with EXACT integer cross-multiplication
    (block_sum·n >= total_sum·block_len) so both engines derive the
    same bits.  Decode is the documented codec stub (no PIL/ffmpeg in
    this image): 'pixels' are the utf-8 codepoints, vectorized per row
    via numpy over the utf-32 view — a real deployment swaps ONLY the
    decode line for the codec + DCT/resample call, the Spark plumbing
    (pruned binary scan, Arrow batches, zero shuffle) is the 100 TB
    shape already.

    Returns (url, n_cp, phash) — phash is a ``bits``-bit BIGINT;
    near-duplicate payloads land within small Hamming distance."""
    import numpy as np

    def _phash_one(text: str) -> tuple[int, int]:
        n = len(text)
        arr = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        total = int(arr.sum())
        if n >= bits:
            starts = (np.arange(bits) * n + bits - 1) // bits
            bs = np.add.reduceat(arr, starts)
            bn = np.diff(np.append(starts, n))
        else:  # tiny payloads: some blocks empty, loop is exact
            bs = np.zeros(bits, dtype=np.int64)
            bn = np.zeros(bits, dtype=np.int64)
            for pos in range(n):
                b = pos * bits // n
                bs[b] += int(arr[pos])
                bn[b] += 1
        h = 0
        for i in range(bits):
            if bn[i] and int(bs[i]) * n >= total * int(bn[i]):
                h |= 1 << (bits - 1 - i)
        return n, h

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                text = bytes(payload).decode("utf-8", errors="replace")
                if not text:
                    continue
                n, h = _phash_one(text)
                recs.append({"url": url, "n_cp": n, "phash": h})
            yield pd.DataFrame.from_records(
                recs, columns=["url", "n_cp", "phash"]
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, PHASH_SCHEMA
    )


def media_phash_pairs(
    pages: DataFrame,
    max_hamming: int = 12,
    bands: int = 15,
    bits: int = PHASH_BITS,
    payload_col: str = "html",
) -> DataFrame:
    """Near-duplicate media pairs by phash Hamming distance — the
    image-dedup join, same pigeonhole banding as ``simhash_pairs``:
    two hashes within Hamming ``max_hamming`` (< bands) must agree
    exactly on at least one of ``bands`` equal segments, so candidates
    come from band equi-joins (shuffle ∝ payloads×bands, per-bucket
    fan-out bounded by segment cardinality 2^(bits/bands)) and verify
    with one popcount — never an all-pairs scan.  Production images
    use wider hashes (256-bit pHash, 8-bit segments) for colder
    buckets; the 60-bit default matches the stub decode.

    Returns (url_a, url_b, hamming), url_a < url_b."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole needs max_hamming < bands, got"
            f" {max_hamming} >= {bands}"
        )
    if bits % bands:
        raise ValueError("bands must divide bits")
    seg = bits // bands
    sigs = media_phash(pages, payload_col=payload_col, bits=bits)
    banded = sigs.select(
        "url",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright("phash", b * seg)
                    .bitwiseAND((1 << seg) - 1)
                    .alias("band_val"),
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select("url", "phash", "band.band_idx", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.url") < F.col("b.url")),
        )
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


EMBED_DIM = 8
EMBED_LANE_OFFSET = 1 << 23  # 24-bit lanes, signed around zero


def media_embed(
    pages: DataFrame,
    dim: int = EMBED_DIM,
    payload_col: str = "html",
) -> DataFrame:
    """Deterministic stand-in media embedder — the model-inference
    pass of a multimodal pipeline in its real Spark shape: pruned
    (url, binary) scan → Arrow-batched ``mapInPandas`` → (url,
    ``array<long>``) embedding relation, zero shuffle.  A real
    deployment swaps ONLY the per-payload function for the
    CLIP/encoder forward pass (GPU-batched over exactly these Arrow
    batches); everything downstream — storage schema, similarity
    joins, dedup — is unchanged.

    The stand-in is content-determined: lane j = signed 24-bit integer
    from ``md5(payload_text || ':' || j)``.  24-bit lanes keep every
    downstream dot product exact BIGINT (dim · 2^46 ≪ 2^63), so the
    similarity queries built on top are bit-checkable cross-engine.
    Identical payloads ⇒ identical vectors, which is precisely the
    property embedding-dedup relies on."""

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                text = bytes(payload).decode("utf-8", errors="replace")
                emb = [
                    int(
                        hashlib.md5(
                            (text + f":{j}").encode()
                        ).hexdigest()[:6],
                        16,
                    )
                    - EMBED_LANE_OFFSET
                    for j in range(dim)
                ]
                recs.append({"url": url, "emb": emb})
            yield pd.DataFrame.from_records(
                recs, columns=["url", "emb"]
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, "url string, emb array<long>"
    )


def media_neighbor_topk(
    pages: DataFrame,
    k: int = 10,
    dim: int = EMBED_DIM,
    payload_col: str = "html",
) -> DataFrame:
    """Embedding-space nearest neighbors of one probe page — the
    multimodal→ANN composition: binary payload → embedding relation →
    exact-BIGINT dot-product top-k.  The probe is the keeper of the
    LARGEST exact-duplicate payload group (deterministic: count DESC,
    url ASC), so the expected top neighbors are its re-crawled copies
    at the maximum attainable score — embedding dedup finding what
    byte-dedup finds, the cross-modality sanity check a production
    media pipeline runs before trusting the encoder.

    Scale shape: the embedding pass is shuffle-free; the probe row
    broadcasts; the scan computes dim multiplies per vector; top-k is
    a bounded TakeOrdered — no global sort materializes."""
    emb = media_embed(pages, dim=dim, payload_col=payload_col)
    probe_url = (
        pages.groupBy(F.md5(payload_col))
        .agg(F.count("*").alias("n"), F.min("url").alias("url"))
        .orderBy(F.desc("n"), F.asc("url"))
        .limit(1)
        .select("url")
    )
    probe = emb.join(
        F.broadcast(probe_url), "url"
    ).select(F.col("url").alias("probe_url"), F.col("emb").alias("pemb"))
    dot = F.aggregate(
        F.zip_with("pemb", "emb", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        emb.crossJoin(F.broadcast(probe))
        .where(F.col("url") != F.col("probe_url"))
        .select("probe_url", "url", dot.alias("dot"))
        .orderBy(F.desc("dot"), F.asc("url"))
        .limit(k)
    )


DECODE_SCHEMA = (
    "url string, codec string, width int, height int, "
    "n_channels int, sample_rate int, n_values long, "
    "value_digest string"
)


def decode_media_features(pages: DataFrame, payload_col: str = "payload"):
    """REAL media decode as a feature relation: PNG → zlib inflate +
    scanline unfilter (all five PNG filter types), WAV → RIFF/PCM via
    the stdlib ``wave`` module; anything else routes to the documented
    stub (codec='stub', stub dims, NULL values).  See
    ``operators.mediacodec``.

    ``value_digest`` is md5 over the ','-joined decimal decoded values
    (pixels row-major channel-interleaved / signed PCM samples) — the
    full-fidelity, text-safe form the DuckDB oracle recomputes from
    the generator's closed form (``datagen.media_pages``), so this
    query proves the encode→decode round trip against ground truth.

    Scale shape: pruned (url, payload) scan → Arrow-batched
    ``mapInPandas``, zero shuffle — the 100 TB decode pass."""

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                dec = decode_media(b)
                if dec is not None:
                    vals = dec["values"]
                    recs.append(
                        {
                            "url": url,
                            "codec": dec["codec"],
                            "width": dec["width"],
                            "height": dec["height"],
                            "n_channels": dec["n_channels"],
                            "sample_rate": dec["sample_rate"],
                            "n_values": len(vals),
                            "value_digest": value_digest(vals),
                        }
                    )
                else:
                    fake = decode_stub(b)
                    recs.append(
                        {
                            "url": url,
                            "codec": "stub",
                            "width": fake["fake_width"],
                            "height": fake["fake_height"],
                            "n_channels": None,
                            "sample_rate": None,
                            "n_values": None,
                            "value_digest": None,
                        }
                    )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "codec", "width", "height", "n_channels",
                    "sample_rate", "n_values", "value_digest",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, DECODE_SCHEMA
    )


RESIZE_REAL_SCHEMA = (
    "url string, decoder string, target_w int, target_h int, "
    "resized_digest string"
)


def resize_media_real(
    pages: DataFrame,
    target_w: int = 8,
    target_h: int = 6,
    payload_col: str = "payload",
) -> DataFrame:
    """Real thumbnailing for the stdlib-decodable formats: PNG resizes
    by nearest-neighbor (out(ty,tx,c) = src(ty·h div th, tx·w div tw,
    c) — integer index math, exactly re-derivable in SQL), WAV
    downsamples the waveform to a ``target_w·target_h``-point sketch
    (out(j) = sample(j·n div L)); other payloads keep the documented
    stub digest (md5 of text + 'WxH').  ``resized_digest`` digests the
    resized values the same way ``value_digest`` does, so the oracle
    verifies REAL resampled pixels, not plumbing alone.

    Same scale shape as every decode pass here: pruned binary scan →
    Arrow ``mapInPandas``, zero shuffle."""

    def fn(batches):
        L = target_w * target_h
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                dec = decode_media(b)
                if dec is None:
                    text = b.decode("utf-8", errors="replace")
                    digest = hashlib.md5(
                        (text + f"{target_w}x{target_h}").encode()
                    ).hexdigest()
                    decoder = "stub"
                elif dec["codec"] == "png":
                    w, h, ch = (
                        dec["width"], dec["height"], dec["n_channels"]
                    )
                    src = dec["values"]
                    out = [
                        src[((ty * h // target_h) * w
                             + (tx * w // target_w)) * ch + c]
                        for ty in range(target_h)
                        for tx in range(target_w)
                        for c in range(ch)
                    ]
                    digest = value_digest(out)
                    decoder = "png"
                else:  # wav: 1-D waveform sketch
                    src = dec["values"]
                    n = len(src)
                    out = [src[j * n // L] for j in range(L)]
                    digest = value_digest(out)
                    decoder = "wav"
                recs.append(
                    {
                        "url": url,
                        "decoder": decoder,
                        "target_w": target_w,
                        "target_h": target_h,
                        "resized_digest": digest,
                    }
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "decoder", "target_w", "target_h",
                    "resized_digest",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, RESIZE_REAL_SCHEMA
    )


PHASH_REAL_SCHEMA = "url string, decoder string, n_vals long, phash long"


def media_phash_real(
    pages: DataFrame,
    bits: int = PHASH_BITS,
    payload_col: str = "payload",
) -> DataFrame:
    """Average-hash over the REAL decoded values (round-5): PNG pixel
    bytes / WAV PCM samples from the stdlib decoders — the honest
    upgrade of :func:`media_phash`, whose 'pixels' are codepoint
    stand-ins; undecodable payloads keep exactly that codepoint lane
    (``decoder='stub'``), so one relation covers the mixed corpus.

    Same exact-integer bit rule as ``media_phash``: ``bits``
    contiguous blocks (position ``i`` → block ``i·bits div n``, the
    closed form of the reduceat boundaries), bit_j = (block sum ·
    n ≥ total · block len) — signed-safe integer cross-multiplication,
    so WAV's negative samples compare exactly too.  Zero shuffle:
    pruned (url, payload) scan → Arrow ``mapInPandas``."""
    import numpy as np

    def _hash_values(vals) -> int:
        n = len(vals)
        arr = np.asarray(vals, dtype=np.int64)
        total = int(arr.sum())
        b = (np.arange(n, dtype=np.int64) * bits) // n
        bs = np.bincount(b, weights=arr, minlength=bits).astype(
            np.int64
        )
        bn = np.bincount(b, minlength=bits).astype(np.int64)
        h = 0
        for j in range(bits):
            if bn[j] and int(bs[j]) * n >= total * int(bn[j]):
                h |= 1 << (bits - 1 - j)
        return h

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                dec = decode_media(b)
                if dec is not None:
                    vals = dec["values"]
                    decoder = dec["codec"]
                else:
                    text = b.decode("utf-8", errors="replace")
                    vals = [ord(c) for c in text]
                    decoder = "stub"
                if not vals:
                    continue
                recs.append(
                    {
                        "url": url,
                        "decoder": decoder,
                        "n_vals": len(vals),
                        "phash": _hash_values(vals),
                    }
                )
            yield pd.DataFrame.from_records(
                recs, columns=["url", "decoder", "n_vals", "phash"]
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, PHASH_REAL_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "url string, n_samples long, sample_rate int, sum_sq long, "
    "peak_abs int, zero_crossings long"
)


def media_audio_features(
    pages: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL audio feature extraction over decoded WAV samples — the
    audio-quality gate of a multimodal training pipeline (silence /
    clipping / DC-stuck detection before paying for transcription or
    an audio encoder).  Everything is EXACT integers so the DuckDB
    oracle reproduces it from the generator closed form bit-for-bit:

    * ``sum_sq`` — Σ s² (BIGINT; RMS = sqrt(sum_sq/n) is left to the
      reader precisely because sqrt is float) — silence ≈ 0;
    * ``peak_abs`` — max |s| — clipping sits at 32767/32768;
    * ``zero_crossings`` — #{i : s_i·s_{i+1} < 0} — a crude but
      classic pitch/noisiness signal.

    Non-WAV payloads drop (this is the audio lane; the mixed-corpus
    meta lives in ``extract_media_meta``).  Zero shuffle: pruned
    (url, payload) scan → Arrow ``mapInPandas``."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                dec = decode_media(b)
                if dec is None or dec["codec"] != "wav":
                    continue
                s = np.asarray(dec["values"], dtype=np.int64)
                recs.append(
                    {
                        "url": url,
                        "n_samples": len(s),
                        "sample_rate": dec["sample_rate"],
                        "sum_sq": int((s * s).sum()),
                        "peak_abs": int(np.abs(s).max()) if len(s) else 0,
                        "zero_crossings": int(
                            ((s[:-1] * s[1:]) < 0).sum()
                        ) if len(s) > 1 else 0,
                    }
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "n_samples", "sample_rate", "sum_sq",
                    "peak_abs", "zero_crossings",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, AUDIO_FEATURES_SCHEMA
    )


IMAGE_STATS_SCHEMA = (
    "url string, width int, height int, n_channels int, "
    "sum_px long, min_px int, max_px int, n_distinct int"
)


def media_image_stats(
    pages: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL image statistics over decoded PNG pixels — the image-DQ
    gate (all-black / blown-out / low-entropy screenshots) run before
    an image encoder sees the corpus.  Exact integers only (sum, min,
    max, distinct pixel values), so the oracle recomputes them from
    the generator closed form.  Non-PNG payloads drop (image lane).
    Zero shuffle: pruned scan → Arrow ``mapInPandas``."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            recs = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                dec = decode_media(b)
                if dec is None or dec["codec"] != "png":
                    continue
                px = np.asarray(dec["values"], dtype=np.int64)
                recs.append(
                    {
                        "url": url,
                        "width": dec["width"],
                        "height": dec["height"],
                        "n_channels": dec["n_channels"],
                        "sum_px": int(px.sum()),
                        "min_px": int(px.min()),
                        "max_px": int(px.max()),
                        "n_distinct": int(len(np.unique(px))),
                    }
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "url", "width", "height", "n_channels",
                    "sum_px", "min_px", "max_px", "n_distinct",
                ],
            )

    return pages.select("url", payload_col).mapInPandas(
        fn, IMAGE_STATS_SCHEMA
    )
