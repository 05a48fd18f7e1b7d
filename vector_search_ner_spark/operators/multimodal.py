"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libs aren't in this image):
`decode_image_features` tries PIL and falls back to a deterministic
byte-statistics feature vector — the Spark-side contract (schema,
batching, partitioning) is real and tested; swapping in a real decoder
changes only `_decode_one`.

At 100 TB: binary payloads ride the same parquet scans; mapInPandas
keeps them off the driver and processes per-partition Arrow batches;
feature extraction adds no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 8

FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes int, features array<float>"
)


def attach_fake_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + metadata per doc (stands
    in for an image column; md5-derived so deterministic)."""
    payload = F.unhex(F.concat(F.md5(F.col(text_col)), F.md5(F.reverse(F.col(text_col)))))
    return docs.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.length(F.col(text_col)) % 64 + 16).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 48 + 16).cast("int").alias("height"),
        ),
    )


def _decode_one(payload: bytes) -> list[float]:
    try:  # real decoder path (not available in this image)
        from PIL import Image  # noqa: F401

        raise NotImplementedError("real image decode not wired up in this image")
    except ImportError:
        pass
    # deterministic fake: byte statistics as features; the provenance
    # hash is md5 of the LOWERCASE HEX of the payload (not the raw
    # bytes) so the whole feature vector is derivable in ANSI SQL for
    # the oracle (DuckDB md5 takes VARCHAR only)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    h = int(hashlib.md5(payload.hex().encode()).hexdigest()[:8], 16)
    feats = [
        float(arr.size),
        float(arr.sum() % 997),
        float(arr.mean()),
        float(arr.min()),
        float(arr.max()),
        float(arr[0]),
        float(arr[-1]),
        float(h % 1000),
    ]
    return [float(np.float32(x)) for x in feats]


def decode_image_features(with_binary: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column."""

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [_decode_one(bytes(p)) for p in pdf["payload"]],
                }
            )

    return with_binary.mapInPandas(op, schema=FEATURES_SCHEMA)


RESIZE_SAMPLE_SCHEMA = (
    "doc_id long, new_w int, new_h int, frame_idx int, frame_sig string"
)


def resize_and_sample_frames(
    with_binary: DataFrame,
    box: int = 32,
    max_frames: int = 4,
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Resize + frame-sample plumbing (1→N mapInPandas):

      * resize: fit (meta.width, meta.height) into a box×box square
        preserving aspect ratio (the thumbnail job) — real decode is
        stubbed, the geometry is real;
      * frame sampling: every ceil(n_frames/max_frames)-th frame index,
        each emitting a deterministic frame signature derived from the
        payload bytes (stands in for the per-frame decode).

    Emits one row per sampled frame. At scale the payload bytes stay in
    Arrow batches on the executors; output is narrow rows only.
    """

    def op(batches):
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "new_w", "new_h", "frame_idx", "frame_sig")}
            for doc_id, payload, meta, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"], pdf[n_frames_col]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                scale = min(box / w, box / h)
                new_w = max(1, int(w * scale))
                new_h = max(1, int(h * scale))
                payload_hex = bytes(payload).hex()
                n = int(n_frames)
                step = -(-n // max_frames)  # ceil
                for idx in range(0, n, step):
                    sig = hashlib.md5(f"{payload_hex}-{idx}".encode()).hexdigest()[:12]
                    out["doc_id"].append(doc_id)
                    out["new_w"].append(new_w)
                    out["new_h"].append(new_h)
                    out["frame_idx"].append(idx)
                    out["frame_sig"].append(sig)
            yield pd.DataFrame(out)

    return with_binary.mapInPandas(op, schema=RESIZE_SAMPLE_SCHEMA)


PHASH_SCHEMA = "sid long, fp long"


def perceptual_dhash(with_binary: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint over the opaque
    binary payload via Arrow mapInPandas — the image-dedup primitive:
    bit i of the fingerprint is [byte_i > byte_{i+1}] over the first
    32 payload bytes (31 bits), which for a real image is the
    row-major brightness gradient of the downscaled thumbnail (the
    actual decode+resize is the stubbed step, exactly as in
    decode_image_features; the byte-gradient stand-in keeps the whole
    fingerprint closed-form derivable in SQL for the oracle). Returns
    (sid, fp) — feed `neardup.hamming_band_pairs` for banded near-dup
    search. Map-only; payload bytes never leave the executor."""

    def op(batches):
        for pdf in batches:
            fps = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p)[:32], dtype=np.uint8).astype(np.int64)
                fp = 0
                for i in range(len(b) - 1):
                    if b[i] > b[i + 1]:
                        fp |= 1 << i
                fps.append(fp)
            yield pd.DataFrame({"sid": pdf[id_col], "fp": fps})

    return with_binary.mapInPandas(op, schema=PHASH_SCHEMA)


AUDIO_FP_FRAME = 4  # samples per energy frame (hop 1)


def audio_energy_fingerprint(with_binary: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Chromaprint-style audio fingerprint over the opaque payload via
    Arrow mapInPandas: frame energies (sum of squared samples over
    length-4 windows, hop 1) reduced to the SIGN OF THE ENERGY
    GRADIENT — bit i of the fingerprint is [E_i > E_{i+1}]. Real audio
    would decode PCM first (the stubbed step, exactly as in
    audio_frame_energy); the integer energy arithmetic keeps the whole
    fingerprint closed-form derivable in SQL. Returns (sid, fp) for
    `neardup.hamming_band_pairs`. Map-only."""

    def op(batches):
        for pdf in batches:
            fps = []
            for p in pdf["payload"]:
                s = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                e = [
                    int((s[i : i + AUDIO_FP_FRAME] ** 2).sum())
                    for i in range(len(s) - AUDIO_FP_FRAME + 1)
                ]
                fp = 0
                for i in range(len(e) - 1):
                    if e[i] > e[i + 1]:
                        fp |= 1 << i
                fps.append(fp)
            yield pd.DataFrame({"sid": pdf[id_col], "fp": fps})

    return with_binary.mapInPandas(op, schema=PHASH_SCHEMA)


AUDIO_FRAMES_SCHEMA = "doc_id long, frame_idx int, energy long, peak int"


def audio_frame_energy(
    with_binary: DataFrame, frame_len: int = 8, hop: int = 4
) -> DataFrame:
    """Audio-path plumbing (decode stubbed like the image path): treat
    the payload bytes as PCM samples, cut overlapping frames
    (frame_len/hop — the STFT windowing shape), emit per-frame energy
    and peak. All integer arithmetic → exact, so the Python path gets
    a full SQL oracle. A real codec swaps in at the np.frombuffer line
    only; framing, batching, and the 1→N row shape are the real
    contract. At scale: payloads stay in executor Arrow batches,
    output rows are narrow (id, idx, 2 ints)."""

    def op(batches):
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "energy", "peak")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                for j, start in enumerate(range(0, len(samples) - frame_len + 1, hop)):
                    fr = samples[start : start + frame_len]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(j)
                    out["energy"].append(int((fr * fr).sum()))
                    out["peak"].append(int(fr.max()))
            yield pd.DataFrame(out)

    return with_binary.mapInPandas(op, schema=AUDIO_FRAMES_SCHEMA)
