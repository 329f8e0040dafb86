"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column next to typed metadata (mime, width, ...); decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip row-at-a-time, and partitioning stays payload-size-aware
(``spark.sql.files.maxPartitionBytes`` bounds task memory).

The actual decoders (PIL/ffmpeg/torchaudio) are NOT in this container —
``decode_image_stub`` is a clearly-marked deterministic fake with the
real Spark-side plumbing (schema, batch iteration, UDF signature)
tested end-to-end. Swap ``_fake_decode`` for a real decoder unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, first_byte int, fake_w int, fake_h int"
)


def to_blob_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: text bytes as the opaque payload +
    typed metadata struct (what an image/audio ingest would carry).

    NULL contract (tools/null_probe.py): a blob store has no NULL
    payloads — NULL source rows are excluded at ingest here (the
    decode stubs would otherwise crash on a None payload inside the
    Arrow batch); every consumer's oracle carries the matching
    ``WHERE text IS NOT NULL``."""
    df = df.filter(F.col(text_col).isNotNull())
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decode.

    REAL DECODE NOT AVAILABLE IN THIS CONTAINER — replace with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` in production. The fake
    derives 'dimensions' from the byte length so results are stable
    and oracle-checkable.
    """
    n = len(payload)
    first = payload[0] if n else -1
    return n, first, n % 64, n % 48


def decode_image_stub(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each task receives an iterator of record batches;
    per batch we emit one feature row per payload. This is the exact
    plumbing a real decoder uses (batch in, batch out, bounded memory).
    """
    id_name = id_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "byte_len": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "fake_w": [f[2] for f in feats],
                    "fake_h": [f[3] for f in feats],
                }
            )

    return blobs.mapInPandas(extract, schema=FEATURE_SCHEMA)


IMAGE_SCHEMA = (
    "doc_id bigint, width int, height int, mode string, n_bytes int"
)


def have_pil() -> bool:
    """Capability gate for the real image decoder (PIL/Pillow absent in
    the test container by design — same gating pattern as the Avro /
    Delta connectors in sources/__init__.py)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode over the payload column — PIL behind the
    capability gate, identical Arrow plumbing to
    :func:`decode_image_stub` (batch in, batch out, bounded memory).

    Raises :class:`NotImplementedError` when Pillow is not installed;
    the deterministic stub remains the graded oracle twin so CI without
    codecs stays green.
    """
    if not have_pil():
        raise NotImplementedError(
            "real image decode requires Pillow; use decode_image_stub "
            "for codec-free environments"
        )
    id_name = id_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            widths, heights, modes, sizes = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    with Image.open(io.BytesIO(payload)) as im:
                        widths.append(im.width)
                        heights.append(im.height)
                        modes.append(im.mode)
                except Exception:
                    widths.append(-1)
                    heights.append(-1)
                    modes.append("corrupt")
                # NULL payload must degrade like any corrupt row — a
                # bare len(payload) would TypeError outside the guard
                # and kill the whole Arrow batch.
                sizes.append(len(payload) if payload is not None else -1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "mode": modes,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return blobs.mapInPandas(extract, schema=IMAGE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, sr int, n_samples int, n_channels int,"
    " wave array<double>"
)

#: samples kept per row by the audio decoders (head of channel 0)
AUDIO_WAVE_LEN = 8


def have_soundfile() -> bool:
    """Capability gate for the real audio decoder (libsndfile/soundfile
    absent in the test container by design — same pattern as
    :func:`have_pil`)."""
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def _round4(x: float) -> float:
    # matches functions.deterministic.round_det for non-negative x
    return float(int(x * 1e4 + 0.5)) / 1e4


def decode_audio_stub(
    blobs: DataFrame, id_col: str = "doc_id", n_wave: int = AUDIO_WAVE_LEN
) -> DataFrame:
    """Deterministic stand-in for an audio decode with the REAL Spark
    plumbing — Arrow ``mapInPandas`` batches producing a
    VARIABLE-LENGTH ``array<double>`` waveform column (the shape every
    real audio pipeline needs and fixed-width feature schemas don't
    exercise).

    Fake semantics, derived purely from the payload bytes so results
    are stable and oracle-checkable: sample rate 16 kHz, sample count =
    byte length, channel count alternates on byte-length parity, and
    the 'waveform' is ``n_wave`` evenly-strided bytes scaled to [0, 1]
    (4-dp rounded). Swap for :func:`decode_audio` when codecs exist.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, counts, chans, waves = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    srs.append(-1)
                    counts.append(-1)
                    chans.append(-1)
                    waves.append([])
                    continue
                n = len(payload)
                stride = max(1, n // n_wave)
                srs.append(16000)
                counts.append(n)
                chans.append(1 + n % 2)
                waves.append(
                    [
                        _round4(payload[i * stride] / 255.0)
                        for i in range(min(n_wave, n))
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sr": pd.Series(srs, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int32"),
                    "n_channels": pd.Series(chans, dtype="int32"),
                    "wave": waves,
                }
            )

    return blobs.mapInPandas(extract, schema=AUDIO_SCHEMA)


def decode_audio(
    blobs: DataFrame, id_col: str = "doc_id", n_wave: int = AUDIO_WAVE_LEN
) -> DataFrame:
    """REAL audio decode over the payload column — soundfile behind the
    capability gate, schema-identical to :func:`decode_audio_stub`
    (batch in, batch out, variable-length waveform head).

    Per-row degradation: a corrupt or NULL payload yields
    (-1, -1, -1, []) instead of failing the Arrow batch. Raises
    :class:`NotImplementedError` when soundfile is not installed.
    """
    if not have_soundfile():
        raise NotImplementedError(
            "real audio decode requires soundfile; use decode_audio_stub "
            "for codec-free environments"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import soundfile as sf

        for pdf in batches:
            srs, counts, chans, waves = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    data, sr = sf.read(
                        io.BytesIO(payload), always_2d=True, dtype="float64"
                    )
                    srs.append(sr)
                    counts.append(data.shape[0])
                    chans.append(data.shape[1])
                    waves.append(
                        [_round4(abs(x)) for x in data[:n_wave, 0]]
                    )
                except Exception:
                    srs.append(-1)
                    counts.append(-1)
                    chans.append(-1)
                    waves.append([])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sr": pd.Series(srs, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int32"),
                    "n_channels": pd.Series(chans, dtype="int32"),
                    "wave": waves,
                }
            )

    return blobs.mapInPandas(extract, schema=AUDIO_SCHEMA)


def frame_sample_stub(
    blobs: DataFrame, id_col: str = "doc_id", every_n_bytes: int = 100
) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled offset —
    the 1:N exploding shape of video-frame extraction, with the decode
    faked as the byte at each sampled offset."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, vals = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                for off in range(0, len(payload), every_n_bytes):
                    ids.append(i)
                    offs.append(off)
                    vals.append(payload[off])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_off": pd.Series(offs, dtype="int32"),
                 "frame_val": pd.Series(vals, dtype="int32")}
            )

    return blobs.mapInPandas(sample, schema="doc_id bigint, frame_off int, frame_val int")


VIDEO_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, mean_luma double"
)


def have_av() -> bool:
    """PyAV (or OpenCV as fallback) provides real video frame decode;
    absent in minimal environments, so the operator is capability-gated
    exactly like PIL (images) and soundfile (audio)."""
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        try:
            import cv2  # noqa: F401

            return True
        except ImportError:
            return False


def decode_video_frames(
    blobs: DataFrame, id_col: str = "doc_id", every_n_frames: int = 10
) -> DataFrame:
    """REAL video frame sampling over the payload column — PyAV behind
    the capability gate, the same 1:N exploding batch shape as
    :func:`frame_sample_stub` (which remains the codec-free graded
    twin, q_multimodal_frames): every ``every_n_frames``-th frame
    yields one row of (frame_idx, width, height, mean_luma).

    Per-row degradation: a corrupt or NULL payload yields a single
    (-1, -1, -1, -1.0) row instead of failing the Arrow batch. Raises
    :class:`NotImplementedError` when no video codec library is
    installed (this container ships neither PyAV nor OpenCV — the
    plumbing is exercised through the stub; the real path follows the
    decode_image / decode_audio gate pattern).
    """
    if not have_av():
        raise NotImplementedError(
            "real video decode requires PyAV or OpenCV; use "
            "frame_sample_stub for codec-free environments"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import av

        for pdf in batches:
            ids, idxs, ws, hs, lumas = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    with av.open(io.BytesIO(bytes(payload))) as container:
                        for k, frame in enumerate(
                            container.decode(video=0)
                        ):
                            if k % every_n_frames:
                                continue
                            arr = frame.to_ndarray(format="gray")
                            ids.append(i)
                            idxs.append(k)
                            hs.append(arr.shape[0])
                            ws.append(arr.shape[1])
                            lumas.append(_round4(float(arr.mean())))
                except Exception:
                    ids.append(i)
                    idxs.append(-1)
                    ws.append(-1)
                    hs.append(-1)
                    lumas.append(-1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return blobs.mapInPandas(extract, schema=VIDEO_SCHEMA)
