"""Multimodal (binary) column operators.

Engine surface beyond the reference (which is tabular-only): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode/feature-extraction through Arrow-batched
``mapInPandas`` — the pattern a 100 TB training-data pipeline uses so
Python media libraries see whole batches, never row-at-a-time.

The Spark-side plumbing here is REAL and tested: schemas, partition
behavior, batch iteration, column passthrough. The pixel/sample decode
itself is a **deterministic stub** (``_fake_decode``) because no media
codec library (PIL/cv2/librosa) ships in this container — swap
``decode_fn`` for a real decoder on a cluster with the libs installed;
nothing else changes.

Scale notes: metadata extraction is pure native exprs (codegen over
the scan); mapInPandas stages are narrow (no shuffle) and parallelize
by input split; keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
sized so a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame, functions as F

# (byte offset, hex magic prefix) → format tag; media_format's
# when-chain is generated from this table.
_MAGIC: list[tuple[int, str, str]] = [
    (1, "89504e47", "png"),
    (1, "ffd8ff", "jpeg"),
    (1, "52494646", "riff"),  # wav/avi container
    (5, "66747970", "mp4"),  # ftyp box sits at byte offset 4
]


def media_format(data: Column | str) -> Column:
    """Best-effort container detection from magic bytes (``_MAGIC``
    table) — native exprs only (hex prefix compare), no Python."""
    c = F.col(data) if isinstance(data, str) else data
    out = None
    for offset, magic, tag in _MAGIC:
        head = F.lower(F.hex(F.substring(c, offset, len(magic) // 2)))
        cond = head.startswith(magic)
        out = F.when(cond, F.lit(tag)) if out is None else out.when(cond, F.lit(tag))
    return out.otherwise(F.lit(None).cast("string"))


def with_media_metadata(
    df: DataFrame, data_col: str, prefix: str = "media_"
) -> DataFrame:
    """Attach typed metadata for an opaque binary column: byte size,
    md5 digest, detected format. All JVM-side."""
    c = F.col(data_col)
    return df.withColumns(
        {
            f"{prefix}bytes": F.octet_length(c).cast("bigint"),
            f"{prefix}md5": F.md5(c),
            f"{prefix}format": media_format(c),
        }
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC STUB for image decode. Derives (width, height,
    mean_luma) from the payload digest so tests are exact and
    repeatable — the fallback when Pillow is absent (this container
    has no codec libs)."""
    d = hashlib.md5(payload or b"").digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    mean_luma = d[2] / 255.0
    return width, height, mean_luma


def _pil_decode(payload: bytes) -> tuple[int, int, float]:
    """Real image decode via Pillow: (width, height, mean luminance in
    [0, 1]) from the actual pixels. Only reachable when PIL imports
    (see :func:`default_decode_fn`); undecodable payloads raise and
    should be routed to a quarantine by the caller at scale."""
    import io  # noqa: PLC0415

    from PIL import Image  # noqa: PLC0415

    with Image.open(io.BytesIO(payload)) as img:
        grey = img.convert("L")
        hist = grey.histogram()  # 256 bins — no full-pixel materialize
        n = sum(hist)
        mean = sum(i * c for i, c in enumerate(hist)) / (255.0 * n) if n else 0.0
        return img.width, img.height, mean


def default_decode_fn() -> tuple["DecodeFn", bool]:
    """(decode_fn, is_real): the Pillow decoder when the library is
    importable, else the deterministic stub — the same optional-import
    upgrade pattern as sources/readers.py's openpyxl-vs-vendored xlsx
    path. The Spark-side plumbing (schema, Arrow batching, 1→N frame
    expansion) is identical either way."""
    try:
        from PIL import Image  # noqa: F401, PLC0415

        return _pil_decode, True
    except ImportError:
        return _fake_decode, False


DecodeFn = Callable[[bytes], tuple[int, int, float]]


def decode_image_features(
    df: DataFrame,
    data_col: str,
    id_col: str,
    decode_fn: DecodeFn | None = None,
) -> DataFrame:
    """Decode images to (width, height, mean_luma) via Arrow-batched
    ``mapInPandas`` — narrow stage, whole-batch Python calls, schema
    declared up front. NULL payloads yield NULL features.

    Default decoder resolution happens ON THE EXECUTOR (inside the
    batch closure), not the driver: a cluster where Pillow is
    installed on the driver only must not ship a PIL closure to
    workers that cannot import it. With the auto-resolved default,
    undecodable payloads yield NULL features instead of failing the
    job — at 10^9 rows one truncated image must not kill the scan
    (filter ``width IS NULL`` for the quarantine). An EXPLICIT
    ``decode_fn`` keeps its own error semantics untouched."""
    import pandas as pd  # noqa: PLC0415

    schema = f"{id_col} long, width int, height int, mean_luma double"
    explicit = decode_fn

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if explicit is not None:
            fn, tolerant = explicit, False
        else:
            fn, _is_real = default_decode_fn()  # executor-local probe
            tolerant = True

        def one(b):
            if b is None:
                return (None, None, None)
            if not tolerant:
                return fn(bytes(b))
            try:
                return fn(bytes(b))
            except Exception:
                return (None, None, None)

        for pdf in it:
            feats = [one(b) for b in pdf[data_col]]
            out = pd.DataFrame(feats, columns=["width", "height", "mean_luma"])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, data_col).mapInPandas(batches, schema=schema)


def sample_frames(
    df: DataFrame,
    data_col: str,
    id_col: str,
    n_frames: int,
    decode_fn: DecodeFn | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with a
    frame index and (stubbed) per-frame features. Exercises the
    row-expanding mapInPandas shape (1 input row → n output rows).

    Default stays the deterministic stub: per-frame decode needs a
    video codec (cv2/ffmpeg), which neither Pillow nor the stdlib
    provides — there is no always-available real path to gate to
    (unlike audio's stdlib ``wave``). On a cluster shipping OpenCV,
    pass a ``decode_fn`` that writes the payload to a temp file, opens
    it with ``cv2.VideoCapture``, grabs evenly-spaced frame indices
    via ``CAP_PROP_FRAME_COUNT`` + ``set(CAP_PROP_POS_FRAMES, i)``,
    and returns each frame's (width, height, mean luma) — the Arrow
    batching, 1→N row expansion, and schema here stay identical."""
    import pandas as pd  # noqa: PLC0415

    fn = decode_fn or _fake_decode
    schema = f"{id_col} long, frame_idx int, width int, height int, mean_luma double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for media_id, b in zip(pdf[id_col], pdf[data_col]):
                if b is None:
                    continue
                for i in range(n_frames):
                    # stub: frame i decodes the payload salted with i
                    w, h, luma = fn(bytes(b) + bytes([i]))
                    recs.append((media_id, i, w, h, luma))
            yield pd.DataFrame(
                recs, columns=[id_col, "frame_idx", "width", "height", "mean_luma"]
            )

    return df.select(id_col, data_col).mapInPandas(batches, schema=schema)


# -------------------------------------------------- resize / audio
def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """DETERMINISTIC STUB resize: digest-prefixed, size-bounded payload
    standing in for re-encoded pixels (no codec libs here). Stable for
    tests; replace via ``resize_fn`` or install Pillow."""
    d = hashlib.md5(payload or b"").digest()
    body = (payload or b"")[: width * height]
    return bytes([width % 256, height % 256]) + d[:6] + body


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize via Pillow: decode, LANCZOS-resample to (width,
    height), re-encode as PNG bytes."""
    import io  # noqa: PLC0415

    from PIL import Image  # noqa: PLC0415

    with Image.open(io.BytesIO(payload)) as img:
        out = img.resize((width, height), Image.LANCZOS)
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()


def default_resize_fn():
    """(resize_fn, is_real) — Pillow when importable, else the stub
    (same upgrade gate as :func:`default_decode_fn`)."""
    try:
        from PIL import Image  # noqa: F401, PLC0415

        return _pil_resize, True
    except ImportError:
        return _fake_resize, False


def resize_images(
    df: DataFrame,
    data_col: str,
    id_col: str,
    width: int,
    height: int,
    resize_fn=None,
) -> DataFrame:
    """Batch image resize to a fixed (width, height) — the
    normalize-before-training step. Emits (id, resized binary, byte
    size). Arrow ``mapInPandas``: one Python call per batch, narrow, no
    shuffle; output partitioning follows the input splits so a
    downstream parquet sink writes resized shards co-located with their
    sources. NULL payloads stay NULL. Default resizer resolution and
    error tolerance follow :func:`decode_image_features`: the Pillow
    probe runs on the executor, and with the auto default an
    unresizable payload yields NULL instead of failing the job (an
    explicit ``resize_fn`` keeps its own error semantics)."""
    import pandas as pd  # noqa: PLC0415

    explicit = resize_fn
    schema = f"{id_col} long, resized binary, resized_bytes bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if explicit is not None:
            fn, tolerant = explicit, False
        else:
            fn, _is_real = default_resize_fn()  # executor-local probe
            tolerant = True

        def one(b):
            if b is None:
                return None
            if not tolerant:
                return fn(bytes(b), width, height)
            try:
                return fn(bytes(b), width, height)
            except Exception:
                return None

        for pdf in it:
            out_payloads = [one(b) for b in pdf[data_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": out_payloads,
                    "resized_bytes": [
                        None if p is None else len(p) for p in out_payloads
                    ],
                }
            )

    return df.select(id_col, data_col).mapInPandas(batches, schema=schema)


def _fake_audio_features(payload: bytes) -> tuple[float, float, int]:
    """DETERMINISTIC STUB audio feature extraction: (duration_s,
    rms, sample_rate) derived from the payload digest — the opt-in
    fake for pipelines whose audio column holds synthetic placeholders
    (pass ``extract_fn=_fake_audio_features``). The default is a REAL
    decoder — see :func:`default_audio_fn`."""
    d = hashlib.md5(payload or b"").digest()
    duration_s = 1.0 + d[0] / 16.0
    rms = d[1] / 255.0
    sample_rate = 8000 * (1 + d[2] % 5)
    return duration_s, rms, sample_rate


def _wave_audio_features(payload: bytes) -> tuple[float, float, int]:
    """Real WAV decode via the stdlib ``wave`` module (always
    available): (duration_s, rms in [0, 1], sample_rate) over all
    channels of 8/16/32-bit PCM. Non-WAV/compressed payloads raise —
    the tolerant default path maps them to NULL features."""
    import array  # noqa: PLC0415
    import io  # noqa: PLC0415
    import math  # noqa: PLC0415
    import wave  # noqa: PLC0415

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    duration_s = n / sr if sr else 0.0
    code = {1: "b", 2: "h", 4: "i"}.get(width)
    if code is None:
        raise ValueError(f"unsupported PCM sample width: {width}")
    samples = array.array(code, raw[: len(raw) - len(raw) % width])
    if width == 1:
        # 8-bit WAV is unsigned with a 128 midpoint
        samples = array.array("h", (b - 128 for b in raw))
        full = 127.0
    else:
        full = float(2 ** (8 * width - 1) - 1)
    if not samples:
        return duration_s, 0.0, sr
    rms = math.sqrt(sum(s * s for s in samples) / len(samples)) / full
    return duration_s, rms, sr


def _soundfile_audio_features(payload: bytes) -> tuple[float, float, int]:
    """Real decode via soundfile (any libsndfile format) — only
    reachable when the library imports (see :func:`default_audio_fn`)."""
    import io  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import soundfile as sf  # noqa: PLC0415

    data, sr = sf.read(io.BytesIO(payload), dtype="float64", always_2d=False)
    n = data.shape[0] if getattr(data, "shape", None) else 0
    duration_s = n / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(np.square(data)))) if n else 0.0
    return duration_s, rms, int(sr)


def default_audio_fn():
    """(extract_fn, is_real): soundfile when importable (any
    libsndfile format), else the stdlib ``wave`` PCM parser — so the
    default audio path is ALWAYS a real decoder (unlike images, where
    losing Pillow forces the stub). Same executor-side resolution
    contract as :func:`default_decode_fn`."""
    try:
        import soundfile  # noqa: F401, PLC0415

        return _soundfile_audio_features, True
    except ImportError:
        return _wave_audio_features, True


def audio_features(
    df: DataFrame,
    data_col: str,
    id_col: str,
    extract_fn=None,
) -> DataFrame:
    """Audio feature extraction over opaque binary payloads:
    (duration_s, rms, sample_rate) per clip via Arrow ``mapInPandas``.
    Same narrow batch shape as image decode.

    Default decoder resolution happens ON THE EXECUTOR
    (:func:`default_audio_fn`: soundfile if present, else the stdlib
    WAV parser), and undecodable payloads yield NULL features instead
    of failing the scan — filter ``duration_s IS NULL`` for the
    quarantine. An explicit ``extract_fn`` (e.g. the deterministic
    :func:`_fake_audio_features` for placeholder corpora, or a
    librosa wrapper) keeps its own error semantics."""
    import pandas as pd  # noqa: PLC0415

    explicit = extract_fn
    schema = f"{id_col} long, duration_s double, rms double, sample_rate int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if explicit is not None:
            fn, tolerant = explicit, False
        else:
            fn, _is_real = default_audio_fn()  # executor-local probe
            tolerant = True

        def one(b):
            if b is None:
                return (None, None, None)
            if not tolerant:
                return fn(bytes(b))
            try:
                return fn(bytes(b))
            except Exception:
                return (None, None, None)

        for pdf in it:
            feats = [one(b) for b in pdf[data_col]]
            out = pd.DataFrame(
                feats, columns=["duration_s", "rms", "sample_rate"]
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, data_col).mapInPandas(batches, schema=schema)
