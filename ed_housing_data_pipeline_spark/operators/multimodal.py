"""Multimodal (binary) column operators.

Engine surface beyond the reference (which is tabular-only): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode/feature-extraction through Arrow-batched
``mapInPandas`` — the pattern a 100 TB training-data pipeline uses so
Python media libraries see whole batches, never row-at-a-time.

The Spark-side plumbing here is REAL and tested: schemas, partition
behavior, batch iteration, column passthrough. Every decode path is
gated on an executor-side optional import with a deterministic stub as
the floor: images upgrade to Pillow (:func:`default_decode_fn`), audio
ALWAYS has a real decoder (soundfile, else the stdlib ``wave`` PCM
parser — :func:`default_audio_fn`), video upgrades to cv2 or
imageio-ffmpeg (:func:`default_frames_fn`). In this container none of
the optional libs ship, so the stubs run in tests; on a cluster with
the libs installed the same code decodes for real — nothing else
changes.

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
    (1, "595556344d50454732", "y4m"),  # "YUV4MPEG2" uncompressed video
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


# Frames decoder contract: (payload, n_frames) → list of
# (frame_idx, width, height, mean_luma) for up to n_frames sampled
# frames; raises on undecodable payloads (the tolerant default path
# quarantines those as a single NULL-feature row).
FramesFn = Callable[[bytes, int], list[tuple[int, int, int, float]]]


def _even_frame_indices(total: int, n_frames: int) -> list[int]:
    """Evenly spaced, deduplicated frame indices over [0, total)."""
    if total <= 0 or n_frames <= 0:
        # n_frames=0 must yield NO frames under every decoder — the
        # stub and imageio paths emit none, so cv2 must agree or the
        # query's cardinality would depend on which lib is installed
        return []
    if n_frames == 1 or total == 1:
        return [0]
    span = total - 1
    return sorted({round(i * span / (n_frames - 1)) for i in range(n_frames)})


def _fake_frames(payload: bytes, n_frames: int) -> list[tuple[int, int, int, float]]:
    """DETERMINISTIC STUB frame sampler: frame i's features decode the
    payload digest salted with i (no codec libs here). Stable for
    tests; the gate upgrades to a real decoder where one imports."""
    return [
        (i, *_fake_decode((payload or b"") + bytes([i % 256])))
        for i in range(n_frames)
    ]


def _cv2_frames(payload: bytes, n_frames: int) -> list[tuple[int, int, int, float]]:
    """Real frame sampling via OpenCV: payload → temp file (cv2 has no
    in-memory demuxer) → ``VideoCapture``, evenly spaced indices via
    ``CAP_PROP_FRAME_COUNT`` / ``CAP_PROP_POS_FRAMES``, per-frame
    (width, height, BT.601 mean luma in [0, 1])."""
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    import cv2  # noqa: PLC0415

    if n_frames <= 0:  # cardinality parity with the stub/imageio paths
        return []
    fd, path = tempfile.mkstemp(suffix=".video")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise ValueError("unreadable video payload")
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
            out = []
            for i in _even_frame_indices(total, n_frames):
                cap.set(cv2.CAP_PROP_POS_FRAMES, i)
                ok, frame = cap.read()
                if not ok:
                    continue
                h, w = frame.shape[:2]
                luma = float(
                    (
                        0.114 * frame[..., 0]
                        + 0.587 * frame[..., 1]
                        + 0.299 * frame[..., 2]
                    ).mean()
                    / 255.0
                )
                out.append((int(i), int(w), int(h), luma))
            if not out:
                raise ValueError("no decodable frames")
            return out
        finally:
            cap.release()
    finally:
        os.unlink(path)


def _container_ext(payload: bytes) -> str | None:
    """Extension hint for imageio's demuxer from the payload's magic
    bytes (the Python-side twin of :func:`media_format`'s table) —
    a hardcoded ``.mp4`` hint would make imageio reject every AVI/MKV
    payload before ffmpeg could sniff it. ``None`` = let imageio
    detect from the bytes."""
    head = payload[:16] if payload else b""
    if len(head) >= 8 and head[4:8] == b"ftyp":
        return ".mp4"
    if head[:4] == b"RIFF":
        return ".avi"
    if head[:4] == b"\x1a\x45\xdf\xa3":  # EBML: mkv/webm
        return ".mkv"
    return None


def _imageio_frames(payload: bytes, n_frames: int) -> list[tuple[int, int, int, float]]:
    """Real frame sampling via imageio(-ffmpeg): stream the demuxed
    frames (no full-video load) and keep the first ``n_frames`` — the
    total frame count is not cheaply known up front in streaming mode,
    so sampling is head-of-stream rather than evenly spaced."""
    import imageio.v3 as iio  # noqa: PLC0415
    import numpy as np  # noqa: PLC0415

    if n_frames <= 0:  # cardinality parity with the stub and cv2 paths
        return []
    ext = _container_ext(payload)
    out = []
    for i, frame in enumerate(
        iio.imiter(payload, **({"extension": ext} if ext else {}))
    ):
        if i >= n_frames:
            break
        arr = np.asarray(frame, dtype="float64")
        h, w = arr.shape[:2]
        if arr.ndim == 3 and arr.shape[2] >= 3:
            luma = float(
                (
                    0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
                ).mean()
                / 255.0
            )
        else:
            luma = float(arr.mean() / 255.0)
        out.append((i, int(w), int(h), luma))
    if not out:
        raise ValueError("no decodable frames")
    return out


def _y4m_frames(payload: bytes, n_frames: int) -> list[tuple[int, int, int, float]]:
    """Real frame sampling for YUV4MPEG2 — a pure-Python demuxer, no
    codec library needed (Y4M is uncompressed planar YCbCr behind a
    one-line ASCII header, the interchange format ffmpeg/mjpegtools
    emit). Parses the stream headers to index every FRAME, then
    samples evenly spaced indices (same policy as :func:`_cv2_frames`)
    and reads each sampled frame's Y plane for (width, height,
    mean luma in [0, 1]) — chroma planes are skipped, the luma plane
    IS the luminance. Supports C420*/C422/C444/Cmono subsampling."""
    import numpy as np  # noqa: PLC0415

    if n_frames <= 0:  # cardinality parity with the other decoder paths
        return []
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    width = height = None
    colorspace = "420"
    for tok in payload[9:nl].decode("ascii", "replace").split():
        if tok[:1] == "W":
            width = int(tok[1:])
        elif tok[:1] == "H":
            height = int(tok[1:])
        elif tok[:1] == "C":
            colorspace = tok[1:]
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    luma_bytes = width * height
    if colorspace.startswith("mono"):
        chroma_bytes = 0
    elif colorspace.startswith("420"):  # 420, 420jpeg, 420paldv, ...
        chroma_bytes = 2 * (width // 2) * (height // 2)
    elif colorspace.startswith("422"):
        chroma_bytes = 2 * (width // 2) * height
    elif colorspace.startswith("444"):
        chroma_bytes = 2 * luma_bytes
    else:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    frame_bytes = luma_bytes + chroma_bytes
    offsets = []
    pos = nl + 1
    total = len(payload)
    while pos < total:
        end = payload.find(b"\n", pos)
        if end < 0 or not payload[pos:end].startswith(b"FRAME"):
            raise ValueError("corrupt Y4M frame header")
        if end + 1 + frame_bytes > total:
            raise ValueError("truncated Y4M frame")
        offsets.append(end + 1)
        pos = end + 1 + frame_bytes
    if not offsets:
        raise ValueError("no decodable frames")
    out = []
    for i in _even_frame_indices(len(offsets), n_frames):
        y = np.frombuffer(payload, dtype=np.uint8, count=luma_bytes,
                          offset=offsets[i])
        out.append((int(i), int(width), int(height), float(y.mean() / 255.0)))
    return out


def _y4m_or_stub_frames(
    payload: bytes, n_frames: int
) -> list[tuple[int, int, int, float]]:
    """The no-codec-library floor: REAL decode for Y4M payloads (the
    pure-Python demuxer above — so one genuine video path executes
    even in environments without cv2/imageio, like CI), deterministic
    stub for everything else."""
    if payload and payload.startswith(b"YUV4MPEG2"):
        return _y4m_frames(payload, n_frames)
    return _fake_frames(payload, n_frames)


def default_frames_fn() -> tuple[FramesFn, bool]:
    """(frames_fn, is_real) — OpenCV when importable, else
    imageio(-ffmpeg), else the Y4M-or-stub floor. Same executor-side
    optional-import gate as :func:`default_decode_fn` (images) and
    :func:`default_audio_fn` (audio). Video has no stdlib codec, but
    the floor still decodes uncompressed Y4M for real (pure Python);
    ``is_real=False`` there means "no general-purpose codec", not "no
    real path"."""
    try:
        import cv2  # noqa: F401, PLC0415

        return _cv2_frames, True
    except ImportError:
        pass
    try:
        import imageio.v3  # noqa: F401, PLC0415

        return _imageio_frames, True
    except ImportError:
        return _y4m_or_stub_frames, False


def sample_frames(
    df: DataFrame,
    data_col: str,
    id_col: str,
    n_frames: int,
    frames_fn: FramesFn | None = None,
    tolerant: bool | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with a
    frame index and per-frame features. Exercises the row-expanding
    mapInPandas shape (1 input row → n output rows).

    Default decoder resolution happens ON THE EXECUTOR (inside the
    batch closure — :func:`default_frames_fn`: cv2, else
    imageio-ffmpeg, else the deterministic stub), and an undecodable
    payload yields ONE quarantine row with NULL frame features
    (``frame_idx IS NULL``) instead of failing the scan. An explicit
    ``frames_fn`` keeps its own error semantics by default — exceptions
    propagate — and ``tolerant`` overrides either default (e.g. a
    custom decoder that should still quarantine instead of failing the
    scan)."""
    import pandas as pd  # noqa: PLC0415

    explicit = frames_fn
    override = tolerant
    schema = f"{id_col} long, frame_idx int, width int, height int, mean_luma double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if explicit is not None:
            fn, tolerant = explicit, False
        else:
            fn, _is_real = default_frames_fn()  # executor-local probe
            tolerant = True
        if override is not None:
            tolerant = override

        for pdf in it:
            recs = []
            for media_id, b in zip(pdf[id_col], pdf[data_col]):
                if b is None:
                    continue
                if tolerant:
                    try:
                        frames = fn(bytes(b), n_frames)
                    except Exception:
                        recs.append((media_id, None, None, None, None))
                        continue
                else:
                    frames = fn(bytes(b), n_frames)
                recs.extend((media_id, i, w, h, luma) for i, w, h, luma in frames)
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
