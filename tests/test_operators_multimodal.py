"""Unit tests for operators/multimodal.py — binary-column metadata
(native exprs) and the mapInPandas decode plumbing."""

from __future__ import annotations

from ed_housing_data_pipeline_spark.operators import multimodal as mm
from tests.conftest import rows

PNG = b"\x89PNG\r\n\x1a\n" + b"payload-1"
JPG = b"\xff\xd8\xff\xe0" + b"payload-2"
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"payload-3"


def _media(spark):
    return spark.createDataFrame(
        [(1, bytearray(PNG)), (2, bytearray(JPG)), (3, bytearray(MP4)),
         (4, bytearray(b"plain")), (5, None)],
        "media_id long, data binary",
    )


def test_with_media_metadata(spark):
    out = mm.with_media_metadata(_media(spark), "data")
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["media_format"] == "png"
    assert got[2]["media_format"] == "jpeg"
    assert got[3]["media_format"] == "mp4"
    assert got[4]["media_format"] is None
    assert got[1]["media_bytes"] == len(PNG)
    assert got[5]["media_bytes"] is None and got[5]["media_md5"] is None


def test_decode_image_features_schema_and_determinism(spark):
    # pin the stub explicitly: the payloads here are fake bytes a real
    # decoder would reject (default_decode_fn upgrades to PIL when
    # present — covered by test_decode_real_pil below)
    out = mm.decode_image_features(
        _media(spark), "data", "media_id", decode_fn=mm._fake_decode
    )
    assert out.columns == ["media_id", "width", "height", "mean_luma"]
    a = rows(out)
    b = rows(
        mm.decode_image_features(
            _media(spark), "data", "media_id", decode_fn=mm._fake_decode
        )
    )
    assert a == b  # stub decode is deterministic
    got = {r[0]: r for r in a}
    assert got[5][1] is None  # NULL payload -> NULL features
    assert 16 <= got[1][1] < 80 and 16 <= got[1][2] < 80
    assert 0.0 <= got[1][3] <= 1.0


def _pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def test_default_decode_fn_gate():
    """The optional-import gate picks the real decoder iff Pillow
    imports (same pattern as the openpyxl/vendored-xlsx fallback)."""
    fn, is_real = mm.default_decode_fn()
    if _pil_available():
        assert is_real and fn is mm._pil_decode
    else:
        assert not is_real and fn is mm._fake_decode


def test_decode_real_pil(spark):
    """Real-decoder path: exact (width, height, mean_luma) from pixels
    PIL itself generated. Skipped where Pillow is not installed (this
    container) — the gate test above still pins the fallback."""
    import pytest

    if not _pil_available():
        pytest.skip("Pillow not installed")
    import io

    from PIL import Image

    def png_bytes(w, h, value):
        buf = io.BytesIO()
        Image.new("L", (w, h), value).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(png_bytes(8, 4, 0))), (2, bytearray(png_bytes(3, 5, 255)))],
        "media_id long, data binary",
    )
    out = mm.decode_image_features(df, "data", "media_id")
    got = {r["media_id"]: r for r in out.collect()}
    assert (got[1]["width"], got[1]["height"]) == (8, 4)
    assert (got[2]["width"], got[2]["height"]) == (3, 5)
    assert got[1]["mean_luma"] == 0.0
    assert got[2]["mean_luma"] == 1.0


def test_decode_custom_decoder(spark):
    out = mm.decode_image_features(
        _media(spark), "data", "media_id", decode_fn=lambda b: (len(b), 2, 0.5)
    )
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["width"] == len(PNG) and got[1]["height"] == 2


def test_sample_frames_expands_rows(spark):
    out = mm.sample_frames(_media(spark), "data", "media_id", n_frames=3)
    got = rows(out, "media_id", "frame_idx")
    # 4 non-null payloads x 3 frames; NULL payload contributes none
    assert len(got) == 12
    assert (1, 0) in got and (1, 2) in got
    assert not any(m == 5 for m, _ in got)
    # frames of the same video differ (salted stub) but are stable
    first = {r["frame_idx"]: r["mean_luma"] for r in out.filter("media_id=1").collect()}
    again = {r["frame_idx"]: r["mean_luma"] for r in
             mm.sample_frames(_media(spark), "data", "media_id", 3).filter("media_id=1").collect()}
    assert first == again


def test_resize_images_stub_and_nulls(spark):
    out = mm.resize_images(
        _media(spark), "data", "media_id", 32, 16, resize_fn=mm._fake_resize
    )
    assert out.columns == ["media_id", "resized", "resized_bytes"]
    got = {r["media_id"]: r for r in out.collect()}
    assert got[5]["resized"] is None and got[5]["resized_bytes"] is None
    assert got[1]["resized_bytes"] == len(bytes(got[1]["resized"]))
    assert bytes(got[1]["resized"])[0] == 32 and bytes(got[1]["resized"])[1] == 16
    # deterministic
    again = {r["media_id"]: bytes(r["resized"]) for r in mm.resize_images(
        _media(spark), "data", "media_id", 32, 16, resize_fn=mm._fake_resize
    ).collect() if r["resized"] is not None}
    assert all(bytes(got[k]["resized"]) == v for k, v in again.items())


def test_resize_images_real_pil(spark):
    import pytest

    if not _pil_available():
        pytest.skip("Pillow not installed")
    import io

    from PIL import Image

    def png(w, h, v):
        buf = io.BytesIO()
        Image.new("L", (w, h), v).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(png(64, 64, 128)))], "media_id long, data binary"
    )
    out = mm.resize_images(df, "data", "media_id", 8, 4).collect()
    with Image.open(io.BytesIO(bytes(out[0]["resized"]))) as img:
        assert (img.width, img.height) == (8, 4)


def test_audio_features_explicit_stub(spark):
    """The deterministic fake stays available as an explicit opt-in
    for placeholder corpora (it is no longer the default)."""
    out = mm.audio_features(
        _media(spark), "data", "media_id", extract_fn=mm._fake_audio_features
    )
    got = {r["media_id"]: r for r in out.collect()}
    assert got[5]["duration_s"] is None
    assert 1.0 <= got[1]["duration_s"] <= 17.0
    assert 0.0 <= got[1]["rms"] <= 1.0
    assert got[1]["sample_rate"] % 8000 == 0


def _wav_bytes(sr=8000, seconds=0.5, amp=0.25, width=2, channels=1):
    """In-memory PCM WAV: a full-scale-fraction square wave whose RMS
    equals ``amp`` exactly — analytic ground truth for the decoder."""
    import io
    import wave

    n = int(sr * seconds)
    full = 2 ** (8 * width - 1) - 1
    val = int(amp * full)
    frames = bytearray()
    for i in range(n):
        s = val if i % 2 == 0 else -val
        frames += int(s).to_bytes(width, "little", signed=True) * channels
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_audio_features_real_wave_default(spark):
    """Default path = REAL decode (stdlib wave in this container):
    duration/sample-rate exact, RMS matches the analytic square-wave
    value; garbage and NULL payloads yield NULL features instead of
    failing the job."""
    wav = _wav_bytes(sr=16000, seconds=0.25, amp=0.5)
    df = spark.createDataFrame(
        [
            (1, bytearray(wav)),
            (2, bytearray(b"not audio at all")),
            (3, None),
        ],
        "media_id long, data binary",
    )
    got = {r["media_id"]: r for r in mm.audio_features(df, "data", "media_id").collect()}
    assert abs(got[1]["duration_s"] - 0.25) < 1e-9
    assert got[1]["sample_rate"] == 16000
    assert abs(got[1]["rms"] - 0.5) < 0.01
    assert got[2]["duration_s"] is None and got[2]["sample_rate"] is None
    assert got[3]["duration_s"] is None


def test_audio_features_wave_stereo_and_8bit(spark):
    import pytest

    fn = mm._wave_audio_features
    stereo = _wav_bytes(sr=8000, seconds=0.1, amp=0.3, width=2, channels=2)
    d, rms, sr = fn(stereo)
    assert (round(d, 3), sr) == (0.1, 8000) and abs(rms - 0.3) < 0.01
    # 8-bit unsigned PCM
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128 + 64, 128 - 64] * 400))
    d, rms, sr = fn(buf.getvalue())
    assert sr == 8000 and abs(rms - 64 / 127) < 0.01
    with pytest.raises(Exception):
        fn(b"junk")


def test_default_audio_fn_is_real_here(spark):
    fn, is_real = mm.default_audio_fn()
    assert is_real  # wave is stdlib — the real path always exists


def _video_lib() -> str | None:
    try:
        import cv2  # noqa: F401

        return "cv2"
    except ImportError:
        pass
    try:
        import imageio.v3  # noqa: F401

        return "imageio"
    except ImportError:
        return None


def test_default_frames_fn_gate():
    """The optional-import gate picks a real video decoder iff
    cv2/imageio imports (same pattern as the PIL and soundfile
    gates); the stub is the floor — video has no stdlib codec."""
    fn, is_real = mm.default_frames_fn()
    lib = _video_lib()
    if lib == "cv2":
        assert is_real and fn is mm._cv2_frames
    elif lib == "imageio":
        assert is_real and fn is mm._imageio_frames
    else:
        # the floor still REALLY decodes Y4M (pure-Python demuxer);
        # is_real=False means "no general-purpose codec"
        assert not is_real and fn is mm._y4m_or_stub_frames


def test_sample_frames_real_decoder(spark):
    """Real-decoder path: exact frame count/dims from a video the
    decoder's own encoder produced. Skipped where no video lib is
    installed (this container) — the gate test above still pins the
    fallback and the stub path runs in
    test_sample_frames_expands_rows."""
    import pytest

    if _video_lib() != "cv2":
        pytest.skip("no cv2 video encoder installed")
    import os
    import tempfile

    import cv2
    import numpy as np

    fd, path = tempfile.mkstemp(suffix=".avi")
    os.close(fd)
    try:
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (16, 8), isColor=True
        )
        for shade in (0, 128, 255, 0, 128, 255):
            w.write(np.full((8, 16, 3), shade, dtype=np.uint8))
        w.release()
        with open(path, "rb") as f:
            payload = f.read()
    finally:
        os.unlink(path)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, data binary"
    )
    got = mm.sample_frames(df, "data", "media_id", n_frames=3).collect()
    assert len(got) == 3
    assert all((r["width"], r["height"]) == (16, 8) for r in got)
    assert all(0.0 <= r["mean_luma"] <= 1.0 for r in got)


def test_sample_frames_explicit_fn_and_quarantine(spark):
    """An explicit frames_fn keeps its own error semantics (errors
    propagate); the tolerant default maps an undecodable payload to a
    single NULL-feature quarantine row when a real decoder is active
    — with the stub (this container) every payload 'decodes'."""
    out = mm.sample_frames(
        _media(spark),
        "data",
        "media_id",
        n_frames=2,
        frames_fn=lambda b, n: [(i, len(b), 7, 0.25) for i in range(n)],
    )
    got = rows(out, "media_id", "frame_idx", "width")
    assert (1, 0, len(PNG)) in got and (1, 1, len(PNG)) in got
    assert len(got) == 8  # 4 payloads x 2; NULL payload skipped
    # quarantine: a decoder that rejects everything -> one NULL row per
    # payload under the tolerant wrapper (simulated via a monkeypatched
    # default); explicit fns raise instead
    import pytest

    def reject(b, n):
        raise ValueError("bad")

    with pytest.raises(Exception):
        mm.sample_frames(
            _media(spark), "data", "media_id", 2, frames_fn=reject
        ).collect()


def _y4m(shades, width=6, height=4, colorspace="420", params=""):
    """Synthesize a YUV4MPEG2 payload: one frame per shade, Y plane
    filled with the shade, chroma planes neutral 128 — the video
    analogue of the audio suite's WAV synthesis."""
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C{colorspace}\n"
    if colorspace.startswith("mono"):
        chroma = 0
    elif colorspace.startswith("420"):
        chroma = 2 * (width // 2) * (height // 2)
    elif colorspace.startswith("422"):
        chroma = 2 * (width // 2) * height
    else:
        chroma = 2 * width * height
    out = [header.encode("ascii")]
    for shade in shades:
        out.append(f"FRAME{params}\n".encode("ascii"))
        out.append(bytes([shade]) * (width * height) + b"\x80" * chroma)
    return b"".join(out)


def test_y4m_frames_real_decode_runs_here(spark):
    """A REAL video decode path that executes in THIS container (no
    cv2/imageio needed): the pure-Python Y4M demuxer, driven through
    sample_frames' DEFAULT executor-side gate end-to-end. Exact frame
    indices (evenly spaced over the 5-frame stream), dimensions, and
    per-frame mean luma are asserted — stub outputs could not match
    these."""
    payload = _y4m([0, 51, 102, 153, 255])
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, data binary"
    )
    got = sorted(
        mm.sample_frames(df, "data", "media_id", n_frames=3).collect(),
        key=lambda r: r["frame_idx"],
    )
    if _video_lib() == "imageio":  # head-of-stream sampling instead
        import pytest

        pytest.skip("imageio gate active; Y4M floor not reachable")
    assert [r["frame_idx"] for r in got] == [0, 2, 4]
    assert all((r["width"], r["height"]) == (6, 4) for r in got)
    expect = [0.0, 102 / 255.0, 1.0]
    for r, e in zip(got, expect):
        assert abs(r["mean_luma"] - e) < 1e-9
    # metadata detection agrees (native-expr magic table)
    meta = mm.with_media_metadata(df, "data").first()
    assert meta["media_format"] == "y4m"


def test_y4m_parser_colorspaces_and_errors():
    import pytest

    # every subsampling reads the right plane geometry
    for cs in ("420", "420jpeg", "422", "444", "mono"):
        frames = mm._y4m_frames(_y4m([10, 200], colorspace=cs), 2)
        assert [f[0] for f in frames] == [0, 1]
        assert frames[0][3] < frames[1][3]
    # frame-level parameters after FRAME are tolerated
    assert len(mm._y4m_frames(_y4m([1, 2], params=" Xsc"), 2)) == 2
    # n_frames larger than the stream: every frame, once
    assert len(mm._y4m_frames(_y4m([1, 2]), 9)) == 2
    assert mm._y4m_frames(_y4m([1, 2]), 0) == []
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        mm._y4m_frames(b"RIFFxxxx", 1)
    with pytest.raises(ValueError, match="truncated Y4M frame"):
        mm._y4m_frames(_y4m([10, 20])[:-5], 1)
    with pytest.raises(ValueError, match="corrupt Y4M frame header"):
        mm._y4m_frames(_y4m([10]) + b"JUNK", 1)
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        mm._y4m_frames(_y4m([10], colorspace="411"), 1)
    with pytest.raises(ValueError, match="no decodable frames"):
        mm._y4m_frames(b"YUV4MPEG2 W4 H4 C420\n", 1)
    # the floor routes non-Y4M payloads to the stub, Y4M to the parser
    assert mm._y4m_or_stub_frames(_y4m([7]), 1)[0][1:3] == (6, 4)
    assert mm._y4m_or_stub_frames(b"plain", 2) == mm._fake_frames(b"plain", 2)


def test_even_frame_indices():
    assert mm._even_frame_indices(0, 3) == []
    assert mm._even_frame_indices(1, 3) == [0]
    assert mm._even_frame_indices(10, 1) == [0]
    assert mm._even_frame_indices(10, 3) == [0, 4, 9]
    assert mm._even_frame_indices(2, 5) == [0, 1]


def test_sample_frames_quarantines_undecodable_payloads(spark):
    """The tolerant path's quarantine contract: a payload whose decoder
    raises yields exactly ONE row with NULL frame features (frame_idx/
    width/height/mean_luma all NULL) and the scan keeps going — decoded
    payloads in the same batch still expand normally. Driven through a
    real worker round-trip via an explicit raising frames_fn with
    tolerant=True (the serialized-by-value stand-in for a broken
    executor decoder)."""

    def broken_then_ok(payload, n):
        if payload.startswith(b"BAD"):
            raise ValueError("undecodable")
        return [(i, 4, 2, 0.5) for i in range(n)]

    df = spark.createDataFrame(
        [(1, bytearray(b"BADxxxx")), (2, bytearray(b"OKyyyy")), (3, None)],
        "media_id long, data binary",
    )
    out = mm.sample_frames(
        df, "data", "media_id", n_frames=2,
        frames_fn=broken_then_ok, tolerant=True,
    ).collect()
    quarantined = [r for r in out if r["media_id"] == 1]
    assert len(quarantined) == 1
    assert all(
        quarantined[0][c] is None
        for c in ("frame_idx", "width", "height", "mean_luma")
    )
    assert sorted(r["frame_idx"] for r in out if r["media_id"] == 2) == [0, 1]
    assert not [r for r in out if r["media_id"] == 3]  # NULL payload: no row
    # explicit fn WITHOUT tolerant keeps its own error semantics
    import pytest as _pytest

    with _pytest.raises(Exception):
        mm.sample_frames(
            df, "data", "media_id", n_frames=2, frames_fn=broken_then_ok
        ).collect()


def test_even_frame_indices_zero_frames():
    # n_frames=0 must be [] so every decoder path (stub, cv2, imageio)
    # agrees on output cardinality
    assert mm._even_frame_indices(10, 0) == []
    assert mm._even_frame_indices(10, -1) == []
    assert mm._fake_frames(b"payload", 0) == []


def test_container_ext_sniffs_magic_bytes():
    assert mm._container_ext(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8) == ".mp4"
    assert mm._container_ext(b"RIFF\x24\x00\x00\x00AVI LIST") == ".avi"
    assert mm._container_ext(b"\x1a\x45\xdf\xa3" + b"\x00" * 12) == ".mkv"
    assert mm._container_ext(b"not a video") is None
    assert mm._container_ext(b"") is None
