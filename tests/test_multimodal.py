"""Multimodal plumbing (binary columns, decode/feature/frame-sample actors)
and the memoized-map operator."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from mmgraphrag_ray.stages.memo import memoized_map
from mmgraphrag_ray.stages.multimodal import (
    FEATURE_DIM,
    decode_media,
    decode_payload,
    make_payload,
    media_features,
    sample_frames,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media_ds():
    return ray.data.from_arrow(synth_media_table(30)).materialize()


def test_decode_media(media_ds):
    out = decode_media(media_ds).to_pandas()
    assert len(out) == 30
    assert (out["width"] >= 64).all() and (out["height"] >= 64).all()
    assert (out.loc[out["kind"] == "image", "n_frames"] == 1).all()
    assert (out.loc[out["kind"] == "video", "n_frames"] > 1).all()


def test_decode_real_format_raises():
    # JPEG now routes to the real decoder: truncated garbage after the SOI
    # marker is a parse error, not a missing-capability boundary
    with pytest.raises(ValueError):
        decode_payload(b"\xff\xd8\xff\xe0 jpeg bytes")
    # the missing-capability boundary is now unknown container formats
    with pytest.raises(NotImplementedError):
        decode_payload(b"GIF89a not a supported container")
    # a REAL baseline JPEG round-trips through the generic dispatch
    from mmgraphrag_ray.stages.multimodal import make_jpeg_payload

    m = decode_payload(make_jpeg_payload(4))
    assert (m["width"], m["height"], m["n_frames"]) == (8 * (2 + 4 % 3),
                                                       8 * (1 + 4 % 4), 1)


def test_media_features_deterministic(media_ds):
    f1 = media_features(media_ds).to_pandas().sort_values("media_id")
    f2 = media_features(media_ds).to_pandas().sort_values("media_id")
    assert len(f1) == 30
    assert all(len(v) == FEATURE_DIM for v in f1["feature"])
    v1 = np.array(f1["feature"].tolist())
    v2 = np.array(f2["feature"].tolist())
    assert np.array_equal(v1, v2)
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0)


def test_sample_frames(media_ds):
    frames = sample_frames(media_ds, every_n=4).to_pandas()
    imgs = frames[frames["kind"] == "image"]
    assert (imgs["frame_id"] == 0).all()
    vids = frames[frames["kind"] == "video"]
    assert len(vids) > (media_ds.to_pandas()["kind"] == "video").sum()  # multiple frames per video
    assert (vids["frame_id"] % 4 == 0).all()


def test_memoized_map_runs_once_per_distinct_args():
    calls = {"n": 0}

    df = pd.DataFrame({"x": ["a", "b", "a", "a", "b"], "row": range(5)})

    def expensive(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch.copy()
            out["y"] = pd.Series(dtype="object")
            return out
        out = batch.copy()
        out["y"] = out["x"] + "!"
        out["marker"] = 1  # count evaluated rows via output, not closure state
        return out

    res = memoized_map(
        ray.data.from_pandas(df), ["x"], expensive, out_cols=["y", "marker"]
    ).to_pandas()
    assert len(res) == 5
    assert set(res["y"]) == {"a!", "b!"}
    assert (res.loc[res["x"] == "a", "y"] == "a!").all()


def test_lang_id():
    from mmgraphrag_ray.stages.textstats import LangIdStage, doc_lang_id

    stage = LangIdStage()
    assert stage.predict("the cat and the dog went to the park and it was fun") == "en"
    assert stage.predict("der hund ist nicht auf der wiese und das ist gut") == "de"
    assert stage.predict("xyz qqq zzz") == "unknown"
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["the quick fox and the dog in the barn", "el perro es que en la casa por una vez"]}
    )
    out = doc_lang_id(ray.data.from_pandas(docs)).to_pandas().sort_values("doc_id")
    assert list(out["lang_pred"]) == ["en", "es"]


def test_resize_media_halves_dims_and_strides_body():
    import hashlib

    import ray.data

    from mmgraphrag_ray.stages.multimodal import (
        make_payload, resize_media, synth_media_table,
    )

    out = (
        resize_media(ray.data.from_arrow(synth_media_table(12)))
        .to_pandas().set_index("media_id").sort_index()
    )
    assert len(out) == 12
    # hand-check media 5: generator dims, strided-body hex md5
    p = make_payload(5, "video", 64 + 35 % 512, 64 + 65 % 512, 8 + 5 % 24)
    body = p[11:]
    assert out.loc[5, "r_md5"] == hashlib.md5(
        body[::2].hex().encode()
    ).hexdigest()
    assert out.loc[5, "r_width"] == (64 + 35) // 2
    assert out.loc[5, "r_height"] == (64 + 65) // 2


def test_decode_wav_matches_stdlib_wave_module():
    """The RIFF/WAVE parser is REAL: every synthesized payload must agree
    with the stdlib `wave` module (an independent parser) on channels,
    rate, width and frame count — and the PCM checksum must equal the md5
    of the frames stdlib extracts."""
    import hashlib
    import io
    import wave as wavemod

    from mmgraphrag_ray.stages.multimodal import decode_wav, make_wav_payload

    for mid in (0, 1, 2, 7, 99, 255):
        p = make_wav_payload(mid)
        m = decode_wav(p)
        w = wavemod.open(io.BytesIO(p))
        assert m["channels"] == w.getnchannels()
        assert m["sample_rate"] == w.getframerate()
        assert m["bits"] == w.getsampwidth() * 8
        assert m["n_samples"] == w.getnframes() * w.getnchannels()
        pcm = w.readframes(w.getnframes())
        assert m["pcm_md5"] == hashlib.md5(pcm.hex().encode()).hexdigest()


def test_decode_wav_chunk_walk_handles_reordered_and_odd_chunks():
    """Chunk order and odd-sized chunks (word-aligned per RIFF) must not
    matter — proves the parser walks chunks instead of using offsets."""
    import struct

    from mmgraphrag_ray.stages.multimodal import decode_wav

    pcm = struct.pack("<4H", 1, 2, 3, 4)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"xyz"  # 3 bytes -> 1 pad byte
    chunks = (
        b"JUNK" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    m = decode_wav(payload)
    assert (m["channels"], m["sample_rate"], m["n_samples"]) == (1, 8000, 4)


def test_media_concurrency_env_override(monkeypatch):
    from mmgraphrag_ray.stages.multimodal import media_concurrency

    monkeypatch.setenv("RAYKG_MEDIA_ACTORS", "9")
    assert media_concurrency() == (1, 9)
    monkeypatch.delenv("RAYKG_MEDIA_ACTORS")
    lo, hi = media_concurrency()
    assert lo == 1 and hi >= 4


def test_decode_ppm_header_and_pixels():
    """Real P6 parse: comment lines skipped, dims from the header, pixel
    buffer values match the generator formula independently recomputed."""
    from mmgraphrag_ray.stages.multimodal import decode_ppm, make_ppm_payload

    for mid in (0, 4, 13):
        m = decode_ppm(make_ppm_payload(mid))
        w, h = 8 + mid % 9, 6 + mid % 7
        assert (m["width"], m["height"]) == (w, h)
        assert m["pixels"].shape == (h, w, 3)
        for (y, x, c) in ((0, 0, 0), (h - 1, w - 1, 2), (1, 3, 1)):
            assert m["pixels"][y, x, c] == (mid * 7 + y * 31 + x * 13 + c * 5) % 256


def test_ppm_resize_box_filter_exact():
    """2x2 box filter on a hand-built 2x2 image: output = floor mean."""
    import struct

    import numpy as np
    import pyarrow as pa

    from mmgraphrag_ray.stages.multimodal import PpmResizer

    px = np.array([[[10, 20, 30], [20, 30, 40]],
                   [[30, 40, 50], [41, 51, 61]]], dtype=np.uint8)
    payload = b"P6\n2 2\n255\n" + px.tobytes()
    out = PpmResizer()(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
    }))
    import hashlib
    small = np.array([[[(10+20+30+41)//4, (20+30+40+51)//4,
                        (30+40+50+61)//4]]], dtype=np.uint8)
    assert out.column("r_width").to_pylist() == [1]
    assert out.column("r_height").to_pylist() == [1]
    assert out.column("r_md5").to_pylist() == [
        hashlib.md5(small.tobytes().hex().encode()).hexdigest()]


def test_decode_png_roundtrip_and_filters():
    """decode_png reconstructs the generator-formula pixels from real
    filtered+deflated wire bytes; the generator cycles rows through all
    five PNG filter types, so every reconstruction branch runs."""
    import struct
    import zlib

    import numpy as np

    from mmgraphrag_ray.stages.multimodal import decode_png, make_png_payload

    for i in (0, 3, 8, 62):  # varied (w, h) residues
        m = decode_png(make_png_payload(i))
        w, h = 8 + i % 9, 6 + i % 7
        y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                              indexing="ij")
        px = ((i * 7 + y * 31 + x * 13 + c * 5) % 256).astype(np.uint8)
        assert (m["width"], m["height"]) == (w, h)
        assert (m["pixels"] == px).all()

    # all five filter types appear on the wire (h >= 6 -> rows 0..5)
    p = make_png_payload(0)
    idat, pos = [], 8
    while pos + 12 <= len(p):
        size = struct.unpack(">I", p[pos:pos + 4])[0]
        if p[pos + 4:pos + 8] == b"IDAT":
            idat.append(p[pos + 8:pos + 8 + size])
        pos += 12 + size
    stream = zlib.decompress(b"".join(idat))
    stride = (8 + 0 % 9) * 3 + 1
    ftypes = {stream[r * stride] for r in range(6)}
    assert ftypes == {0, 1, 2, 3, 4}


def test_decode_png_verifies_crc_and_rejects_unsupported():
    import struct

    import pytest as _pytest

    from mmgraphrag_ray.stages.multimodal import PNG_SIG, decode_png, make_png_payload

    p = bytearray(make_png_payload(5))
    p[-5] ^= 0xFF  # corrupt IEND CRC
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))

    # grayscale (color type 0) is behind the honest boundary
    from mmgraphrag_ray.stages.multimodal import _png_chunk

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    gray = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", b"x") \
        + _png_chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError):
        decode_png(gray)


def test_decode_payload_dispatch_shapes():
    """Every decode_payload branch returns the width/height/n_frames shape
    MediaDecoder reads (the WAV branch regression from ADVICE r3)."""
    from mmgraphrag_ray.stages.multimodal import (
        decode_payload,
        make_png_payload,
        make_ppm_payload,
        make_wav_payload,
    )

    for payload in (make_wav_payload(7), make_ppm_payload(7),
                    make_png_payload(7)):
        m = decode_payload(payload)
        assert {"kind", "width", "height", "n_frames"} <= set(m)
    wav = decode_payload(make_wav_payload(7))
    assert wav["kind"] == "audio" and wav["n_frames"] == wav["n_samples"] // wav["channels"]
