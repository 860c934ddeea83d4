"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The reference ingests images (DOCX/PDF extraction S1/S2, YOLO segmentation
T4, MM-LLM description img2graph.py) — none of those libs exist in this
container, so the DECODERS are deterministic fakes behind the same seams
(clearly marked; a real deployment swaps `decode_payload`), while the
Ray-side plumbing is real and tested: typed binary schema, actor-pool
map_batches with small batch sizes (large payloads!), frame-sample flat-map
layout, feature vectors as fixed-width list<float32>.

Media table schema:
    media(media_id: int64, kind: string('image'|'audio'|'video'),
          payload: binary, meta: string(json))

Payload wire format (deterministic fake): b'FAKE' + kind[0] + uint16 width +
uint16 height + uint16 n_frames + 256 body bytes from an md5 chain seeded by
media_id (md5 is the engine's SQL-mirrorable hash family — the whole packed
payload, and therefore the fake feature extraction below, has an exact DuckDB
oracle; see media_feature_components in __ray_entry__.py).  WAV, PPM, PNG
and baseline-sequential JPEG payloads decode for REAL (sections below);
the remaining NotImplementedError boundaries are exotic format flavors
(progressive/12-bit/subsampled JPEG, 16-bit PPM/PNG, non-PCM WAV).
"""

from __future__ import annotations

import hashlib
import json
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKE"
FEATURE_DIM = 64


def make_payload(media_id: int, kind: str, width: int, height: int, n_frames: int) -> bytes:
    body = b"".join(
        hashlib.md5(f"{media_id}-{j}".encode()).digest() for j in range(16)
    )
    return MAGIC + kind[:1].encode() + struct.pack("<HHH", width, height, n_frames) + body


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media corpus (no external data)."""
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 64 + (i * 7) % 512, 64 + (i * 13) % 512
        frames = 1 if kind == "image" else 8 + i % 24
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(make_payload(i, kind, w, h, frames))
        rows["meta"].append(json.dumps({"source": f"synth/{i}", "codec": "fake"}))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "meta": pa.array(rows["meta"], pa.string()),
        }
    )


def decode_payload(payload: bytes) -> dict:
    """Dispatch boundary: WAV/PPM/PNG decode for REAL (see below); the
    deterministic fake format covers everything else the sandbox cannot
    decode, and an unknown payload raises NotImplementedError exactly
    where a PIL/ffmpeg call would go.  Every branch returns the same
    width/height/n_frames shape MediaDecoder reads (audio reports 0x0
    with one frame per PCM frame), plus any format-specific fields."""
    if payload[:4] == b"RIFF":
        m = decode_wav(payload)  # REAL decode path (see below)
        return {**m, "width": 0, "height": 0,
                "n_frames": m["n_samples"] // max(m["channels"], 1)}
    if payload[:2] == b"P6":
        m = decode_ppm(payload)  # REAL decode path (see below)
        return {"kind": "image", "width": m["width"],
                "height": m["height"], "n_frames": 1}
    if payload[:8] == PNG_SIG:
        m = decode_png(payload)  # REAL decode path (see below)
        return {"kind": "image", "width": m["width"],
                "height": m["height"], "n_frames": 1}
    if payload[:2] == b"\xff\xd8":
        m = decode_jpeg(payload)  # REAL decode path (see below)
        return {"kind": "image", "width": m["width"],
                "height": m["height"], "n_frames": 1}
    if not payload.startswith(MAGIC):
        raise NotImplementedError(
            "unknown payload format; WAV/PPM/PNG/baseline-JPEG decode for "
            "real via decode_wav/decode_ppm/decode_png/decode_jpeg"
        )
    kind = {b"i": "image", b"a": "audio", b"v": "video"}[payload[4:5]]
    width, height, n_frames = struct.unpack("<HHH", payload[5:11])
    return {"kind": kind, "width": width, "height": height, "n_frames": n_frames}


class MediaDecoder:
    """Actor-pool decode stage: payload -> typed metadata columns.
    Small batch_size is load-bearing for real payloads (batch x concurrency
    must fit worker heap)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.string()),
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                    "n_frames": pa.array([], pa.int32()),
                }
            )
        metas = [decode_payload(p) for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "n_frames": pa.array([m["n_frames"] for m in metas], pa.int32()),
            }
        )


def _win_h32(window: bytes) -> int:
    """8-byte-window hash: md5 over the window's lowercase hex — the engine's
    SQL-mirrorable family (DuckDB: ('0x'||substr(md5(win_hex),1,8))::UBIGINT;
    md5(BLOB) does not exist there, so both sides hash the hex string)."""
    return int(hashlib.md5(window.hex().encode()).hexdigest()[:8], 16)


def _feature_hits(payload: bytes):
    """(dim, sign) stream of the fake feature extraction: one hit per 8-byte
    stride window over the full payload."""
    for off in range(0, max(1, len(payload) - 8), 8):
        h = _win_h32(payload[off : off + 8])
        yield h % FEATURE_DIM, 1 if (h >> 16) & 1 else -1


class MediaFeatureExtractor:
    """Actor-pool feature stage: payload bytes -> FEATURE_DIM float32 vector
    (deterministic rolling-hash features standing in for a vision encoder)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "feature": pa.array([], pa.list_(pa.float32(), FEATURE_DIM)),
                }
            )
        feats = []
        for payload in batch.column("payload").to_pylist():
            vec = np.zeros(FEATURE_DIM, dtype=np.float32)
            for dim, sign in _feature_hits(payload):
                vec[dim] += sign
            n = float(np.linalg.norm(vec)) or 1.0
            feats.append((vec / n).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


class _MediaFeatureComponents:
    """payload -> sparse PRE-normalization feature components, one row per
    (media_id, touched dim): the integer-exact form of MediaFeatureExtractor
    (same pattern as stages/embed.py _VecComponents)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, dims, comps = [], [], []
        if batch.num_rows and "payload" in batch.column_names:
            for mid, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("payload").to_pylist(),
            ):
                c: Counter = Counter()
                for dim, sign in _feature_hits(payload):
                    c[dim] += sign
                for dim in sorted(c):
                    ids.append(mid)
                    dims.append(dim)
                    comps.append(c[dim])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "dim_idx": pa.array(dims, pa.int64()),
                "component": pa.array(comps, pa.int64()),
            }
        )


def sample_frames(media_ds, every_n: int = 4):
    """video rows -> one row per sampled frame (flat-map layout); images
    pass through as frame 0."""
    import pandas as pd

    def frames(batch: pa.Table) -> pa.Table:
        ids, kinds, frame_ids = [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            meta = decode_payload(payload)
            n = meta["n_frames"] if kind == "video" else 1
            for f in range(0, n, every_n if kind == "video" else 1):
                ids.append(mid)
                kinds.append(kind)
                frame_ids.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_id": pa.array(frame_ids, pa.int32()),
            }
        )

    return media_ds.map_batches(frames, batch_format="pyarrow", batch_size=32)


def decode_media(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


def media_features(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


def media_feature_components(media_ds, concurrency=None, batch_size: int = 32):
    """Exploded integer feature components (media_id, dim_idx, component) —
    the SQL-checkable view of media_features (oracle in __ray_entry__.py)."""
    return media_ds.map_batches(
        _MediaFeatureComponents,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


class MediaResizer:
    """Actor-pool resize stage: payload -> halved spatial dims + a checksum
    of the downsampled body (deterministic fake: keep every 2nd body byte;
    a real deployment swaps in PIL/ffmpeg scaling at this seam).  The
    checksum is md5 over the LOWERCASE HEX of the resized body (DuckDB's
    md5 is VARCHAR-only, so the oracle hashes the same hex string)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "r_width": pa.array([], pa.int32()),
                    "r_height": pa.array([], pa.int32()),
                    "r_md5": pa.array([], pa.string()),
                }
            )
        widths, heights, md5s = [], [], []
        for p in batch.column("payload").to_pylist():
            meta = decode_payload(p)
            body = p[11:]
            resized = body[::2]
            widths.append(meta["width"] // 2)
            heights.append(meta["height"] // 2)
            md5s.append(hashlib.md5(resized.hex().encode()).hexdigest())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "r_width": pa.array(widths, pa.int32()),
                "r_height": pa.array(heights, pa.int32()),
                "r_md5": pa.array(md5s, pa.string()),
            }
        )


def resize_media(media_ds, concurrency=None, batch_size: int = 32):
    """Resize as an actor-pool stage — small batches are load-bearing for
    real payloads (batch x concurrency must fit the worker heap)."""
    return media_ds.map_batches(
        MediaResizer, concurrency=concurrency or media_concurrency(),
        batch_size=batch_size, batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# REAL WAV decode (T4 upgrade): the one media format a pure-stdlib sandbox
# can decode for real.  Reference analog: img2graph.py:280-346 runs real
# decoders on real payloads; here the RIFF/WAVE container parse, fmt-chunk
# unpack and PCM extraction are genuine (a JUNK chunk is inserted between
# fmt and data so fixed-offset "parsers" cannot fake it) — only JPEG
# remains behind the NotImplementedError boundary above (PNG decodes for
# real too; see the PNG section).
# ---------------------------------------------------------------------------

WAV_RATES = (8000, 16000, 44100)


def make_wav_payload(media_id: int) -> bytes:
    """Deterministic REAL RIFF/WAVE file: 16-bit PCM, channels = 1+(id%2),
    rate = WAV_RATES[id%3], frames = 100+(id%50) whole frames (so
    n_samples = frames*channels int16 samples) with wire value
    v(j) = (id*31 + j*17) % 65536 (little-endian).  The SQL
    oracle reproduces every field and the PCM md5 from these formulas, so
    a green check proves the decoder actually parsed the container."""
    rate = WAV_RATES[media_id % 3]
    channels = 1 + media_id % 2
    n_samples = (100 + media_id % 50) * channels
    bits = 16
    j = np.arange(n_samples, dtype=np.int64)
    pcm = ((media_id * 31 + j * 17) % 65536).astype("<u2").tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align,
                      block_align, bits)
    junk = b"deterministic-junk-chunk"  # forces a real chunk walk
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"JUNK" + struct.pack("<I", len(junk)) + junk
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_wav_table(n: int) -> pa.Table:
    """Synthetic REAL-WAV media corpus (audio-only)."""
    return pa.table(
        {
            "media_id": pa.array(list(range(n)), pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array([make_wav_payload(i) for i in range(n)],
                                pa.binary()),
            "meta": pa.array([json.dumps({"codec": "pcm_s16le"})] * n,
                             pa.string()),
        }
    )


def decode_wav(payload: bytes) -> dict:
    """Real RIFF/WAVE parse: chunk walk (fmt may appear anywhere before
    data; unknown chunks are skipped with odd-size padding per the RIFF
    spec), fmt unpack, PCM data extraction."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_body, data_body = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt_body is None or data_body is None:
        raise ValueError("missing fmt/data chunk")
    (audio_fmt, channels, rate, _byte_rate,
     _block_align, bits) = struct.unpack("<HHIIHH", fmt_body[:16])
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV is supported")
    n_samples = len(data_body) // 2
    frames = n_samples // channels
    return {
        "kind": "audio",
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": frames * 1000 // rate,
        "pcm_md5": hashlib.md5(data_body.hex().encode()).hexdigest(),
    }


class WavDecoder:
    """Actor-pool REAL-decode stage: WAV payload -> typed audio metadata +
    PCM checksum columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {
            "media_id": ([], pa.int64()), "channels": ([], pa.int64()),
            "sample_rate": ([], pa.int64()), "bits": ([], pa.int64()),
            "n_samples": ([], pa.int64()), "duration_ms": ([], pa.int64()),
            "pcm_md5": ([], pa.string()),
        }
        if batch.num_rows:
            for mid, p in zip(batch.column("media_id").to_pylist(),
                              batch.column("payload").to_pylist()):
                m = decode_wav(p)
                cols["media_id"][0].append(mid)
                for k in ("channels", "sample_rate", "bits", "n_samples",
                          "duration_ms", "pcm_md5"):
                    cols[k][0].append(m[k])
        return pa.table({k: pa.array(v, t) for k, (v, t) in cols.items()})


def media_concurrency() -> tuple:
    """Actor-pool sizing for the media stages — cfg-driven instead of a
    hard (1, 4) cap: (1, N) autoscaling tuple with N = RAYKG_MEDIA_ACTORS
    or half the node's CPUs (decode is CPU-bound but payload-heavy, so
    batch_size x N must fit the worker heap; the (1, N) lower bound keeps
    the pool from starving upstream stages on small machines)."""
    import os

    n = int(os.environ.get("RAYKG_MEDIA_ACTORS", "0"))
    if n <= 0:
        n = max(4, (os.cpu_count() or 8) // 2)
    return (1, n)


def decode_wav_media(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


# ---------------------------------------------------------------------------
# REAL PPM (P6) image decode + resize: the image-side companion of the WAV
# upgrade.  Binary PPM is a real interchange format (netpbm) a pure-stdlib
# sandbox can parse: ASCII header (magic, width, height, maxval, with
# comment lines) followed by raw RGB bytes.  The header parse, pixel
# extraction and the 2x2 box-filter downsample below are genuine image
# operations; only JPEG entropy coding stays behind NotImplementedError.
# ---------------------------------------------------------------------------


def make_ppm_payload(media_id: int) -> bytes:
    """Deterministic REAL binary PPM (P6): width = 8+(id%9), height =
    6+(id%7), maxval 255, pixel (x, y) channel c value =
    (id*7 + y*31 + x*13 + c*5) % 256.  A comment line rides the header so
    fixed-offset readers fail."""
    w, h = 8 + media_id % 9, 6 + media_id % 7
    header = f"P6\n# synth {media_id}\n{w} {h}\n255\n".encode()
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    px = ((media_id * 7 + y * 31 + x * 13 + c * 5) % 256).astype(np.uint8)
    return header + px.tobytes()


def synth_ppm_table(n: int) -> pa.Table:
    return pa.table({
        "media_id": pa.array(list(range(n)), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array([make_ppm_payload(i) for i in range(n)],
                            pa.binary()),
        "meta": pa.array([json.dumps({"codec": "ppm"})] * n, pa.string()),
    })


def decode_ppm(payload: bytes) -> dict:
    """Real P6 parse: tokenized header (comments skipped per the netpbm
    spec), raw RGB pixel buffer as (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header = 4 whitespace-separated tokens; '#' starts a comment to EOL
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(payload):
        ch = payload[pos:pos + 1]
        if ch == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM is supported")
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=w * h * 3, offset=pos).reshape(h, w, 3)
    return {"kind": "image", "width": w, "height": h, "pixels": px}


class PpmResizer:
    """Actor-pool REAL resize: 2x2 box-filter downsample (floor mean per
    channel, odd trailing row/col dropped) over decoded PPM pixels; output
    = halved dims + md5 of the downsampled buffer's hex (the engine's
    SQL-mirrorable hash family)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, md5s = [], [], [], []
        if batch.num_rows:
            for mid, p in zip(batch.column("media_id").to_pylist(),
                              batch.column("payload").to_pylist()):
                m = decode_ppm(p)
                px = m["pixels"]
                h2, w2 = m["height"] // 2, m["width"] // 2
                q = px[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2, 3)
                small = (q.astype(np.uint32).sum(axis=(1, 3)) // 4
                         ).astype(np.uint8)
                ids.append(mid)
                ws.append(w2)
                hs.append(h2)
                md5s.append(hashlib.md5(
                    small.tobytes().hex().encode()).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "r_width": pa.array(ws, pa.int64()),
            "r_height": pa.array(hs, pa.int64()),
            "r_md5": pa.array(md5s, pa.string()),
        })


def resize_ppm_media(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        PpmResizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


# ---------------------------------------------------------------------------
# REAL PNG decode (the reachable half of the remaining T4 boundary): PNG's
# container + compression + filter layers are pure-stdlib — zlib inflate,
# chunk CRC-32 verification, and per-scanline filter reconstruction
# (None/Sub/Up/Average/Paeth per the PNG spec).  The generator writes real
# PNGs whose rows cycle through ALL FIVE filter types, splits IDAT in two,
# and inserts an ancillary tEXt chunk, so nothing short of a genuine
# chunk-walk + inflate + unfilter pass reproduces the pixels.  Only JPEG
# entropy coding now remains behind NotImplementedError.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def make_png_payload(media_id: int) -> bytes:
    """Deterministic REAL PNG: 8-bit RGB (color type 2), width = 8+(id%9),
    height = 6+(id%7), pixel (x, y) channel c = (id*7 + y*31 + x*13 + c*5)
    % 256 — the PPM generator's formula, so the SQL oracle mirrors the
    DECODED pixels while the wire bytes are filtered + deflated.  Row y
    uses filter type y % 5 (h >= 6 exercises every filter), IDAT is split
    in two, and an ancillary tEXt chunk rides between IHDR and IDAT."""
    import zlib

    w, h = 8 + media_id % 9, 6 + media_id % 7
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    px = ((media_id * 7 + y * 31 + x * 13 + c * 5) % 256).astype(np.int64)
    raw = px.reshape(h, w * 3)
    bpp, lines = 3, []
    prior = np.zeros(w * 3, dtype=np.int64)
    for yy in range(h):
        row, ftype = raw[yy], yy % 5
        if ftype == 0:
            filt = row.copy()
        elif ftype == 1:
            filt = row.copy()
            filt[bpp:] = (row[bpp:] - row[:-bpp]) % 256
        elif ftype == 2:
            filt = (row - prior) % 256
        elif ftype == 3:
            filt = row.copy()
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                filt[i] = (row[i] - (left + prior[i]) // 2) % 256
        else:
            filt = row.copy()
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                filt[i] = (row[i] - _paeth(int(left), int(prior[i]),
                                           int(ul))) % 256
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prior = row
    idat = zlib.compress(b"".join(lines))
    half = max(1, len(idat) // 2)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"tEXt", b"Comment\x00synth " + str(media_id).encode())
            + _png_chunk(b"IDAT", idat[:half])
            + _png_chunk(b"IDAT", idat[half:])
            + _png_chunk(b"IEND", b""))


def synth_png_table(n: int) -> pa.Table:
    return pa.table({
        "media_id": pa.array(list(range(n)), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array([make_png_payload(i) for i in range(n)],
                            pa.binary()),
        "meta": pa.array([json.dumps({"codec": "png"})] * n, pa.string()),
    })


def decode_png(payload: bytes) -> dict:
    """Real PNG decode: signature check, chunk walk with CRC-32
    verification, IHDR unpack, multi-IDAT concat, zlib inflate, and
    per-scanline filter reconstruction (all five PNG filter types; the
    per-byte loop is inherent — PNG filters are sequentially dependent
    within a row, which is why real decoders do this in C).  Supports
    8-bit RGB non-interlaced; other PNG flavors raise
    NotImplementedError (the honest remaining boundary)."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        size = struct.unpack(">I", payload[pos:pos + 4])[0]
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + size]
        crc = struct.unpack(">I", payload[pos + 8 + size:pos + 12 + size])[0]
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or color != 2 or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced RGB PNG is supported")
    stream = zlib.decompress(b"".join(idat))
    stride, bpp = w * 3, 3
    if len(stream) != h * (stride + 1):
        raise ValueError("PNG pixel stream size mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for yy in range(h):
        off = yy * (stride + 1)
        ftype = stream[off]
        row = np.frombuffer(stream, dtype=np.uint8, count=stride,
                            offset=off + 1).astype(np.int64)
        if ftype == 0:
            rec = row
        elif ftype == 2:
            rec = (row + prior) % 256
        elif ftype == 1:
            rec = row.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) % 256
        elif ftype == 3:
            rec = row.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + (left + prior[i]) // 2) % 256
        elif ftype == 4:
            rec = row.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(int(left), int(prior[i]),
                                          int(ul))) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[yy] = rec
        prior = rec
    px = out.astype(np.uint8).reshape(h, w, 3)
    return {"kind": "image", "width": int(w), "height": int(h), "pixels": px}


class PngDecoder:
    """Actor-pool REAL PNG decode stage: payload -> dims + md5 of the
    reconstructed raw RGB buffer's hex (the engine's SQL-mirrorable hash
    family) — the oracle recomputes the pixels from the generator formula,
    so a green check proves inflate + unfilter ran for real."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, md5s = [], [], [], []
        if batch.num_rows:
            for mid, p in zip(batch.column("media_id").to_pylist(),
                              batch.column("payload").to_pylist()):
                m = decode_png(p)
                ids.append(mid)
                ws.append(m["width"])
                hs.append(m["height"])
                md5s.append(hashlib.md5(
                    m["pixels"].tobytes().hex().encode()).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "px_md5": pa.array(md5s, pa.string()),
        })


def decode_png_media(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        PngDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


# ---------------------------------------------------------------------------
# REAL baseline JPEG (T4 image half, final piece — reference
# preprocessing.py:265-297 re-encodes real JPEGs in its image pipeline).
# The generator writes genuine baseline-sequential JFIF files — DQT/DHT
# tables, SOF0, restart markers, canonical Huffman entropy coding with
# byte stuffing — and `decode_jpeg` is a GENERAL baseline decoder:
# marker walk, canonical Huffman decode (DC categories + AC
# run/size/EOB/ZRL), dequantize, dezigzag, float 2-D IDCT, level shift,
# and YCbCr->RGB.  The synthetic images use per-8x8-block constant
# colors, so every AC coefficient is zero and (with q_DC = 8) the
# quantize -> dequantize -> IDCT chain is integer-exact: the DECODED
# pixels equal a closed-form formula the DuckDB oracle mirrors
# bit-for-bit, while the wire bytes are Huffman-coded DC differentials.
# Progressive (SOF2), 12-bit, arithmetic-coded and subsampled streams
# raise NotImplementedError — the documented sandbox boundary is now
# "baseline sequential 4:4:4 only", not "no JPEG".
# ---------------------------------------------------------------------------

# standard zigzag scan: zigzag position -> raster index in the 8x8 block
JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# canonical Huffman tables (custom but fully legal JPEG): 12 DC category
# symbols all at code length 4; all 162 AC symbols (EOB, ZRL, and
# (run 0-15, size 1-10)) at code length 8.  Fixed-length canonical codes
# are valid prefix codes and keep the all-ones max-length code unused.
_JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_VALS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])


def _jpeg_canon_codes(bits, vals):
    """BITS/HUFFVAL -> {symbol: (length, code)} per the canonical JPEG
    code construction (Annex C)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit emitter with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.write(1, 1)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _jpeg_magnitude_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def jpeg_encode_blocks(w: int, h: int, comp_blocks, quant, restart_interval: int):
    """Assemble a baseline-sequential JFIF byte stream from already-
    quantized coefficient blocks.

    comp_blocks: per component (Y, Cb, Cr), a list of 64-int arrays in
    ZIGZAG order, MCU-ordered row-major; quant: {0: luma 64, 1: chroma
    64} zigzag-order tables.  General entropy coder (DC differentials,
    AC run/size with ZRL and EOB) — the tests drive it with dense AC
    spectra; `make_jpeg_payload` drives it DC-only."""
    dc_codes = _jpeg_canon_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canon_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def dht(cls, tid, bits, vals):
        return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)

    head = bytearray()
    head += struct.pack(">H", 0xFFD8)                              # SOI
    head += _jpeg_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _jpeg_seg(0xFFDB, bytes([0x00]) + bytes(quant[0]))     # DQT 0
    head += _jpeg_seg(0xFFDB, bytes([0x01]) + bytes(quant[1]))     # DQT 1
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):                       # 4:4:4
        sof += bytes([cid, 0x11, tq])
    head += _jpeg_seg(0xFFC0, sof)                                 # SOF0
    head += _jpeg_seg(0xFFC4, dht(0, 0, _JPEG_DC_BITS, _JPEG_DC_VALS)
                      + dht(1, 0, _JPEG_AC_BITS, _JPEG_AC_VALS)
                      + dht(0, 1, _JPEG_DC_BITS, _JPEG_DC_VALS)
                      + dht(1, 1, _JPEG_AC_BITS, _JPEG_AC_VALS))
    if restart_interval:
        head += _jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid, tbl in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tbl])
    sos += bytes([0, 63, 0])
    head += _jpeg_seg(0xFFDA, sos)                                 # SOS

    bw = _JpegBitWriter()
    pred = [0, 0, 0]
    n_mcus = len(comp_blocks[0])
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            bw.buf += struct.pack(">H", 0xFFD0 + rst % 8)
            rst += 1
            pred = [0, 0, 0]
        for ci in range(3):
            zz = comp_blocks[ci][m]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            cat = _jpeg_category(diff)
            ln, code = dc_codes[cat]
            bw.write(code, ln)
            if cat:
                bw.write(_jpeg_magnitude_bits(diff, cat), cat)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ln, code = ac_codes[0xF0]                       # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat = _jpeg_category(v)
                ln, code = ac_codes[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(_jpeg_magnitude_bits(v, cat), cat)
                run = 0
            if run:
                ln, code = ac_codes[0x00]                           # EOB
                bw.write(code, ln)
    bw.align()
    return bytes(head) + bytes(bw.buf) + struct.pack(">H", 0xFFD9)  # EOI


def _jpeg_block_value(media_id: int, comp: int, by: int, bx: int) -> int:
    """Per-8x8-block constant YCbCr sample for the synthetic corpus —
    the closed form the SQL oracle mirrors."""
    mults = ((7, 31, 13), (11, 17, 19), (5, 23, 29))
    a, b, c = mults[comp]
    return (media_id * a + by * b + bx * c) % 256


def make_jpeg_payload(media_id: int) -> bytes:
    """Deterministic REAL baseline JPEG: width = 8*(2+id%3), height =
    8*(1+id%4), 4:4:4, restart interval = one MCU row.  Every 8x8 block
    is a constant YCbCr color from :func:`_jpeg_block_value`; with all
    quant entries = 8 the DC path (quantize -> dequantize -> IDCT) is
    integer-exact, so the decoded RGB equals the closed-form conversion
    of those block constants while the wire bytes are Huffman-coded DC
    differentials with byte stuffing and per-row predictor resets."""
    w, h = 8 * (2 + media_id % 3), 8 * (1 + media_id % 4)
    bw_, bh = w // 8, h // 8
    comp_blocks = [[], [], []]
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(3):
                v = _jpeg_block_value(media_id, ci, by, bx)
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = v - 128          # q_DC = 8 and F00 = 8*(v-128)/8
                comp_blocks[ci].append(zz)
    quant = {0: [8] * 64, 1: [8] * 64}
    return jpeg_encode_blocks(w, h, comp_blocks, quant, restart_interval=bw_)


def synth_jpeg_table(n: int) -> pa.Table:
    return pa.table({
        "media_id": pa.array(list(range(n)), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array([make_jpeg_payload(i) for i in range(n)],
                            pa.binary()),
        "meta": pa.array([json.dumps({"codec": "jpeg"})] * n, pa.string()),
    })


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    byte-aligns and consumes RSTn at restart boundaries, stops at any
    other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise ValueError("marker inside entropy-coded segment")
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self):
        self.n = 0                       # discard pad bits
        d = self.data
        if d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _jpeg_decode_symbol(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _jpeg_extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


_IDCT_BASIS = None


def _idct_basis() -> np.ndarray:
    global _IDCT_BASIS
    if _IDCT_BASIS is None:
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        a = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
        a[0, :] = np.sqrt(1.0 / 8.0)
        _IDCT_BASIS = a                  # orthonormal: spatial = A.T @ F @ A
    return _IDCT_BASIS


def decode_jpeg(payload: bytes) -> dict:
    """GENERAL baseline-sequential JPEG decode: marker walk (multi-table
    DQT/DHT, SOF0, DRI, SOS), canonical Huffman entropy decode (DC
    differentials, AC run/size with ZRL + EOB, byte un-stuffing, restart
    handling), dequantize, dezigzag, float 2-D IDCT, level shift +
    clamp, YCbCr->RGB (floor(x+0.5) rounding, the SQL-mirrorable
    convention).  Supports 8-bit 4:4:4 streams; progressive/12-bit/
    arithmetic/subsampled raise NotImplementedError (the remaining
    honest boundary)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    w = h = 0
    restart_interval = 0
    scan_comps = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:               # EOI
            break
        size = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:               # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                quant[tq] = np.frombuffer(
                    body, np.uint8, 64, i + 1).astype(np.int64)
                i += 65
        elif marker == 0xC4:             # DHT (may hold several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                codes = _jpeg_canon_codes(bits, vals)
                huff[(cls, tid)] = {(ln, c): s for s, (ln, c) in codes.items()}
                i += 17 + nv
        elif marker == 0xC0:             # SOF0 baseline
            depth, h, w, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError("only 8-bit JPEG is supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling is not supported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG is supported")
        elif marker == 0xDD:             # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:             # SOS -> entropy data follows
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tbl = body[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((cid, tbl >> 4, tbl & 15))
            break
        # APPn / COM / other ancillary segments: skipped
    if comps is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")

    basis = _idct_basis()
    bw_, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw_ * 8), dtype=np.int64) for _ in comps]
    reader = _JpegBitReader(payload, pos)
    pred = [0] * len(comps)
    comp_q = {cid: tq for cid, tq in comps}
    for m in range(bh * bw_):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart()
            pred = [0] * len(comps)
        by, bx = divmod(m, bw_)
        for ci, (cid, dct, act) in enumerate(scan_comps):
            dc_tbl, ac_tbl = huff[(0, dct)], huff[(1, act)]
            cat = _jpeg_decode_symbol(reader, dc_tbl)
            diff = _jpeg_extend(reader.read_bits(cat), cat)
            pred[ci] += diff
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _jpeg_decode_symbol(reader, ac_tbl)
                if rs == 0x00:           # EOB
                    break
                if rs == 0xF0:           # ZRL
                    k += 16
                    continue
                k += rs >> 4
                cat = rs & 15
                zz[k] = _jpeg_extend(reader.read_bits(cat), cat)
                k += 1
            deq = zz * quant[comp_q[cid]]
            blk = np.zeros(64, dtype=np.float64)
            blk[JPEG_ZIGZAG] = deq
            f = blk.reshape(8, 8)
            spatial = basis.T @ f @ basis
            samples = np.clip(np.floor(spatial + 128.0 + 0.5), 0, 255)
            planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                samples.astype(np.int64))
    y = planes[0][:h, :w].astype(np.float64)
    cb = planes[1][:h, :w].astype(np.float64)
    cr = planes[2][:h, :w].astype(np.float64)
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(np.floor(
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5), 0, 255)
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    px = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return {"kind": "image", "width": int(w), "height": int(h), "pixels": px}


class JpegDecoder:
    """Actor-pool REAL baseline-JPEG decode stage: payload -> dims + md5
    of the reconstructed raw RGB buffer's hex (the engine's
    SQL-mirrorable hash family) — the oracle recomputes the pixels from
    the block-constant generator formula, so a green check proves the
    Huffman + IDCT + color-convert chain ran for real."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, md5s = [], [], [], []
        if batch.num_rows:
            for mid, p in zip(batch.column("media_id").to_pylist(),
                              batch.column("payload").to_pylist()):
                m = decode_jpeg(p)
                ids.append(mid)
                ws.append(m["width"])
                hs.append(m["height"])
                md5s.append(hashlib.md5(
                    m["pixels"].tobytes().hex().encode()).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "px_md5": pa.array(md5s, pa.string()),
        })


def decode_jpeg_media(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        JpegDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )


class JpegResizer:
    """Actor-pool REAL decode->transform chain for JPEG: full baseline
    decode (:func:`decode_jpeg`) then the engine's 2x2 box-filter
    downsample (floor mean per channel) — the JPEG counterpart of
    :class:`PpmResizer`.  The synthetic corpus' 8x8-constant blocks make
    every 2x2 box single-valued (8 is even, boxes never straddle a block
    boundary), so the resized pixels equal the block formula at halved
    resolution and the oracle mirrors them in closed form."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, md5s = [], [], [], []
        if batch.num_rows:
            for mid, p in zip(batch.column("media_id").to_pylist(),
                              batch.column("payload").to_pylist()):
                m = decode_jpeg(p)
                px = m["pixels"]
                h2, w2 = m["height"] // 2, m["width"] // 2
                q = px[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2, 3)
                small = (q.astype(np.uint32).sum(axis=(1, 3)) // 4
                         ).astype(np.uint8)
                ids.append(mid)
                ws.append(w2)
                hs.append(h2)
                md5s.append(hashlib.md5(
                    small.tobytes().hex().encode()).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "r_width": pa.array(ws, pa.int64()),
            "r_height": pa.array(hs, pa.int64()),
            "r_md5": pa.array(md5s, pa.string()),
        })


def resize_jpeg_media(media_ds, concurrency=None, batch_size: int = 32):
    return media_ds.map_batches(
        JpegResizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or media_concurrency(),
    )
