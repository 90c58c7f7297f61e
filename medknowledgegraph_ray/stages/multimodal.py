"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode reality by modality: AUDIO decode is REAL (PCM WAV via the stdlib
`wave` module — to_wav_payloads / audio_features below, no external codec
needed); VIDEO frame-sampling is REAL for uncompressed YUV4MPEG2 (.y4m)
containers (to_y4m_payloads / video_frame_features — a public plain-bytes
format needing no codec: header line + FRAME-delimited planar YUV); IMAGE
decode is real when PIL is importable (per-actor guard in MediaDecoder).
Only COMPRESSED video/image codecs stay behind `_decode_stub` (none ship
in this container) with the Ray-side plumbing — binary Arrow columns,
small batches for large payloads, actor-pool stage shape, metadata
schema — real and tested.  Swap `_decode_stub` for ffmpeg/torchvision in
production; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import config


def to_binary_payloads(docs: rd.Dataset) -> rd.Dataset:
    """Model a binary-payload table from the documents table: payload =
    utf-8 bytes of text (stands in for image/audio bytes), media_type by
    doc_id stripe.  Output: (doc_id, media_type, payload:binary)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        payloads = [t.encode("utf-8") for t in texts]
        media = ["image" if d % 3 == 0 else ("audio" if d % 3 == 1 else "video") for d in doc_ids]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "media_type": pa.array(media, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode: digests + synthetic dimensions derived
    from the payload hash.  A real decoder would raise NotImplementedError
    here if the codec is unsupported; we never silently skip."""
    digest = hashlib.md5(payload).hexdigest()
    h = int(digest[:8], 16)
    if media_type == "image":
        meta = {"width": 64 + h % 1024, "height": 64 + (h >> 10) % 1024, "frames": 1}
    elif media_type == "audio":
        meta = {"width": 0, "height": 0, "frames": 8000 + h % 160000}  # samples
    else:  # video
        meta = {"width": 320 + h % 1280, "height": 240 + (h >> 10) % 720, "frames": 24 + h % 240}
    return {"digest": digest, **meta}


class MediaDecoder:
    """Actor-pool decode stage.  Small batch_size is intentional: payload
    bytes × batch × concurrency must fit the worker heap (the guide's
    large-binary-row rule).

    `real`: None (default) auto-detects a real image codec — PIL when
    importable, the deterministic stub otherwise; True requires PIL (raises
    ImportError where codecs are absent, never a silent stub); False forces
    the stub.  With a real codec, an undecodable image payload raises — the
    never-silently-skip policy above."""

    def __init__(self, real: bool | None = None):
        self._pil = None
        self._force_real = bool(real)
        self._allow_real = real is not False
        if real is not False:
            try:
                from PIL import Image  # codec loaded ONCE per actor

                self._pil = Image
            except ImportError:
                pass  # netpbm (stdlib) still counts as a real image codec

    def decode(self, payload: bytes, media_type: str) -> dict:
        if media_type == "image" and self._allow_real:
            if payload[:2] in (b"P5", b"P6"):  # REAL, dependency-free
                w, h, _, _ = _parse_netpbm(payload)
                return {
                    "digest": hashlib.md5(payload).hexdigest(),
                    "width": w, "height": h, "frames": 1,
                }
            if payload[:8] == _PNG_SIG:  # REAL COMPRESSED, dependency-free
                w, h, _, _ = decode_png(payload)
                return {
                    "digest": hashlib.md5(payload).hexdigest(),
                    "width": w, "height": h, "frames": 1,
                }
            if self._pil is not None:
                return self._decode_pil(payload)
            if self._force_real:
                raise ValueError(
                    "MediaDecoder(real=True): image payload is not netpbm "
                    "or PNG and PIL is not importable — no real codec "
                    "available"
                )
        return _decode_stub(payload, media_type)  # no audio/video codec dep

    def _decode_pil(self, payload: bytes) -> dict:
        import io

        with self._pil.open(io.BytesIO(payload)) as im:  # raises on bad bytes
            return {
                "digest": hashlib.md5(payload).hexdigest(),
                "width": im.width,
                "height": im.height,
                "frames": getattr(im, "n_frames", 1),
            }

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        media = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = [self.decode(p, m) for p, m in zip(payloads, media)]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "media_type": pa.array(media, pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "digest": pa.array([r["digest"] for r in rows], pa.string()),
                "width": pa.array([r["width"] for r in rows], pa.int64()),
                "height": pa.array([r["height"] for r in rows], pa.int64()),
                "frames": pa.array([r["frames"] for r in rows], pa.int64()),
            }
        )


def decode_media(payloads: rd.Dataset, *, batch_size: int = 256) -> rd.Dataset:
    return payloads.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=config.pool_size(),
    )


class ImageResizer:
    """Actor-pool resize stage.  netpbm payloads resize for REAL — a
    vectorized nearest-neighbor index gather re-encoded as netpbm, so the
    digest is of actual resized pixels; other payloads (JPEG/PNG without
    PIL) keep the deterministic stub digest, preserving the schema
    contract either way.  A real JPEG resampler would slot into
    `__init__` exactly like the netpbm path."""

    def __init__(self, width: int = 224, height: int = 224):
        self.w, self.h = width, height

    def _resize_netpbm(self, payload: bytes) -> str:
        w, h, _, arr = _parse_netpbm(payload)
        yi = (np.arange(self.h) * h) // self.h
        xi = (np.arange(self.w) * w) // self.w
        return hashlib.md5(encode_netpbm(arr[yi][:, xi])).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        digests = [
            self._resize_netpbm(p)
            if p[:2] in (b"P5", b"P6")
            else hashlib.md5(p + f"{self.w}x{self.h}".encode()).hexdigest()
            for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "width": pa.array([self.w] * len(batch), pa.int64()),
                "height": pa.array([self.h] * len(batch), pa.int64()),
                "resized_digest": pa.array(digests, pa.string()),
            }
        )


def resize_images(payloads: rd.Dataset, *, width: int = 224, height: int = 224) -> rd.Dataset:
    imgs = payloads.filter(expr="media_type == 'image'")
    return imgs.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=config.pool_size(),
    )


def sample_frames(payloads: rd.Dataset, *, n_frames: int = 8) -> rd.Dataset:
    """Video frame sampling: one output row per sampled frame index
    (evenly spaced over the decoded frame count) — the flat-map expansion
    a real frame sampler produces, with deterministic stub frame digests."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, mts, fidx, digs = [], [], [], []
        for doc_id, mt, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mt != "video":
                continue
            meta = _decode_stub(payload, mt)
            total = meta["frames"]
            step = max(1, total // n_frames)
            for i in range(0, min(total, step * n_frames), step):
                ids.append(doc_id)
                mts.append(mt)
                fidx.append(i)
                digs.append(hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(mts, pa.string()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame_digest": pa.array(digs, pa.string()),
            }
        )

    return payloads.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,
    )


def to_wav_payloads(docs: rd.Dataset, *, sample_rate: int = 8000) -> rd.Dataset:
    """Audio-striped docs as REAL WAV payloads: 16-bit PCM mono,
    deterministic sample content derived from md5(text) — synthesized with
    the stdlib `wave` writer, so the decode stage below exercises an actual
    audio container format, not a fake.  Output: (doc_id, media_type,
    payload:binary)."""
    import io
    import wave

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_pay = [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id % 3 != 1:  # the audio stripe of to_binary_payloads
                continue
            digest = hashlib.md5((t or "").encode()).digest()
            n = 1000 + int.from_bytes(digest[:4], "big") % 8000
            pcm = np.frombuffer((digest * (n * 2 // len(digest) + 1))[: n * 2], dtype="<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(pcm.tobytes())
            out_id.append(doc_id)
            out_pay.append(buf.getvalue())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "media_type": pa.array(["audio"] * len(out_id), pa.string()),
                "payload": pa.array(out_pay, pa.binary()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )


class AudioFeatureExtractor:
    """REAL audio feature extraction — stdlib `wave` decode (no external
    codec needed for PCM WAV) + numpy: per payload, the container-declared
    (n_samples, sample_rate, duration_ms) and the signal RMS in [-1, 1]
    micro-units.  An unparseable payload RAISES (never a silent stub) —
    the same never-silently-skip policy as the image path."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        ids, ns, rates, durs, rms = [], [], [], [], []
        for doc_id, payload in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            with wave.open(io.BytesIO(payload), "rb") as w:  # raises on bad bytes
                n = w.getnframes()
                rate = w.getframerate()
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise ValueError(
                        f"doc {doc_id}: unsupported WAV layout "
                        f"(sampwidth={w.getsampwidth()}, channels={w.getnchannels()})"
                    )
                x = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.float64) / 32768.0
            ids.append(doc_id)
            ns.append(n)
            rates.append(rate)
            durs.append(round(n * 1000 / rate))
            rms.append(int(round(float(np.sqrt(np.mean(x * x))) * 1e6)) if n else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "duration_ms": pa.array(durs, pa.int64()),
                "rms_e6": pa.array(rms, pa.int64()),
            }
        )


def audio_features(payloads: rd.Dataset, *, batch_size: int = 256) -> rd.Dataset:
    """WAV payloads → (doc_id, n_samples, sample_rate, duration_ms, rms_e6)
    via a REAL stdlib-wave decode per payload (small batches — the
    large-binary-row rule)."""
    return payloads.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=config.pool_size(),
    )


def media_metadata(docs: rd.Dataset) -> rd.Dataset:
    """documents → binary payloads → decoded metadata.

    digest/n_bytes are SQL-checkable (md5(text) / strlen(text)); the
    synthetic dims are deterministic from the digest."""
    return decode_media(to_binary_payloads(docs))


# ---------------------------------------------------------------------------
# REAL video: uncompressed YUV4MPEG2 (.y4m) — public plain-bytes container
# (mjpegtools), parseable with the stdlib: one ASCII header line
# ("YUV4MPEG2 W<w> H<h> F<rate> C<colorspace>\n"), then per frame an ASCII
# "FRAME\n" marker + the planar YUV bytes.
# ---------------------------------------------------------------------------

_Y4M_FRAME_BYTES = {"420": lambda w, h: w * h * 3 // 2,
                    "422": lambda w, h: w * h * 2,
                    "444": lambda w, h: w * h * 3,
                    "mono": lambda w, h: w * h}


def _parse_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """(width, height, [frame luma+chroma bytes]) of a y4m payload; raises
    on anything malformed — never a silent skip."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    cs = "420jpeg"
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:].decode("ascii")
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    try:
        fb = next(f for p, f in _Y4M_FRAME_BYTES.items() if cs.startswith(p))(w, h)
    except StopIteration:
        raise ValueError(f"unsupported y4m colorspace {cs!r}") from None
    frames: list[bytes] = []
    off = nl + 1
    n = len(payload)
    while off < n:
        fnl = payload.find(b"\n", off)
        if fnl < 0 or payload[off:off + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {off}")
        data = payload[fnl + 1: fnl + 1 + fb]
        if len(data) < fb:
            raise ValueError(f"truncated frame {len(frames)}")
        frames.append(data)
        off = fnl + 1 + fb
    return w, h, frames


def to_y4m_payloads(docs: rd.Dataset, *, width: int = 16, height: int = 8) -> rd.Dataset:
    """Video-striped docs as REAL .y4m payloads: C420 planar frames with
    deterministic content derived from md5(text) — an actual public video
    container, so the sampler below parses real bytes, not a fake.
    Output: (doc_id, media_type, payload:binary)."""
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode()
    fb = _Y4M_FRAME_BYTES["420"](width, height)

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_pay = [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id % 3 != 2:  # the video stripe of to_binary_payloads
                continue
            digest = hashlib.md5((t or "").encode()).digest()
            n_frames = 4 + digest[0] % 28
            chunks = [header]
            for i in range(n_frames):
                fd = hashlib.md5(digest + i.to_bytes(4, "big")).digest()
                chunks.append(b"FRAME\n")
                chunks.append((fd * (fb // len(fd) + 1))[:fb])
            out_id.append(doc_id)
            out_pay.append(b"".join(chunks))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "media_type": pa.array(["video"] * len(out_id), pa.string()),
                "payload": pa.array(out_pay, pa.binary()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )


class VideoFrameSampler:
    """REAL frame sampling over y4m payloads: parse the container, take
    `n_frames` evenly spaced frames, emit per sampled frame the frame
    index, the mean luma (Y-plane, micro-units) and the frame digest.
    Malformed payloads RAISE — the never-silently-skip policy."""

    def __init__(self, n_frames: int = 8):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, total, luma, digs = [], [], [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, frames = _parse_y4m(payload)
            n = len(frames)
            step = max(1, n // self.n_frames)
            for i in range(0, min(n, step * self.n_frames), step):
                y = np.frombuffer(frames[i][: w * h], dtype=np.uint8)
                ids.append(doc_id)
                fidx.append(i)
                total.append(n)
                luma.append(int(round(float(y.mean()) * 1e6)))
                digs.append(hashlib.md5(frames[i]).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "n_frames": pa.array(total, pa.int64()),
                "mean_luma_e6": pa.array(luma, pa.int64()),
                "frame_digest": pa.array(digs, pa.string()),
            }
        )


def video_frame_features(payloads: rd.Dataset, *, n_frames: int = 8,
                         batch_size: int = 64) -> rd.Dataset:
    """y4m payloads → one row per sampled frame via a REAL container parse
    (small batches — the large-binary-row rule; a production ffmpeg
    decoder drops into VideoFrameSampler unchanged)."""
    return payloads.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=config.pool_size(),
    )


# ---- netpbm (binary PGM/PPM) — a REAL image codec with zero external
# dependency, so the image path is exercised for real even in containers
# without PIL (this one).  Production formats (JPEG/PNG) still route
# through PIL when importable; netpbm payloads decode here either way.


def _parse_netpbm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse binary PGM (P5) / PPM (P6) → (width, height, channels,
    uint8 array of shape (h, w, c)).  Raises ValueError on malformed
    bytes — the module's never-silently-skip policy."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("netpbm: not a binary PGM/PPM payload")
    channels = 3 if magic == b"P6" else 1
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("netpbm: malformed header")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("netpbm: only maxval 255 supported")
    raster = payload[pos + 1 :]  # single whitespace after maxval
    need = w * h * channels
    if len(raster) != need:
        raise ValueError(f"netpbm: raster is {len(raster)} bytes, need {need}")
    return w, h, channels, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)


def encode_netpbm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3) array → binary PGM/PPM bytes."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f" {w} {h} 255\n".encode() + arr.astype(np.uint8).tobytes()


def to_ppm_payloads(docs: rd.Dataset) -> rd.Dataset:
    """Image-striped docs as REAL binary PPM payloads: dimensions and
    pixel bytes derive from md5(text) — w = 8 + d % 24, h = 8 + (d>>8) % 24
    with d the first-4-bytes big-endian int of the digest, pixels the
    digest repeated.  Deterministic AND SQL-reproducible (DuckDB md5), so
    the synth→decode round trip is oracle-checked (`mm_image`), unlike any
    external-file fixture.  Output: (doc_id, media_type, payload)."""

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_pay = [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id % 3 != 0:  # the image stripe of to_binary_payloads
                continue
            digest = hashlib.md5((t or "").encode()).digest()
            d = int.from_bytes(digest[:4], "big")
            w, h = 8 + d % 24, 8 + (d >> 8) % 24
            need = w * h * 3
            px = (digest * (need // len(digest) + 1))[:need]
            out_id.append(doc_id)
            out_pay.append(
                encode_netpbm(np.frombuffer(px, np.uint8).reshape(h, w, 3))
            )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "media_type": pa.array(["image"] * len(out_id), pa.string()),
                "payload": pa.array(out_pay, pa.binary()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )


# ---- PNG (stdlib zlib) — a REAL COMPRESSED image codec with zero external
# dependency.  Baseline subset: 8-bit greyscale / RGB / RGBA, no interlace,
# all five scanline filters on decode, CRC-verified chunks.  This is the
# compressed-codec seam test the container's missing PIL used to leave
# stubbed: the dispatch path (MediaDecoder -> decode_png) now exercises a
# real DEFLATE round trip end-to-end.  Production still swaps in
# PIL/torchvision for full-coverage JPEG/PNG; nothing else changes.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples/pixel (8-bit)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3|4) array → PNG bytes (bit depth 8, filter 0
    scanlines, one IDAT)."""
    import struct
    import zlib

    h, w, c = arr.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Un-apply PNG scanline filters (0 None / 1 Sub / 2 Up / 3 Average /
    4 Paeth) over the decompressed stream → uint8 (h, w, c)."""
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError(f"png: decompressed stream is {len(raw)} bytes, "
                         f"need {h * (1 + stride)}")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        off = y * (1 + stride)
        ft = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # left-neighbor dependency: sequential per pixel
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                if ft == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    pp = prev[i - c] if i >= c else 0
                    pd_, pa_, pb_, pc_ = a + b - pp, None, None, None
                    pa_ = abs(pd_ - a)
                    pb_ = abs(pd_ - b)
                    pc_ = abs(pd_ - pp)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else pp)
                    cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Minimal baseline PNG decoder → (width, height, channels, uint8
    array).  CRC-verified; raises ValueError on non-PNG bytes, unsupported
    bit depth/interlace, chunk corruption, or stream-length mismatch — the
    module's never-silently-skip policy."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("png: truncated chunk header")
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("png: truncated chunk data")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
            raise ValueError(f"png: CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS or comp or filt or inter:
                raise ValueError(
                    f"png: unsupported format (depth={depth} color={color} "
                    f"interlace={inter})")
            ihdr = (w, h, _PNG_CHANNELS[color])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    w, h, c = ihdr
    raw = zlib.decompress(b"".join(idat))
    return w, h, c, _png_unfilter(raw, w, h, c)


def to_png_payloads(docs: rd.Dataset) -> rd.Dataset:
    """Image-striped docs as REAL COMPRESSED PNG payloads: same
    md5(text)-derived dimensions and pixel bytes as to_ppm_payloads, so
    the synth→DEFLATE→decode round trip is oracle-checked against the
    same SQL dimension derivation (`mm_png`)."""

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_pay = [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id % 3 != 0:  # the image stripe of to_binary_payloads
                continue
            digest = hashlib.md5((t or "").encode()).digest()
            d = int.from_bytes(digest[:4], "big")
            w, h = 8 + d % 24, 8 + (d >> 8) % 24
            need = w * h * 3
            px = (digest * (need // len(digest) + 1))[:need]
            out_id.append(doc_id)
            out_pay.append(
                encode_png(np.frombuffer(px, np.uint8).reshape(h, w, 3))
            )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "media_type": pa.array(["image"] * len(out_id), pa.string()),
                "payload": pa.array(out_pay, pa.binary()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    )
