"""Multimodal column stages — real Ray plumbing, dependency-free codecs
where the format allows, stubs elsewhere.

Image/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages (decoder
state loaded once per actor in ``__init__``). Codec status:

- PPM/PGM images (netpbm P5/P6): REAL decode (header parse +
  ``np.frombuffer`` — no external deps).
- WAV audio: REAL decode via the stdlib ``wave`` module (PCM frames →
  numpy, duration/sample-rate/RMS features).
- JPEG/PNG/video: try PIL/cv2 once per actor; otherwise a clearly-marked
  deterministic fake keeps the schema/batching/actor plumbing runnable
  (no PIL/cv2/ffmpeg in this container).

Schema contract:
    input : (item_id: int64, payload: binary, mime: string)
    decode: + (width: int32, height: int32, ok: bool)
    audio : + (sample_rate: int32, n_samples: int64, rms: float64, ok)
    feats : + (feature: list<float>[dim])
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def decode_netpbm(payload: bytes):
    """Real decoder for binary netpbm images (P5 gray / P6 RGB): returns
    (width, height, pixel ndarray) or None if not netpbm."""
    if not payload.startswith((b"P5", b"P6")):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    if len(fields) < 3 or i >= n:
        return None
    width, height, maxval = fields
    i += 1  # single whitespace after maxval
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    count = width * height * channels
    pix = np.frombuffer(payload, dtype=dtype, count=count, offset=i)
    if pix.size < count:
        return None
    return width, height, pix.reshape(height, width, channels)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse of decode_netpbm for test fixtures (P6 RGB / P5 gray)."""
    h, w, c = pixels.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.astype(
        np.uint8
    ).tobytes()

PAYLOAD_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


class DecodeImageStage:
    """Actor-pool stage: binary payload → (width, height, ok).

    Real path uses PIL (once-per-actor import); the fallback derives a
    deterministic fake size from the payload bytes, so pipelines are
    runnable end-to-end in codec-less environments.
    """

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None  # STUB: deterministic fake decode

    def _decode_one(self, payload: bytes) -> tuple[int, int, bool]:
        if not payload:
            return 0, 0, False
        decoded = decode_netpbm(payload)  # real, dependency-free path
        if decoded is not None:
            w, h, _ = decoded
            return w, h, True
        if self._pil is not None:
            import io

            try:
                with self._pil.open(io.BytesIO(payload)) as im:
                    return im.width, im.height, True
            except Exception:
                return 0, 0, False
        # STUB fallback: deterministic fake size from payload content
        h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        return 64 + h % 512, 64 + (h >> 16) % 512, True

    def __call__(self, t: pa.Table) -> pa.Table:
        sizes = [self._decode_one(p or b"") for p in t["payload"].to_pylist()]
        w, h, ok = zip(*sizes) if sizes else ((), (), ())
        return pa.table(
            {
                "item_id": t["item_id"],
                "mime": t["mime"],
                "width": pa.array(w, type=pa.int32()),
                "height": pa.array(h, type=pa.int32()),
                "ok": pa.array(ok, type=pa.bool_()),
            }
        )


class ImageFeatureStage:
    """Actor-pool stage: payload → fixed-dim feature vector.

    Real path would run a vision model loaded once per actor; the stub
    emits a deterministic hash-derived vector (unit-norm) so downstream
    similarity search is exercised end-to-end.
    """

    def __init__(self, dim: int = 16):
        self.dim = dim
        self.model = None  # STUB: no vision model in this container

    def _grid_pool(self, pix: np.ndarray) -> np.ndarray:
        """Real content feature for decodable images: grayscale →
        g×g block-mean grid (g = ⌈√dim⌉) → first `dim` cells, unit-norm."""
        gray = pix.astype(np.float64).mean(axis=2)
        g = int(np.ceil(np.sqrt(self.dim)))
        h, w = gray.shape
        ys = np.linspace(0, h, g + 1).astype(int)
        xs = np.linspace(0, w, g + 1).astype(int)
        cells = [
            gray[ys[i]: max(ys[i + 1], ys[i] + 1),
                 xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
            for i in range(g)
            for j in range(g)
        ]
        v = np.asarray(cells[: self.dim], dtype=np.float64)
        if v.size < self.dim:
            v = np.pad(v, (0, self.dim - v.size))
        n = np.linalg.norm(v)
        return (v / n if n else v).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for p in t["payload"].to_pylist():
            decoded = decode_netpbm(p or b"")
            if decoded is not None:
                feats.append(self._grid_pool(decoded[2]))
                continue
            # STUB fallback: deterministic hash-derived vector
            seed = int.from_bytes((p or b"\0")[:8].ljust(8, b"\0"), "little")
            rng = np.random.default_rng(seed % (2**63))
            v = rng.standard_normal(self.dim)
            v /= np.linalg.norm(v) or 1.0
            feats.append(v.astype(np.float32))
        return pa.table(
            {
                "item_id": t["item_id"],
                "feature": pa.array(
                    [f.tolist() for f in feats],
                    type=pa.list_(pa.float32(), self.dim),
                ),
            }
        )


def decode_images(
    ds: rd.Dataset, concurrency: tuple[int, int] = (1, 4), batch_size: int = 64
) -> rd.Dataset:
    """Small batches: binary payloads are wide rows (memory-aware sizing)."""
    return ds.map_batches(
        DecodeImageStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_features(
    ds: rd.Dataset,
    dim: int = 16,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> rd.Dataset:
    return ds.map_batches(
        ImageFeatureStage,
        fn_constructor_args=(dim,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class DecodeAudioStage:
    """Actor-pool stage: WAV payload → (sample_rate, n_samples, rms, ok).

    REAL decode via the stdlib ``wave`` module (PCM 8/16/32-bit), frames
    → numpy for the RMS; non-WAV payloads report ok=False."""

    _WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}

    def _decode_one(self, payload: bytes):
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as w:
                rate = w.getframerate()
                n = w.getnframes()
                width = w.getsampwidth()
                frames = w.readframes(n)
            dtype = self._WIDTH_DTYPE.get(width)
            if dtype is None:
                return 0, 0, 0.0, False
            x = np.frombuffer(frames, dtype=dtype).astype(np.float64)
            if width == 1:
                x -= 128.0  # 8-bit WAV is unsigned
            rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
            return rate, n, rms, True
        except Exception:
            return 0, 0, 0.0, False

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [self._decode_one(p or b"") for p in t["payload"].to_pylist()]
        rate, n, rms, ok = zip(*rows) if rows else ((), (), (), ())
        return pa.table(
            {
                "item_id": t["item_id"],
                "mime": t["mime"],
                "sample_rate": pa.array(rate, type=pa.int32()),
                "n_samples": pa.array(n, type=pa.int64()),
                "rms": pa.array(rms, type=pa.float64()),
                "ok": pa.array(ok, type=pa.bool_()),
            }
        )


def decode_audio(
    ds: rd.Dataset, concurrency: tuple[int, int] = (1, 4), batch_size: int = 64
) -> rd.Dataset:
    return ds.map_batches(
        DecodeAudioStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Inverse of DecodeAudioStage for test fixtures (16-bit mono PCM)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def image_roundtrip_stats(sf_dir: str) -> "pd.DataFrame":
    """Driver-gated proof of the REAL image codec: deterministically
    render a PPM per document (size derived from n_chars), push the
    binary payloads through the actor-pool decode stage, and report the
    decoded dimensions. The DuckDB twin computes the expected sizes
    directly from `documents` — any decoder drift breaks the hash."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def render(t: pa.Table) -> pa.Table:
        ids = t["item_id" if "item_id" in t.column_names else "doc_id"]
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        payloads = []
        for nc in n:
            w = int(nc % 16 + 2)
            h = int(nc // 16 % 16 + 2)
            grad = (
                np.arange(w * h * 3, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(h, w, 3)
            payloads.append(encode_ppm(grad))
        return pa.table(
            {
                "item_id": ids,
                "payload": pa.array(payloads, type=pa.binary()),
                "mime": pa.array(
                    ["image/x-ppm"] * t.num_rows, type=pa.string()
                ),
            }
        )

    out = (
        decode_images(ds.map_batches(render, batch_format="pyarrow"))
        .to_pandas()
        .rename(columns={"item_id": "doc_id"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["ok"].all()
    out["width"] = out["width"].astype("int64")
    out["height"] = out["height"].astype("int64")
    return out[["doc_id", "width", "height"]]


IMAGE_ROUNDTRIP_SQL = """
    SELECT doc_id,
           n_chars % 16 + 2 AS width,
           n_chars // 16 % 16 + 2 AS height
    FROM documents
    ORDER BY doc_id
"""


def _netpbm_end_offset(payload: bytes) -> int | None:
    """Byte length of the netpbm image at the head of `payload`."""
    if not payload.startswith((b"P5", b"P6")):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    if len(fields) < 3 or i >= n:
        return None
    width, height, maxval = fields
    bpp = 1 if maxval < 256 else 2
    return i + 1 + width * height * channels * bpp


class ResizeImageStage:
    """Actor-pool stage: payload → payload resized to (out_w, out_h).
    REAL nearest-neighbor resize for netpbm payloads (numpy index grids,
    no deps); non-decodable payloads pass through with ok=False."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def _resize_one(self, payload: bytes) -> tuple[bytes, bool]:
        decoded = decode_netpbm(payload or b"")
        if decoded is None:
            return payload or b"", False
        w, h, pix = decoded
        ys = np.minimum(
            (np.arange(self.out_h) * h) // self.out_h, h - 1
        )
        xs = np.minimum(
            (np.arange(self.out_w) * w) // self.out_w, w - 1
        )
        out = pix[np.ix_(ys, xs)]
        return encode_ppm(out.astype(np.uint8)), True

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [self._resize_one(p) for p in t["payload"].to_pylist()]
        payloads, ok = zip(*rows) if rows else ((), ())
        return pa.table(
            {
                "item_id": t["item_id"],
                "mime": t["mime"],
                "payload": pa.array(list(payloads), type=pa.binary()),
                "ok": pa.array(list(ok), type=pa.bool_()),
            }
        )


def resize_images(
    ds: rd.Dataset,
    out_w: int = 32,
    out_h: int = 32,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> rd.Dataset:
    return ds.map_batches(
        ResizeImageStage,
        fn_constructor_args=(out_w, out_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampleStage:
    """Actor-pool stage: "video" payload (a concatenation of netpbm
    frames — the dependency-free container stand-in for real video) →
    one row per SAMPLED frame (every `stride`-th), flat_map-style.
    Real video codecs (cv2/ffmpeg) would slot into _iter_frames; absent
    here, non-netpbm payloads yield zero frames."""

    def __init__(self, stride: int = 2, max_frames: int = 64):
        self.stride = stride
        self.max_frames = max_frames

    def _iter_frames(self, payload: bytes):
        off = 0
        while off < len(payload):
            ln = _netpbm_end_offset(payload[off:])
            if ln is None:
                return
            yield payload[off : off + ln]
            off += ln

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_idx, out_frame = [], [], []
        for item_id, p in zip(
            t["item_id"].to_pylist(), t["payload"].to_pylist()
        ):
            for i, frame in enumerate(self._iter_frames(p or b"")):
                if i % self.stride:
                    continue
                out_id.append(item_id)
                out_idx.append(i)
                out_frame.append(frame)
                if len(out_frame) >= self.max_frames:
                    break
        return pa.table(
            {
                "item_id": pa.array(out_id, type=pa.int64()),
                "frame_index": pa.array(out_idx, type=pa.int32()),
                "frame": pa.array(out_frame, type=pa.binary()),
            }
        )


def sample_frames(
    ds: rd.Dataset,
    stride: int = 2,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 16,
) -> rd.Dataset:
    """Small batches: video payloads are the widest rows in the engine."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(stride,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
