"""Multimodal column stages — real Ray plumbing, stubbed codecs.

Image/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages (decoder
state loaded once per actor in ``__init__``). The decode kernels themselves
are STUBBED in this container (no PIL/cv2/ffmpeg): each stage tries the real
import, and otherwise falls back to a clearly-marked deterministic fake so
the schema/batching/actor plumbing is real and testable.

Schema contract:
    input : (item_id: int64, payload: binary, mime: string)
    decode: + (width: int32, height: int32, ok: bool)
    feats : + (feature: list<float>[dim])
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

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
        if self._pil is not None:
            import io

            try:
                with self._pil.open(io.BytesIO(payload)) as im:
                    return im.width, im.height, True
            except Exception:
                return 0, 0, False
        if not payload:
            return 0, 0, False
        # deterministic fake: size derived from payload content
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

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for p in t["payload"].to_pylist():
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
