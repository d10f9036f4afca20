"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a sidecar metadata
struct. The IMAGE kernels (decode / feature / resize) are dual-path: a real
PIL branch when the library imports, and a clearly-marked deterministic
stub otherwise (PIL is absent in this container; ``strict=True`` refuses
the stub). Audio/video kernels remain stubs (soundfile/ffmpeg absent). The
Ray-side plumbing is real and tested either way: schemas, actor-pool stage
signatures, batch sizing for wide binary rows, and output layout; the
real-PIL branch is covered by skip-marked tests that run wherever PIL
exists.

Batch-size guidance encoded here: payload stages default to small
``batch_size`` (64) so batch x concurrency of multi-MB blobs fits worker
heaps; callers scale it by payload size (SURVEY §"memory-aware").
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("meta", pa.struct([
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ])),
])

DEFAULT_MEDIA_BATCH_SIZE = 64


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class ImageDecodeStage:
    """Actor-pool stage: decode image payloads -> (height, width, channels).

    Dual-path kernel, same contract as :class:`ImageResizeStage`: a REAL
    PIL branch when the library imports (loaded once per actor), and a
    deterministic hash-derived (h, w, c) stub otherwise (PIL is absent in
    this container), so the pipeline shape, schema and actor lifecycle are
    fully exercised either way. ``strict=True`` refuses to run on the stub
    branch. A corrupt/undecodable payload on the real branch falls through
    to the stub values rather than killing the task — one truncated image
    must not fail a corpus-scale decode.
    """

    def __init__(self, strict: bool = False) -> None:
        self.pil = _try_import_pil()
        self.strict = strict
        if strict and self.pil is None:
            raise NotImplementedError(
                "image decode requires PIL/opencv; not available in this container"
            )

    def _decode(self, payload: bytes):
        """-> (height, width, channels, decode_ok). Real-branch failures
        return (None, None, None, False) — nulls, never fabricated dims —
        or raise under strict=True."""
        if self.pil is not None:
            import io

            try:
                with self.pil.open(io.BytesIO(payload)) as im:
                    return im.height, im.width, len(im.getbands()), True
            except Exception as exc:
                if self.strict:
                    raise ValueError(
                        "strict=True: undecodable image payload "
                        f"({len(payload or b'')} bytes)") from exc
                return None, None, None, False
        # deterministic fake: dimensions derived from the payload digest
        digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
        h = 64 + digest[0] % 192
        w = 64 + digest[1] % 192
        return h, w, 3, False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        dims = [self._decode(p) for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "height": pa.array([d[0] for d in dims], pa.int32()),
            "width": pa.array([d[1] for d in dims], pa.int32()),
            "channels": pa.array([d[2] for d in dims], pa.int32()),
            "decode_ok": pa.array([d[3] for d in dims], pa.bool_()),
            "payload_bytes": pc.cast(pc.binary_length(batch.column("payload")), pa.int64()),
        })


class ImageFeatureStage:
    """Actor-pool stage: payload -> fixed-size feature vector.

    Dual-path kernel: with PIL importable the feature is a 32-dim random
    projection of the DECODED grayscale pixel histogram (a real, cheap
    visual signature; a learned model plugs into the same slot — loaded
    once per actor in ``__init__``). Without PIL (this container) the
    deterministic stub projects the raw payload byte histogram instead —
    same schema, same determinism. ``strict=True`` refuses the stub
    branch and raises on an undecodable payload on the real branch; with
    ``strict=False`` a corrupt payload falls back to the byte histogram,
    and the ``decode_ok`` column marks it False so downstream never mixes
    the two feature spaces unknowingly (False for every stub-branch row
    too)."""

    DIM = 32

    def __init__(self, strict: bool = False) -> None:
        rng = np.random.default_rng(13)
        self.projection = rng.normal(size=(256, self.DIM))
        self.pil = _try_import_pil()
        self.strict = strict
        if strict and self.pil is None:
            raise NotImplementedError(
                "image features require PIL; not available in this container"
            )

    def _histogram(self, payload: bytes):
        """-> (256-bin histogram, decode_ok)."""
        if self.pil is not None:
            import io

            try:
                with self.pil.open(io.BytesIO(payload)) as im:
                    counts = np.asarray(im.convert("L").histogram(),
                                        dtype=np.float64)[:256]
                    return counts / max(counts.sum(), 1.0), True
            except Exception as exc:
                if self.strict:
                    raise ValueError(
                        "strict=True: undecodable image payload "
                        f"({len(payload or b'')} bytes)") from exc
                # corrupt payload: byte-histogram fallback, marked below
        if not payload:
            return np.zeros(256, dtype=np.float64), False
        counts = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                             minlength=256)
        return counts / max(len(payload), 1), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        hists = [self._histogram(p)
                 for p in batch.column("payload").to_pylist()]
        feats = [(h @ self.projection).tolist() for h, _ in hists]
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(feats, pa.list_(pa.float64())),
            "decode_ok": pa.array([ok for _, ok in hists], pa.bool_()),
        })


class ImageResizeStage:
    """Actor-pool stage: resize image payloads to ``(target, target)`` and
    re-emit the bytes. PIL branch does a real thumbnail + re-encode; the
    deterministic stub re-emits a hash-derived payload of the right
    ballpark size so batch sizing / object-store behavior downstream is
    realistic. Output schema is identical in both branches; ``decode_ok``
    marks rows whose payload is a REAL re-encoded thumbnail (always False
    on the stub branch). ``strict=True`` raises on an undecodable payload
    on the real branch."""

    def __init__(self, target: int = 224, strict: bool = False) -> None:
        self.pil = _try_import_pil()
        self.target = target
        self.strict = strict
        if strict and self.pil is None:
            raise NotImplementedError(
                "image resize requires PIL; not available in this container")

    def _resize(self, payload: bytes):
        """-> (payload bytes, decode_ok)."""
        if self.pil is not None:
            import io

            try:
                with self.pil.open(io.BytesIO(payload)) as im:
                    im.thumbnail((self.target, self.target))
                    buf = io.BytesIO()
                    im.save(buf, format="PNG")
                    return buf.getvalue(), True
            except Exception as exc:
                # corrupt/undecodable payload: strict raises; otherwise
                # fall through to the deterministic stub (marked) — one
                # truncated image must not fail a corpus-scale resize
                if self.strict:
                    raise ValueError(
                        "strict=True: undecodable image payload "
                        f"({len(payload or b'')} bytes)") from exc
        # deterministic stub: expanded digest sized ~ target^2 * 0.3
        # (a plausible compressed-thumbnail byte count)
        seed = hashlib.blake2b(payload or b"", digest_size=32).digest()
        n = max(64, int(self.target * self.target * 0.3))
        reps = -(-n // len(seed))
        return (seed * reps)[:n], False

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize(p) for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array([o for o, _ in out], pa.large_binary()),
            "resized_bytes": pa.array([len(o) for o, _ in out], pa.int64()),
            "decode_ok": pa.array([ok for _, ok in out], pa.bool_()),
        })


class FrameSampleStage:
    """Actor-pool stage: sample frame offsets from a video payload.

    STUB: emits deterministic byte offsets for every_n 'frames'; a real
    implementation would call ffmpeg/pyav (absent here)."""

    def __init__(self, every_n: int = 10, frame_size_hint: int = 4096) -> None:
        self.every_n = every_n
        self.frame_size_hint = frame_size_hint

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offsets = [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload").to_pylist()):
            n_frames = max(len(p or b"") // self.frame_size_hint, 1)
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                offsets.append(f * self.frame_size_hint)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_offset": pa.array(offsets, pa.int64()),
        })


class AudioFeatureStage:
    """Actor-pool stage: audio payload -> duration estimate + level stats.

    STUB decode: payload bytes are treated as 16-bit PCM mono at
    ``sample_rate`` (a real implementation would call soundfile/librosa —
    absent in this container); the Ray plumbing (typed schema, actor
    signature, batch sizing) is real. Emits (media_id, duration_ms, rms,
    peak, clipped_ratio)."""

    def __init__(self, sample_rate: int = 16_000) -> None:
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        dur = np.zeros(batch.num_rows, dtype=np.float64)
        rms = np.zeros(batch.num_rows, dtype=np.float64)
        peak = np.zeros(batch.num_rows, dtype=np.float64)
        clipped = np.zeros(batch.num_rows, dtype=np.float64)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            raw = (p or b"")[: len(p or b"") // 2 * 2]
            if not raw:
                continue
            pcm = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
            dur[i] = len(pcm) / self.sample_rate * 1000.0
            rms[i] = float(np.sqrt(np.mean(pcm * pcm)))
            peak[i] = float(np.abs(pcm).max())
            clipped[i] = float(np.mean(np.abs(pcm) >= 0.999))
        return pa.table({
            "media_id": ids,
            "duration_ms": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "peak": pa.array(peak, pa.float64()),
            "clipped_ratio": pa.array(clipped, pa.float64()),
        })


def extract_audio_features(ds, sample_rate: int = 16_000, concurrency=(1, 4),
                           batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"sample_rate": sample_rate},
    )


def decode_images(ds, strict: bool = False, concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"strict": strict})


def extract_image_features(ds, strict: bool = False, concurrency=(1, 4),
                           batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"strict": strict})


def resize_images(ds, target: int = 224, strict: bool = False,
                  concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    """Resize via an actor pool; small batches — payloads are large."""
    return ds.map_batches(ImageResizeStage,
                          fn_constructor_args=(target, strict),
                          batch_format="pyarrow", concurrency=concurrency,
                          batch_size=batch_size)


def sample_frames(ds, every_n: int = 10, concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"every_n": every_n},
    )


def synthetic_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(1024, 65536)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/fake"] * n, pa.string()),
        "meta": pa.array([{"width": 0, "height": 0, "duration_ms": 0}] * n,
                         MEDIA_SCHEMA.field("meta").type),
    })
