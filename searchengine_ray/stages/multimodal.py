"""Multimodal column plumbing — opaque binary payloads with typed
metadata, decoded by actor-pool stages.

The image/audio libraries are not available in this container, so the
general decode step is gated: ``mode="fake"`` computes deterministic
metadata (byte length, md5, synthetic dimensions) from the payload
bytes; ``mode="real"`` uses Pillow when importable and otherwise falls
back to the pure-numpy PPM (P6) codec below — so the real compute path
(decode → pixel work → re-encode) is EXECUTED and tested on generated
PPM images, and only non-PPM formats raise pending Pillow/ffmpeg.
Everything around the decode — schema (binary column + metadata), small
batch sizes for large rows, actor signature, output layout — is real
either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# pure-numpy PPM (P6) codec — the container-independent real-decode path
# ---------------------------------------------------------------------------

def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 ndarray [h, w, 3].  Pure numpy: header
    token parse + one frombuffer reshape (maxval must be < 256)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval tokens (comments stripped),
    # then ONE whitespace byte, then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    if maxval >= 256:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    pix = np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 ndarray [h, w, 3] → binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize as two vectorized index gathers."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[yi][:, xi]

PAYLOAD_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("payload", pa.large_binary()), ("media_type", pa.string())]
)

# Pillow availability is probed ONCE per process — Python does not cache
# failed imports, so retrying `from PIL import Image` per payload would pay
# a full sys.path scan + ImportError raise inside the hot decode loop.
_PIL_IMAGE = None
_PIL_PROBED = False


def _pil_image():
    global _PIL_IMAGE, _PIL_PROBED
    if not _PIL_PROBED:
        _PIL_PROBED = True
        try:
            from PIL import Image  # not in this container; real clusters have it

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = None
    return _PIL_IMAGE


def synth_payload_batch(batch: pa.Table) -> pa.Table:
    """documents → opaque binary payloads (deterministic stand-in for an
    image blob column: the utf8 bytes of the text)."""
    payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(["image/fake"] * batch.num_rows, pa.string()),
        }
    )


class DecodeStage:
    """Actor-pool decode stage.  One instance per actor; batch sizes must
    be small for real media (payload × batch_size bounded by worker heap).
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    @staticmethod
    def _decode_real(payload: bytes) -> np.ndarray:
        """Real pixel decode: Pillow when importable, else the numpy
        PPM codec; other formats need the absent libraries.  The try is
        narrowed to the import itself (via ``_pil_image``) so an
        ImportError raised INSIDE Pillow's plugin loading propagates as
        the real error instead of rerouting a valid JPEG to the stub."""
        Image = _pil_image()
        if Image is not None:
            from io import BytesIO

            return np.asarray(Image.open(BytesIO(payload)).convert("RGB"))
        if payload.startswith(b"P6"):
            return decode_ppm(payload)
        raise NotImplementedError(
            "real decode of non-PPM media requires Pillow/ffmpeg, not present "
            "in this container; PPM payloads decode via the numpy codec"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes = np.array([len(p) for p in payloads], dtype=np.int64)
        md5s = [hashlib.md5(p).hexdigest() for p in payloads]
        if self.mode == "real":
            imgs = [self._decode_real(p) for p in payloads]
            width = np.array([i.shape[1] for i in imgs], dtype=np.int64)
            height = np.array([i.shape[0] for i in imgs], dtype=np.int64)
        else:
            # synthetic dimensions — pure functions of the byte length so
            # the DuckDB oracle can reproduce them
            width = n_bytes % 640 + 1
            height = (n_bytes * 7) % 480 + 1
        cols = {
            "doc_id": batch["doc_id"],
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "payload_md5": pa.array(md5s, pa.string()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
        }
        if self.mode == "real":
            # real chains (decode → resize → …) need the payload to keep
            # flowing; fake mode stays metadata-only for the oracle
            cols["payload"] = batch["payload"]
        return pa.table(cols)


def multimodal_meta(sf_dir: str):
    """documents → payload column → decode-stub metadata (Ray pipeline)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(synth_payload_batch, batch_format="pyarrow").map_batches(
        DecodeStage,
        fn_constructor_args=("fake",),
        batch_format="pyarrow",
        batch_size=1024,  # small batches: binary rows are wide
        concurrency=(1, 4),
    )


class ResizeStage:
    """Image-resize planning stage (actor pool).  The geometry — target
    dims preserving aspect ratio, bounded by ``max_side`` — is computed
    for real; in ``mode="real"`` the batch must carry the ``payload``
    column and the stage DOES the pixel work (numpy PPM decode →
    nearest-neighbour gather → PPM re-encode; Pillow when importable),
    emitting the resized payload alongside the dims."""

    def __init__(self, max_side: int = 256, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.max_side = max_side
        self.mode = mode

    def _resize_real(self, batch: pa.Table) -> pa.Table:
        out_rows = {"doc_id": [], "width": [], "height": [],
                    "out_w": [], "out_h": [], "resized": []}
        for did, payload in zip(batch["doc_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            img = DecodeStage._decode_real(payload)
            h, w = img.shape[:2]
            long_side = max(w, h)
            if long_side <= self.max_side:
                ow, oh = w, h
            else:
                ow = max(1, (w * self.max_side) // long_side)
                oh = max(1, (h * self.max_side) // long_side)
            small = resize_nearest(img, ow, oh)
            out_rows["doc_id"].append(did)
            out_rows["width"].append(w)
            out_rows["height"].append(h)
            out_rows["out_w"].append(ow)
            out_rows["out_h"].append(oh)
            out_rows["resized"].append(encode_ppm(small))
        return pa.table(
            {
                "doc_id": pa.array(out_rows["doc_id"], pa.int64()),
                "width": pa.array(out_rows["width"], pa.int64()),
                "height": pa.array(out_rows["height"], pa.int64()),
                "out_w": pa.array(out_rows["out_w"], pa.int64()),
                "out_h": pa.array(out_rows["out_h"], pa.int64()),
                "resized": pa.array(out_rows["resized"], pa.large_binary()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            return self._resize_real(batch)
        w = batch["width"].to_numpy()
        h = batch["height"].to_numpy()
        long_side = np.maximum(w, h)
        # integer floor scaling, no upscale (scale clamps at 1.0)
        out_w = np.where(long_side <= self.max_side, w,
                         np.maximum(1, (w * self.max_side) // long_side))
        out_h = np.where(long_side <= self.max_side, h,
                         np.maximum(1, (h * self.max_side) // long_side))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": batch["width"],
                "height": batch["height"],
                "out_w": pa.array(out_w.astype(np.int64), pa.int64()),
                "out_h": pa.array(out_h.astype(np.int64), pa.int64()),
            }
        )


def resized_meta(sf_dir: str, max_side: int = 256):
    """decode-stub dims → resize plan (chained actor-pool stages)."""
    return multimodal_meta(sf_dir).map_batches(
        ResizeStage,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


def sample_frames(sf_dir: str, frame_size: int = 256, every: int = 2):
    """Video-style frame sampling over the opaque payload: the payload is
    cut into ``frame_size``-byte frames and every ``every``-th frame is
    emitted as its own row (doc_id, frame_idx, frame_off, frame_len) —
    the 1→N row expansion + byte-slicing plumbing a real frame sampler
    needs, with the ffmpeg decode left to the ``DecodeStage`` stub
    boundary.  Fully vectorized (repeat + arange, no per-row loop)."""
    import ray.data as rd

    def expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # np.cumsum([])[:-1] would make `starts` 1-long vs 0 repeats
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int64()),
                    "frame_off": pa.array([], pa.int64()),
                    "frame_len": pa.array([], pa.int64()),
                }
            )
        n_bytes = np.array(
            [len(p) for p in batch["payload"].to_pylist()], dtype=np.int64
        )
        n_frames = (n_bytes + frame_size - 1) // frame_size
        n_sampled = (n_frames + every - 1) // every
        doc = np.repeat(batch["doc_id"].to_numpy(), n_sampled)
        starts = np.concatenate([[0], np.cumsum(n_sampled)[:-1]])
        local = np.arange(int(n_sampled.sum()), dtype=np.int64) - np.repeat(starts, n_sampled)
        fidx = local * every
        off = fidx * frame_size
        total = np.repeat(n_bytes, n_sampled)
        flen = np.minimum(frame_size, total - off)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame_off": pa.array(off, pa.int64()),
                "frame_len": pa.array(flen, pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(synth_payload_batch, batch_format="pyarrow").map_batches(
        expand, batch_format="pyarrow", batch_size=1024
    )
