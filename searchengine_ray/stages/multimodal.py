"""Multimodal column plumbing — opaque binary payloads with typed
metadata, decoded by actor-pool stages.

The image/audio libraries are not available in this container, so the
decode step is STUBBED: ``mode="fake"`` computes deterministic metadata
(byte length, md5, synthetic dimensions) from the payload bytes;
``mode="real"`` raises NotImplementedError at the exact point a Pillow/
ffmpeg call would go.  Everything around the stub — schema (binary
column + metadata), small batch sizes for large rows, actor signature,
output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("payload", pa.large_binary()), ("media_type", pa.string())]
)


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real media decode requires Pillow/ffmpeg, not present in this "
                "container; run with mode='fake' for the deterministic stub"
            )
        payloads = batch["payload"].to_pylist()
        n_bytes = np.array([len(p) for p in payloads], dtype=np.int64)
        md5s = [hashlib.md5(p).hexdigest() for p in payloads]
        # synthetic dimensions — pure functions of the byte length so the
        # DuckDB oracle can reproduce them
        width = n_bytes % 640 + 1
        height = (n_bytes * 7) % 480 + 1
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "payload_md5": pa.array(md5s, pa.string()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
            }
        )


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
