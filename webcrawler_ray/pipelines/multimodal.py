"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The image/audio codec libraries are NOT in this container, so the codec
call itself is STUBBED (`DecodeStage.decode_pixels` raises
NotImplementedError; `decode_meta` parses a deterministic fake header
instead). Everything around the stub — schema, small-batch actor-pool
stage, binary-column handling, output layout — is the real Ray-side
plumbing and is tested.

The synthetic payload is derived deterministically from the documents
table: a 16-byte header (magic, width, height, n_frames) + the utf-8 text
bytes as the "pixel" body. At real scale the payload column dominates
block size: the stage uses small ``batch_size`` and projects the binary
column away immediately after decode (SURVEY.md §4 wide-binary rule).
"""

from __future__ import annotations

from ..io_utils import read_parquet_clean as _rpq

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FIMG"
HEADER_FMT = "<4sIII"  # magic, width, height, n_frames
HEADER_SIZE = struct.calcsize(HEADER_FMT)  # 16


def synthesize_payloads(ray, sf_dir: str):
    """documents -> (doc_id, media: binary) with a parseable fake header."""
    ds = _rpq(ray, f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        blobs = []
        for d, t in zip(ids, texts):
            w = 16 + (d % 32) * 8
            h = 16 + (d % 24) * 8
            nf = 1 + d % 4
            blobs.append(struct.pack(HEADER_FMT, MAGIC, w, h, nf)
                         + t.encode("utf-8"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "media": pa.array(blobs, pa.binary())})

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=512)


class DecodeStage:
    """Actor-pool decode stage: header parse is real; pixel decode is the
    clearly-marked stub for the absent codec libraries."""

    def __init__(self):
        self.header_fmt = HEADER_FMT  # "codec init" happens once per actor

    @staticmethod
    def decode_pixels(blob: bytes) -> "np.ndarray":
        raise NotImplementedError(
            "image codec not available in this environment; the real "
            "implementation decodes blob[16:] into an HxWxC array")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("media").to_pylist()
        ws, hs, fs, nb, ok = [], [], [], [], []
        for blob in blobs:
            nb.append(len(blob))
            if len(blob) >= HEADER_SIZE and blob[:4] == MAGIC:
                _, w, h, nf = struct.unpack(self.header_fmt,
                                            blob[:HEADER_SIZE])
                ws.append(w)
                hs.append(h)
                fs.append(nf)
                ok.append(True)
            else:
                ws.append(0)
                hs.append(0)
                fs.append(0)
                ok.append(False)
        # project the wide binary column away as early as possible
        return pa.table({"doc_id": batch.column("doc_id"),
                         "width": pa.array(ws, pa.int64()),
                         "height": pa.array(hs, pa.int64()),
                         "n_frames": pa.array(fs, pa.int64()),
                         "n_bytes": pa.array(nb, pa.int64()),
                         "decode_ok": pa.array(ok, pa.bool_())})


def decode_meta(ray, sf_dir: str, concurrency: int = 2):
    """(doc_id, width, height, n_frames, n_bytes, decode_ok) via the
    actor-pool decode stage over the synthesized binary column."""
    ds = synthesize_payloads(ray, sf_dir)
    out = ds.map_batches(DecodeStage, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency)
    return out.sort("doc_id")


class FrameSampleStage:
    """Actor-pool frame-sampling stage: explode each media payload into
    one row per sampled frame with its byte range — the video-pipeline
    plumbing (schema, explode, offsets); the pixel decode of a frame is
    the same stub as DecodeStage.decode_pixels."""

    def __init__(self, every_nth: int = 1):
        self.every_nth = every_nth

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        o_id, o_fi, o_start, o_len = [], [], [], []
        for d, blob in zip(ids, blobs):
            if len(blob) < HEADER_SIZE or blob[:4] != MAGIC:
                continue
            _, w, h, nf = struct.unpack(HEADER_FMT, blob[:HEADER_SIZE])
            body = len(blob) - HEADER_SIZE
            per = max(1, body // max(nf, 1))
            for fi in range(0, nf, self.every_nth):
                o_id.append(d)
                o_fi.append(fi)
                o_start.append(HEADER_SIZE + fi * per)
                o_len.append(per)
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "frame_idx": pa.array(o_fi, pa.int64()),
                         "byte_start": pa.array(o_start, pa.int64()),
                         "byte_len": pa.array(o_len, pa.int64())})


def frame_samples(ray, sf_dir: str, concurrency: int = 2):
    """(doc_id, frame_idx, byte_start, byte_len): sampled-frame explode
    over the binary media column."""
    ds = synthesize_payloads(ray, sf_dir)
    out = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency)
    return out.sort(["doc_id", "frame_idx"])
