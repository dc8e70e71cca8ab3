"""Compressed posting blocks: delta + varint doc-ids, varint tfs,
float32 scores, per-block max-score / doc-range metadata (north rule).

Layout decision for 100 TB: blocks are keyed by (term, doc_id // SPAN) —
doc-id-RANGE aligned, not fixed-count. Rationale:

* a fixed-count layout (every 128th posting starts a block) needs a rank
  within the term's posting list = a window partitioned BY TERM — a stop
  term with 10^10 postings serializes into one task. Range-aligned blocks
  are computable with a narrow expression (``doc_id // SPAN``); a heavy
  term just produces many groups → groupBy parallelizes it. This IS the
  skew handling for posting construction (no explicit salting needed: the
  composite key (term, blk) is the salt, and it's deterministic).
* WAND-style skipping wants monotone doc-id ranges per block anyway; range
  alignment gives every term the SAME bucket grid, so per-bucket upper
  bounds across query terms are a groupBy away (see wand.py).

Encoding (pure little-endian varint, first doc-id delta-encoded against the
block's range start): deterministic — byte-identical across cluster sizes,
which the checkpoint/resume equality test relies on.

Reference parity note: BERTopic persists its index as raw CSR triplets
(``bertopic/_bertopic.py:5097-5117``); the compression layer is the north
rule's addition, not the reference's.
"""

from __future__ import annotations

import struct
from typing import Iterable, List, Tuple

DEFAULT_SPAN = 4096  # doc-ids per block bucket


def _varint_encode(values: Iterable[int], out: bytearray) -> None:
    for v in values:
        if v < 0:
            raise ValueError(f"varint value must be >= 0, got {v}")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break


def _varint_decode(buf: bytes, pos: int, n: int) -> Tuple[List[int], int]:
    vals = []
    for _ in range(n):
        shift = 0
        v = 0
        while True:
            b = buf[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        vals.append(v)
    return vals, pos


def encode_block(doc_ids: List[int], tfs: List[int], scores: List[float],
                 range_start: int) -> bytes:
    """Encode one block's postings (doc_ids ascending within the block).

    Payload: varint n; varint first_doc_delta (vs range_start); varint
    doc-id gaps; varint tfs; float64 scores (little-endian).
    Scores stay float64 so the WAND path is bit-identical to the exhaustive
    scorer (rank-identity gate); ids/tfs carry the compression win.
    """
    if not doc_ids:
        return b""
    out = bytearray()
    _varint_encode([len(doc_ids)], out)
    deltas = [doc_ids[0] - range_start]
    deltas.extend(doc_ids[i] - doc_ids[i - 1] for i in range(1, len(doc_ids)))
    _varint_encode(deltas, out)
    _varint_encode(tfs, out)
    out += struct.pack(f"<{len(scores)}d", *scores)
    return bytes(out)


def decode_block(payload: bytes, range_start: int) -> Tuple[List[int], List[int], List[float]]:
    if not payload:
        return [], [], []
    (n,), pos = _varint_decode(payload, 0, 1)
    deltas, pos = _varint_decode(payload, pos, n)
    tfs, pos = _varint_decode(payload, pos, n)
    scores = list(struct.unpack_from(f"<{n}d", payload, pos))
    doc_ids = []
    acc = range_start
    for i, d in enumerate(deltas):
        acc = acc + d if i else range_start + d
        doc_ids.append(acc)
    return doc_ids, tfs, scores
