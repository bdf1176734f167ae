"""Varbyte/delta codec properties (SURVEY.md §5 item 2)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nextsearch_api_spark.functions.codec import (
    decode_chunk, encode_chunk, varbyte_decode, varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=60, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_single_byte_values():
    arr = np.arange(0, 128, dtype=np.uint64)
    enc = varbyte_encode(arr)
    assert len(enc) == 128  # every value < 2^7 → exactly one byte
    assert np.array_equal(varbyte_decode(enc), arr)


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1,
             max_size=500, unique=True),
    st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=40, deadline=None)
def test_chunk_roundtrip(doc_ids, seed):
    rng = np.random.default_rng(seed)
    ids = np.sort(np.array(doc_ids, dtype=np.int64))
    tfs = rng.integers(1, 1000, size=len(ids)).astype(np.int64)
    dls = rng.integers(1, 5000, size=len(ids)).astype(np.int64)
    blob, tf_off, dl_off = encode_chunk(ids, tfs, dls)
    d_ids, d_tfs, d_dls = decode_chunk(blob, tf_off, dl_off)
    assert np.array_equal(d_ids, ids)
    assert np.array_equal(d_tfs, tfs)
    assert np.array_equal(d_dls, dls)


def test_chunk_compression_beats_raw():
    # dense doc ids → gaps ~1 → ~3 bytes/posting vs 8 raw (ref stores 2×u32)
    ids = np.arange(10_000, 20_000, 2, dtype=np.int64)
    tfs = np.ones(len(ids), dtype=np.int64)
    dls = np.full(len(ids), 300, dtype=np.int64)
    blob, *_ = encode_chunk(ids, tfs, dls)
    assert len(blob) < len(ids) * 8


def test_decode_chunks_concat_matches_per_chunk():
    """Batched 3-pass decode == per-chunk decode for many chunks."""
    import numpy as np

    from nextsearch_api_spark.functions.codec import (
        decode_chunk, decode_chunks_concat, encode_chunk,
    )

    rng = np.random.default_rng(9)
    blobs, tfo, dlo, counts = [], [], [], []
    exp_ids, exp_tfs, exp_dls = [], [], []
    for ci in range(7):
        n = int(rng.integers(1, 200))
        ids = np.cumsum(rng.integers(1, 50, n)) + ci * 100000
        tfs = rng.integers(1, 300, n)
        dls = rng.integers(1, 5000, n)
        blob, to, do = encode_chunk(ids, tfs, dls)
        blobs.append(blob); tfo.append(to); dlo.append(do); counts.append(n)
        d_ids, d_tfs, d_dls = decode_chunk(blob, to, do)
        exp_ids.append(d_ids); exp_tfs.append(d_tfs); exp_dls.append(d_dls)
    g_ids, g_tfs, g_dls = decode_chunks_concat(blobs, tfo, dlo, counts)
    assert (g_ids == np.concatenate(exp_ids)).all()
    assert (g_tfs == np.concatenate(exp_tfs)).all()
    assert (g_dls == np.concatenate(exp_dls)).all()
    z_ids, z_tfs, z_dls = decode_chunks_concat([], [], [], [])
    assert len(z_ids) == len(z_tfs) == len(z_dls) == 0
