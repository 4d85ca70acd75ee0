import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.functions.codec import (
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_hand():
    for vals in ([0], [1], [127], [128], [16383], [16384], [2**63 - 1], [2**64 - 1],
                 [0, 1, 127, 128, 300, 2**40, 5]):
        arr = np.array(vals, dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)).size == 0
    assert varbyte_decode(np.array([], dtype=np.uint8)).size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=10000),
        ),
        max_size=100,
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(entries):
    by_id = {e[0]: e for e in entries}
    ids = np.array(sorted(by_id), dtype=np.int64)
    tfs = np.array([by_id[i][1] for i in ids], dtype=np.int64)
    lens = np.array([by_id[i][2] for i in ids], dtype=np.int64)
    di, dt, dl = decode_postings(encode_postings(ids, tfs, lens))
    assert di.tolist() == ids.tolist()
    assert dt.tolist() == tfs.tolist()
    assert dl.tolist() == lens.tolist()
    assert di.dtype == np.int64
