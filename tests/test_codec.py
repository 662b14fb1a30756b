import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datamart_ray.index import codec


def test_varbyte_roundtrip_simple():
    a = np.array([0, 1, 127, 128, 300, 2**14, 2**21 + 5, 2**40], dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(a)), a)


def test_varbyte_empty():
    assert codec.varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varbyte_decode(b"").size == 0


def test_varbyte_single_byte_values_compact():
    a = np.arange(100, dtype=np.uint64)
    assert len(codec.varbyte_encode(a)) == 100


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varbyte_roundtrip_property(values):
    a = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300
    )
)
def test_docids_roundtrip_property(gaps):
    docids = np.cumsum(np.array(gaps, dtype=np.int64))
    assert np.array_equal(codec.decode_docids(codec.encode_docids(docids)), docids)


@pytest.mark.parametrize(
    "values", [[0], [255], [256], [65535], [65536], [2**32 - 1], [2**32], [1, 2**40, 3]]
)
def test_pack_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    out = codec.unpack_ints(codec.pack_ints(a))
    assert np.array_equal(out.astype(np.uint64), a)


def test_pack_width_selection():
    assert len(codec.pack_ints(np.array([1, 2, 3]))) == 1 + 3
    assert len(codec.pack_ints(np.array([1, 300]))) == 1 + 4
    assert len(codec.pack_ints(np.array([2**33]))) == 1 + 8
