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


def test_bp128_roundtrip_and_layout():
    """BP128 block bit packing: exact roundtrip across widths, block
    boundaries, zeros and the empty buffer; beats varbyte on size for
    small-delta streams (the measured trade: smaller, slower decode)."""
    import numpy as np

    from datamart_ray.index import codec

    rng = np.random.default_rng(3)
    cases = [
        np.empty(0, dtype=np.uint64),
        np.zeros(5, dtype=np.uint64),
        np.array([1], dtype=np.uint64),
        rng.integers(0, 2, size=127).astype(np.uint64),
        rng.integers(0, 50, size=128).astype(np.uint64),
        rng.integers(0, 2**20, size=129).astype(np.uint64),
        rng.integers(0, 2**63, size=1000).astype(np.uint64),
        (np.uint64(1) << np.uint64(63)) * np.ones(3, dtype=np.uint64),
        np.array([2**k for k in range(60)], dtype=np.uint64),  # width edges
    ]
    for v in cases:
        got = codec.bp128_decode(codec.bp128_encode(v))
        assert np.array_equal(got, v), v[:8]
    small = rng.integers(1, 60, size=100_000).astype(np.uint64)
    assert len(codec.bp128_encode(small)) < len(codec.varbyte_encode(small))
