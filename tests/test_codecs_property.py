"""Property-based codec tests (hypothesis): for arbitrary arrays + null
masks, every applicable scheme must round-trip bit-exactly on set positions
— the null-masked equality contract (storage/Chunk.cpp:48-96). Schemes with
preconditions (sorted, single-value, exception caps) may reject via
ValueError but must never silently corrupt."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from btrblocks_spark.format import codecs

settings.register_profile("codecs", max_examples=25, deadline=None)
settings.load_profile("codecs")


@st.composite
def int_column(draw):
    n = draw(st.integers(min_value=1, max_value=400))
    values = draw(
        st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            min_size=n, max_size=n,
        )
    )
    mask = draw(st.lists(st.booleans(), min_size=n, max_size=n))
    mask = np.array(mask, dtype=bool)
    if not mask.any():
        mask[0] = True
    return np.array(values, dtype=np.int64), mask


@st.composite
def double_column(draw):
    n = draw(st.integers(min_value=1, max_value=400))
    values = draw(
        st.lists(
            st.one_of(
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                st.integers(-10_000, 10_000).map(lambda x: x / 100.0),
            ),
            min_size=n, max_size=n,
        )
    )
    mask = np.array(draw(st.lists(st.booleans(), min_size=n, max_size=n)), dtype=bool)
    if not mask.any():
        mask[0] = True
    return np.array(values, dtype=np.float64), mask


@st.composite
def string_column(draw):
    n = draw(st.integers(min_value=1, max_value=200))
    values = draw(
        st.lists(
            st.text(alphabet="abcXYZ012 éü√", max_size=20),
            min_size=n, max_size=n,
        )
    )
    mask = np.array(draw(st.lists(st.booleans(), min_size=n, max_size=n)), dtype=bool)
    if not mask.any():
        mask[0] = True
    return np.array(values, dtype=object), mask


@given(int_column())
@pytest.mark.parametrize("scheme", sorted(codecs.INT_SCHEMES))
def test_int_property(scheme, col):
    values, mask = col
    filled = values.copy()
    filled[~mask] = filled[mask][0]
    try:
        enc = codecs.encode_int(scheme, filled, mask)
    except ValueError:
        return  # precondition rejection is allowed
    out = codecs.decode_int(enc)
    np.testing.assert_array_equal(np.asarray(out)[mask], filled[mask])


@given(double_column())
@pytest.mark.parametrize("scheme", sorted(codecs.DOUBLE_SCHEMES))
def test_double_property(scheme, col):
    values, mask = col
    filled = values.copy()
    filled[~mask] = filled[mask][0]
    try:
        enc = codecs.encode_double(scheme, filled, mask)
    except ValueError:
        return
    out = codecs.decode_double(enc)
    np.testing.assert_array_equal(
        np.asarray(out)[mask].view(np.int64), filled[mask].view(np.int64)
    )


@given(string_column())
@pytest.mark.parametrize("scheme", sorted(codecs.STRING_SCHEMES))
def test_string_property(scheme, col):
    values, mask = col
    filled = values.copy()
    filled[~mask] = filled[mask][0]
    try:
        enc = codecs.encode_string(scheme, filled, mask)
    except ValueError:
        return
    out = codecs.decode_string(enc)
    set_idx = np.flatnonzero(mask)
    assert all(out[i] == filled[i] for i in set_idx)


@st.composite
def int64_column(draw):
    """Int64-domain values (epoch-nanos magnitudes) — exercises the
    width-aware paths added for 64-bit columns (round 2: _elem_width,
    delta/dod on ns timestamps)."""
    n = draw(st.integers(min_value=1, max_value=300))
    base = draw(st.integers(min_value=-(2**62), max_value=2**62))
    vals = draw(
        st.lists(
            st.integers(min_value=-(2**20), max_value=2**20),
            min_size=n,
            max_size=n,
        )
    )
    arr = np.array([base + v for v in vals], dtype=np.int64)
    mask = np.array(draw(st.lists(st.booleans(), min_size=n, max_size=n)), dtype=bool)
    return arr, mask


@given(int64_column())
@settings(max_examples=30, deadline=None)
@pytest.mark.parametrize("scheme", sorted(codecs.INT_SCHEMES))
def test_int64_property(scheme, col):
    values, mask = col
    if not mask.any():
        return
    if scheme == "delta":
        values = np.sort(values)
    filled = values.copy()
    filled[~mask] = filled[mask][0]
    try:
        enc = codecs.encode_int(scheme, filled, mask)
    except ValueError:
        return  # precondition rejection is allowed
    out = codecs.decode_int(enc)
    np.testing.assert_array_equal(np.asarray(out)[mask], filled[mask])
