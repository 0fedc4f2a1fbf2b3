"""r7 optimization round: the light batch paths (kinds-only,
kinds+encoded-only, logtype+n_vars-only) and the string-op token
classifier must be EXACT twins of the reference per-row functions — these
are the paths the driver queries e1_var_classes / e1_encode_4byte /
e1_logtype_extract now ride."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_clp_spark.functions.clp_native import (
    FLOAT_RE,
    INT_RE,
    MODE_4BYTE,
    MODE_I64,
    VAR_TOKEN_RE,
)
from fluent_bit_clp_spark.functions.clp_pandas import (
    _classify_one,
    _encode_one,
    _float_shape,
    _int_shape,
    _kinds_batch,
    _kinds_encoded_batch,
    _logtype_nvars_batch,
)

_INT_RX = re.compile(INT_RE)
_FLOAT_RX = re.compile(FLOAT_RE)
_VAR_RX = re.compile("^" + VAR_TOKEN_RE + "$")

TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
            max_size=120,
        ),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="0123456789.-aAzZ_/+", min_size=1, max_size=24)
)
def test_shape_classifiers_equal_regexes(tok):
    """_int_shape/_float_shape are exact equivalents of INT_RE/FLOAT_RE
    on every possible variable token (tokens always match VAR_TOKEN_RE,
    i.e. contain a digit and stay in the token char class)."""
    if not _VAR_RX.match(tok):
        return
    assert _int_shape(tok) == bool(_INT_RX.match(tok)), tok
    assert _float_shape(tok) == bool(_FLOAT_RX.match(tok)), tok


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
        max_size=200,
    )
)
def test_fast_token_regex_equals_original(text):
    """VAR_TOKEN_FAST_RE (backtracking-free) must produce the exact same
    matched spans as VAR_TOKEN_RE on arbitrary text — both match the
    maximal token-class runs containing at least one digit."""
    from fluent_bit_clp_spark.functions.clp_pandas import VAR_TOKEN_FAST_RE

    orig = [m.span() for m in re.finditer(VAR_TOKEN_RE, text)]
    fast = [m.span() for m in re.finditer(VAR_TOKEN_FAST_RE, text)]
    assert orig == fast, text


@pytest.mark.parametrize("mode", [MODE_I64, MODE_4BYTE])
@settings(max_examples=40, deadline=None)
@given(texts=TEXTS)
def test_kinds_batch_equals_classify_one(mode, texts):
    got = _kinds_batch(pd.Series(texts, dtype=object), mode)
    for i, t in enumerate(texts):
        assert got[i] == _classify_one(t, mode), (i, t)


@pytest.mark.parametrize("mode", [MODE_I64, MODE_4BYTE])
@settings(max_examples=40, deadline=None)
@given(texts=TEXTS)
def test_kinds_encoded_batch_equals_encode_one(mode, texts):
    got = _kinds_encoded_batch(pd.Series(texts, dtype=object), mode)
    for i, t in enumerate(texts):
        _, k, e, _ = _encode_one(t, mode)
        assert got["var_kinds"][i] == k, (i, t)
        assert got["encoded_vars"][i] == e, (i, t)


@settings(max_examples=40, deadline=None)
@given(texts=TEXTS)
def test_logtype_nvars_batch_equals_encode_one(texts):
    got = _logtype_nvars_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        lt, k, _, _ = _encode_one(t)
        if t is None:
            assert got["logtype"][i] is None
            assert pd.isna(got["n_vars"][i])
            continue
        assert got["logtype"][i] == lt, (i, t)
        assert int(got["n_vars"][i]) == len(k), (i, t)
