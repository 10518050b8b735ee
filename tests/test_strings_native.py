"""Native string engine vs pyarrow.compute oracle
(arrow-string/src/predicate.rs:28, like.rs:79-186 semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arrow_tpu.io.interop import column_from_pyarrow
from arrow_tpu.ops import strings as st


def _col(values):
    return column_from_pyarrow(pa.array(values))


CORPUS = ["", "a", "abc", "ABC", "abcdef", "ab_cd", "ab%cd", "café",
          "ss", "ßharp", "日本語テキスト", "a" * 100, "xyz", "x", None,
          "value-123", "VALUE-123", "prefix-mid-suffix"]


@pytest.mark.parametrize("pattern", [
    "abc", "a%", "%c", "%b%", "a_c", "", "%", "_", "ab\\%cd", "ab\\_cd",
    "a%f", "%日本%", "caf_", "x_z",
])
def test_like_parity(pattern):
    arr = pa.array(CORPUS)
    ours = st.like(_col(CORPUS), pattern)
    ref = pc.match_like(arr, pattern)
    assert ours.to_pylist() == ref.to_pylist(), pattern


@pytest.mark.parametrize("pattern", ["ABC", "a%", "VALUE%", "%Café%"])
def test_ilike_parity(pattern):
    arr = pa.array(CORPUS)
    ours = st.ilike(_col(CORPUS), pattern)
    ref = pc.match_like(arr, pattern, ignore_case=True)
    assert ours.to_pylist() == ref.to_pylist(), pattern


def test_starts_ends_contains_parity():
    arr = pa.array(CORPUS)
    c = _col(CORPUS)
    assert st.starts_with(c, "ab").to_pylist() == \
        pc.starts_with(arr, "ab").to_pylist()
    assert st.ends_with(c, "c").to_pylist() == \
        pc.ends_with(arr, "c").to_pylist()
    assert st.contains(c, "b_c").to_pylist() == \
        pc.match_substring(arr, "b_c").to_pylist()
    assert st.contains(c, "本語").to_pylist() == \
        pc.match_substring(arr, "本語").to_pylist()


def test_upper_lower_parity():
    # 'ßharp' excluded: Python/Rust upper('ß')='SS' (the reference's
    # to_uppercase semantics) while pyarrow gives 'ẞ'
    corpus = [v for v in CORPUS if v is None or "ß" not in v]
    arr = pa.array(corpus)
    c = _col(corpus)
    assert st.upper(c).to_pylist() == pc.utf8_upper(arr).to_pylist()
    assert st.lower(c).to_pylist() == pc.utf8_lower(arr).to_pylist()
    # pure-ASCII fast path
    ascii_vals = ["Hello", "WORLD", "miXed", None, ""]
    assert st.upper(_col(ascii_vals)).to_pylist() == \
        pc.utf8_upper(pa.array(ascii_vals)).to_pylist()


@pytest.mark.parametrize("start,length", [(0, 2), (1, None), (2, 3),
                                          (-3, 2), (-1, None), (5, 0)])
def test_substring_parity(start, length):
    # arrow-rs substring semantics (substring.rs): negative start counts
    # back from the end then clamps to 0; length runs forward from there
    def expect(v):
        if v is None:
            return None
        s0 = start if start >= 0 else max(len(v) + start, 0)
        e0 = len(v) if length is None else min(s0 + length, len(v))
        return v[s0:e0] if s0 < len(v) else ""
    ours = st.substring(_col(CORPUS), start, length)
    assert ours.to_pylist() == [expect(v) for v in CORPUS], \
        (start, length)


def test_dictionary_encode_sorted_and_exact():
    rng = np.random.default_rng(3)
    vals = [f"w{int(i):05d}" for i in rng.integers(0, 5000, 100_000)]
    vals[7] = None
    c = _col(vals)
    d = st.dictionary_encode(c)
    assert d.to_pylist() == vals
    host_vals = d.values.to_pylist_host()
    assert host_vals == sorted(set(v for v in vals if v is not None)
                               | {""})  # null slot canonicalizes to ""


def test_high_cardinality_like_speed():
    # regression guard for the r1 per-distinct-Python path: 1M rows,
    # 200k distinct must finish like() in well under a second of CPU
    import time
    rng = np.random.default_rng(0)
    vals = [f"item-{int(i):06d}" for i in rng.integers(0, 200_000,
                                                       1_000_000)]
    c = _col(vals)
    t0 = time.time()
    m = st.like(c, "item-0001%")
    dt_s = time.time() - t0
    assert dt_s < 5.0, f"like took {dt_s:.1f}s"
    ref = pc.match_like(pa.array(vals), "item-0001%")
    assert np.array_equal(np.asarray(m.values), np.asarray(ref))


def test_dict_column_predicate_broadcast():
    vals = ["aa", "bb", "aa", None, "ab"] * 10
    d = st.dictionary_encode(_col(vals))
    got = st.like(d, "a%")
    ref = pc.match_like(pa.array(vals), "a%")
    assert got.to_pylist() == ref.to_pylist()


# ---------------------------------------------------------------------------
# native regex engine (round 3): lazy-DFA vs Python `re` oracle
# ---------------------------------------------------------------------------

def test_native_regex_against_re_oracle():
    import re
    import numpy as np
    from arrow_tpu.ops import strings as S
    from arrow_tpu.core.column import StringColumn
    import jax.numpy as jnp
    import arrow_tpu.dtypes as dt

    vals = ["", "a", "abc", "aabc", "xabcy", "foo@bar.com", "x.y",
            "foobaz", "barbaz", "abbbd", "123", "a1_z", " ", "zzza",
            "AbC", "Hello99", "a}b", "{2}", "end$", "^start", "a-b"]
    lens = np.array([len(v) for v in vals], np.int64)
    offs = np.zeros(len(vals) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    data = np.frombuffer("".join(vals).encode() or b"\0", np.uint8)
    col = StringColumn(jnp.asarray(offs.astype(np.int32)),
                       jnp.asarray(data), dt.utf8)
    pats = ["abc", "^abc", "abc$", "a.c", "a{2,3}", "[abc]+", "[^abc]",
            r"\d+", r"\w+@\w+\.(com|org)", "(foo|bar)baz", "^(a|bb)+$",
            r"x\.y", "a|", ".*", r"\s", "a{0,2}b", "^$", "[A-Z]\\w*"]
    for p in pats:
        got = np.asarray(S.regexp_is_match(col, p).values)
        exp = np.array([re.search(p, v) is not None for v in vals])
        assert (got == exp).all(), p
    # case-insensitive flag
    got = np.asarray(S.regexp_is_match(col, "abc", "i").values)
    exp = np.array([re.search("abc", v, re.I) is not None for v in vals])
    assert (got == exp).all()


def test_native_regex_matches_fallback_path():
    """Native DFA result == per-value Python fallback on the same col."""
    import numpy as np
    from arrow_tpu.ops import strings as S
    from arrow_tpu import column
    vals = (["foo@bar.com", "nope", None, "a@b.org", "x" * 80] * 7)
    col = column(vals)
    native = S._regex_native_mask(col, r"\w+@\w+\.(com|org)", False)
    assert native is not None, "native engine should cover this pattern"
    import re
    rx = re.compile(r"\w+@\w+\.(com|org)")
    fb = S._per_value(col, lambda v: rx.search(v) is not None)
    assert native.to_pylist() == fb.to_pylist()
    # unsupported construct falls back (still correct)
    r2 = S.regexp_is_match(col, r"\bfoo")
    assert r2.to_pylist()[:2] == [True, False]


def test_native_regex_non_ascii_falls_back():
    import numpy as np
    from arrow_tpu.ops import strings as S
    from arrow_tpu import column
    col = column(["héllo", "hello", "ß"])
    # non-ASCII data: byte-DFA skipped, per-value path used; still exact
    r = S.regexp_is_match(col, "h.llo")
    assert r.to_pylist() == [True, True, False]
    assert S._regex_native_mask(col, "h.llo", False) is None
