"""Property-based tests (hypothesis) over the pure deterministic
kernels — no Spark action per example, so thousands of cases stay
cheap: codec round-trips, anonymizer claim-scan invariants, SQL-text
escaping executed against a real SQLite."""

import sqlite3

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from maillogsentinel_spark.operators.anonymize import (
    DEFAULT_SPECS,
    PatternSpec,
    _claim_scan,
)
from maillogsentinel_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


@settings(max_examples=200, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=200, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    s = np.array(samples, dtype=np.int16)
    r, out = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert (out == s).all()


@settings(max_examples=150, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    n_colors=st.sampled_from([1, 2, 3, 4, 5, 15, 16, 17, 255, 256]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, n_colors, seed):
    from maillogsentinel_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, size=(h, w))]
    assert (decode_png(encode_png(img)) == img).all()


@settings(max_examples=150, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    n_colors=st.sampled_from([1, 2, 3, 4, 5, 15, 16, 17, 255, 256]),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, n_colors, seed):
    """GIF LZW + palette round-trip across the boundary palette sizes
    (1 color → min_code floor of 2; exactly 2^n and 2^n±1 entries →
    GCT size-field and code-width edges) and degenerate shapes (1×1,
    1×N single-row streams)."""
    from maillogsentinel_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, size=(h, w))]
    assert (decode_gif(encode_gif(img)) == img).all()


@settings(max_examples=200, deadline=None)
@given(
    codes=st.lists(st.integers(0, 255), min_size=0, max_size=64),
    rate=st.sampled_from([8000, 11025, 16000]),
)
def test_wav_ulaw_roundtrip_property(codes, rate):
    """μ-law WAV round-trip: the format-tag-7 RIFF writer and the
    chunk-walking decoder must reproduce the G.711 expansion of the
    exact code bytes (incl. odd-length data chunks, which the RIFF
    spec pads)."""
    from maillogsentinel_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ulaw,
        mulaw_expand,
    )

    arr = np.array(codes, dtype=np.uint8)
    r, out = decode_wav(encode_wav_ulaw(arr, rate))
    assert r == rate
    assert (out == mulaw_expand(arr)).all()


@settings(max_examples=300, deadline=None)
@given(line=st.text(min_size=0, max_size=200))
def test_claim_scan_spans_never_overlap(line):
    scan = _claim_scan(DEFAULT_SPECS)
    claims = [(rs, re_) for _, spec, rs, re_, _ in scan(line)]
    claims.sort()
    for (s1, e1), (s2, e2) in zip(claims, claims[1:]):
        assert e1 <= s2, f"overlapping claims in {line!r}"


@settings(max_examples=300, deadline=None)
@given(line=st.text(alphabet="0123456789. aZ-", min_size=0, max_size=120))
def test_claim_scan_priority_shadowing(line):
    # a span claimed by a higher-priority pattern is never re-claimed:
    # running the scan with ONLY the ip pattern yields a superset of the
    # full table's ip claims (lower-priority rules can't free ip spans)
    ip_only = _claim_scan([DEFAULT_SPECS[0]])
    full = _claim_scan(DEFAULT_SPECS)
    ips_full = {(rs, re_) for _, s, rs, re_, _ in full(line) if s.kind == "ip"}
    ips_only = {(rs, re_) for _, _, rs, re_, _ in ip_only(line)}
    assert ips_full <= ips_only


@settings(max_examples=150, deadline=None)
@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.integers(-(2**40), 2**40),
            st.text(min_size=0, max_size=60),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_sql_escaping_roundtrips_through_sqlite(values):
    # the reference's '→'' escaping (sql_exporter.py:187-199) must
    # survive an actual executescript round-trip for ANY text value —
    # quotes, newlines, unicode, semicolons
    from maillogsentinel_spark.sources.sqlio import sql_literal as fmt

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (v)")
    script = "BEGIN TRANSACTION;\n" + "\n".join(
        f"INSERT INTO t (v) VALUES ({fmt(v)});" for v in values
    ) + "\nCOMMIT;"
    con.executescript(script)
    got = [r[0] for r in con.execute("SELECT v FROM t").fetchall()]
    # NUL bytes are stripped by sql_literal (unrepresentable in a .sql
    # script — sqlite3 rejects the whole script otherwise)
    want = [
        v if v is None or isinstance(v, int) else str(v).replace("\x00", "")
        for v in values
    ]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(text=st.text(min_size=0, max_size=400))
def test_cdc_boundaries_partition_property(text):
    # chunks partition the document exactly: strictly increasing
    # 1-based end positions, last one at len(text), none past it —
    # so concatenating text[prev:i] over the ends reproduces the doc
    from maillogsentinel_spark.operators.dedup import cdc_boundaries

    ends = cdc_boundaries(text)
    if not text:
        assert ends == []
        return
    assert ends == sorted(set(ends))
    assert ends[-1] == len(text)
    assert all(1 <= i <= len(text) for i in ends)
    prev, parts = 0, []
    for i in ends:
        parts.append(text[prev:i])
        prev = i
    assert "".join(parts) == text


@settings(max_examples=300, deadline=None)
@given(
    prefix=st.text(min_size=0, max_size=40),
    body=st.text(min_size=0, max_size=300),
)
def test_cdc_boundaries_shift_resynchronization(prefix, body):
    # THE content-defined property, for arbitrary unicode: every
    # interior boundary of `body` survives a prefix insertion at the
    # shifted position (its 8-char hash window lies entirely inside
    # body), so chunking re-synchronizes after any edit — the reason
    # CDC beats fixed-size blocking for dedup
    from maillogsentinel_spark.operators.dedup import cdc_boundaries

    w = 8
    interior_body = {i for i in cdc_boundaries(body)[:-1]} if body else set()
    shifted = cdc_boundaries(prefix + body)
    interior_shifted = set(shifted[:-1]) if (prefix + body) else set()
    expect = {i + len(prefix) for i in interior_body}
    # shifted interior boundaries past the splice window must be
    # exactly the body's, relocated; new ones may only appear in the
    # first w−1 positions after the splice (windows straddling it)
    deep = {i for i in interior_shifted if i >= len(prefix) + w}
    assert deep == {i for i in expect if i >= len(prefix) + w}
