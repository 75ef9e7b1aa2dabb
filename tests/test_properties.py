"""Property-based tests (hypothesis) over the pure-Python X12 core —
the layer under mapInPandas, so properties hold for every executor
batch. The reference has no property tests at all (SURVEY §5); these
pin the invariants its runtime validators only spot-check.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_fabric_etl_spark.x12.ack997 import validate_997
from ai_fabric_etl_spark.x12.parsers import parse_x12_file
from ai_fabric_etl_spark.x12.segments import (
    ELEMENT_SEPARATOR,
    SEGMENT_TERMINATOR,
    split_segments,
)
from ai_fabric_etl_spark.x12.testgen import generate_corpus

NOW = datetime.datetime(2024, 6, 1, 9, 0, 0)

# element content: printable, no X12 structural characters
element = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
    ),
    min_size=0,
    max_size=8,
)
segment = st.tuples(
    st.sampled_from(["ISA", "GS", "ST", "CLM", "NM1", "SV1", "SE", "GE", "IEA"]),
    st.lists(element, min_size=0, max_size=6),
)


@given(st.lists(segment, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_split_segments_roundtrip(segs):
    """split -> rejoin reconstructs the segment structure exactly."""
    text = SEGMENT_TERMINATOR.join(
        ELEMENT_SEPARATOR.join([seg_id, *els]) for seg_id, els in segs
    )
    parsed = split_segments(text)
    assert [(s.segment_id, list(s.elements)) for s in parsed] == [
        (seg_id, els) for seg_id, els in segs
    ]
    rebuilt = SEGMENT_TERMINATOR.join(
        ELEMENT_SEPARATOR.join([s.segment_id, *s.elements]) for s in parsed
    )
    assert rebuilt == text


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_generated_corpus_parses_completely(n_files, seed):
    """Every generated file yields >=1 transaction row; every row has
    a supported type, bounded quality, and control-number linkage."""
    corpus = generate_corpus(n_files=n_files, seed=seed)
    assert len(corpus) == n_files
    for name, content in corpus:
        rows = parse_x12_file(name, content, batch_id="prop", now=NOW)
        assert len(rows) >= 1, name
        for r in rows:
            assert r["transaction_type"] in {
                "837", "835", "834", "270", "271", "276", "277", "278", "279"
            }
            assert 0 <= r["quality_score"] <= 100
            assert r["file_name"] == name
            assert r["interchange_control_number"]
            assert r["transaction_set_control_number"]


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_quality_score_formula_bounds(seed):
    """score == max(0, 100 - 20*issues - 5*warnings) and the is_valid
    floor at 50 (silver_x12_parsing.py:1068-1073)."""
    for name, content in generate_corpus(n_files=5, seed=seed):
        for r in parse_x12_file(name, content, batch_id="p", now=NOW):
            score = r["quality_score"]
            assert (score >= 50) == r["is_valid"]
            assert score % 5 == 0  # 20/5-point penalties only


@given(
    st.text(alphabet="ABCDEFGHIJ0123456789", min_size=2, max_size=25),
    st.text(alphabet="ABCDEFGHIJ0123456789", min_size=2, max_size=25),
    st.integers(min_value=1, max_value=99_999_999_999),
    st.lists(
        st.tuples(
            st.text(alphabet="0123456789", min_size=4, max_size=9),
            st.sampled_from(
                ["837", "835", "834", "270", "271", "276", "277", "278", "279", "999"]
            ),
        ),
        min_size=1,
        max_size=12,
    ),
)
@settings(max_examples=200, deadline=None)
def test_generated_997_always_valid(sender, receiver, icn, sets):
    """U8 self-validation (generate_x12_acknowledgments.py:298-337):
    any generated 997 passes the structural validator — including
    oversized ids/ICNs, which must truncate into the fixed-width ISA
    rather than overflow it."""
    from ai_fabric_etl_spark.x12.ack997 import _build_997_text

    text = _build_997_text(sender, receiver, str(icn), sets)
    ok, issues = validate_997(text)
    assert ok, issues
    # one AK2 loop per acknowledged transaction set, carrying the
    # set's ACTUAL type (not the reference's control-number slice)
    assert text.count("AK2" + ELEMENT_SEPARATOR) == len(sets)
    for cn, t in sets:
        assert f"AK2*{t}*{cn}~" in text
    # the ISA segment stays fixed-width: 16 elements, ids at 15 chars
    isa = text.split("~")[0]
    els = isa.split("*")
    assert len(els[6]) == 15 and len(els[8]) == 15
    assert len(els[13]) == 9


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=12, deadline=None)
def test_global_ntile_formula_matches_sql_semantics(n, k, mod):
    """Pure-python replay of the ntile q/r split used by
    ranking.global_ntile: for any n rows and k buckets, the first
    n%k buckets get ceil(n/k) rows, the rest floor(n/k) — matching
    the SQL-standard NTILE the oracle computes. (The Spark-vs-Spark
    parity is covered in tests/test_ranking.py; this pins the
    arithmetic itself across a wider shape space, including n<k and
    heavy ties broken by the unique key.)"""
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r)
    sizes = [s for s in sizes if s > 0]
    # replay the rank->bucket formula from operators/ranking.py
    def bucket(rank):
        big = r * (q + 1)
        if rank <= big:
            return -(-rank // (q + 1))
        return r + -(-(rank - big) // max(q, 1))

    got = [bucket(i + 1) for i in range(n)]
    # bucket ids ascend, each bucket's size matches the SQL split
    from collections import Counter

    c = Counter(got)
    assert [c[b] for b in sorted(c)] == sizes
    assert got == sorted(got)
