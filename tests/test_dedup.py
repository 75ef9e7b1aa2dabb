

def test_duplicate_span_coverage_planted(spark):
    """Exact covered-token math on planted partial overlaps: A and B
    share a 6-token run (two overlapping 5-grams -> 6 covered tokens),
    C is unique, D duplicates A entirely."""
    from ai_fabric_etl_spark.operators.dedup import duplicate_span_coverage

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three four"),      # 10 tokens
            (2, f"x y {shared} z"),                   # 9 tokens
            (3, "totally unique words only here now"),  # 6 tokens
            (4, f"{shared} one two three four"),      # exact dup of 1
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_grams, r.covered_tokens,
                   r.dup_coverage)
        for r in duplicate_span_coverage(docs, k=5).collect()
    }
    # doc 1 == doc 4 token-for-token: every 5-gram is cross-doc
    assert got[1] == (10, 6, 10, 1.0)
    assert got[4] == (10, 6, 10, 1.0)
    # doc 2 shares only the 6-token run: grams starting at the two
    # positions inside the run -> union covers 6 tokens
    assert got[2] == (9, 2, 6, round(6 / 9, 6))
    # unique doc: zero coverage
    assert got[3] == (6, 0, 0, 0.0)


def test_duplicate_span_coverage_short_docs_and_validation(spark):
    from ai_fabric_etl_spark.operators.dedup import duplicate_span_coverage

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    # below k: no grams, zero coverage, still present in the output
    got = {r.doc_id: r.dup_coverage
           for r in duplicate_span_coverage(docs, k=5).collect()}
    assert got == {1: 0.0, 2: 0.0}
    # k=3 on identical 3-token docs: full coverage
    got3 = {r.doc_id: (r.covered_tokens, r.dup_coverage)
            for r in duplicate_span_coverage(docs, k=3).collect()}
    assert got3 == {1: (3, 1.0), 2: (3, 1.0)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        duplicate_span_coverage(docs, k=1)


def test_remove_duplicate_spans_planted(spark):
    """Exact removal math on the span-coverage fixture: covered
    tokens vanish, survivors rejoin in original order."""
    from ai_fabric_etl_spark.operators.dedup import remove_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three four"),
            (2, f"x y {shared} z"),
            (3, "totally unique words only here now"),
            (4, f"{shared} one two three four"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_spans(docs, k=5).collect()
    }
    # docs 1/4 are exact duplicates: fully covered, collapse to ''
    assert got[1] == (10, 10, "")
    assert got[4] == (10, 10, "")
    # doc 2 loses exactly the shared 6-token run, keeps x y ... z
    assert got[2] == (9, 6, "x y z")
    # unique doc untouched
    assert got[3] == (6, 0, "totally unique words only here now")


def test_remove_duplicate_spans_short_docs(spark):
    from ai_fabric_etl_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    # below k: no grams form, nothing removed
    got = {r.doc_id: (r.n_removed, r.clean_text)
           for r in remove_duplicate_spans(docs, k=5).collect()}
    assert got == {1: (0, "a b c"), 2: (0, "a b c")}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        remove_duplicate_spans(docs, k=1)


def test_remove_boilerplate_lines_planted(spark):
    from ai_fabric_etl_spark.operators.text import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "HEADER\nalpha beta\nFOOTER"),
            (2, "HEADER\ngamma delta\nFOOTER"),
            (3, "unique only\n\nkeep me"),
            (4, "HEADER"),                       # nothing survives
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_lines, r.n_removed, r.clean_text)
           for r in remove_boilerplate_lines(docs).collect()}
    assert got[1] == (3, 2, "alpha beta")
    assert got[2] == (3, 2, "gamma delta")
    # blank separator line is preserved (never a dedup candidate)
    assert got[3] == (3, 0, "unique only\n\nkeep me")
    assert got[4] == (1, 1, "")
