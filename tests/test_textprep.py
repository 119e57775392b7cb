"""Corpus-prep operators: PII redaction, line-level dedup accounting,
host blocklist split (operators/textprep.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_graph_spark.operators import textprep


def test_redact_pii_tokens(spark):
    df = spark.createDataFrame(
        [("mail me at a.b+c@x-corp.io or call 555-0199 from 10.1.2.3",),
         ("clean text, no pii here",),
         ("double a@b.io c@d.org",)],
        ["text"],
    )
    out = [r["red"] for r in
           df.select(textprep.redact_pii(F.col("text")).alias("red"))
           .collect()]
    assert out[0] == "mail me at [EMAIL] or call [PHONE] from [IP]"
    assert out[1] == "clean text, no pii here"
    assert out[2] == "double [EMAIL] [EMAIL]"


def test_pii_redaction_stats(spark):
    df = spark.createDataFrame(
        [("a@b.io and 555-1234",), ("10.0.0.1",), ("nothing",)], ["text"])
    row = textprep.pii_redaction_stats(df).collect()[0]
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (1, 1, 1)
    assert row["docs_with_pii"] == 2
    # '[EMAIL]'(7) - 'a@b.io'(6) = +1; '[PHONE]'(7) - '555-1234'(8) = -1;
    # '[IP]'(4) - '10.0.0.1'(8) = -4
    assert row["chars_delta"] == (7 - 6) + (7 - 8) + (4 - 8)


def test_line_dedup_stats(spark):
    df = spark.createDataFrame(
        [(["footer", "a"],), (["footer", "b"],), (["footer", "a"],)],
        "lines array<string>",
    )
    row = textprep.line_dedup_stats(df, F.col("lines")).collect()[0]
    assert row["total_lines"] == 6
    assert row["distinct_lines"] == 3   # footer, a, b
    assert row["lines_removed"] == 3    # 2 extra footers + 1 extra 'a'
    assert row["max_line_repeat"] == 3
    assert row["boilerplate_lines"] == 2


def test_host_blocklist_split_counts_and_broadcast(spark):
    pages = spark.createDataFrame(
        [(f"https://host{i % 3}.example.com/p{i}",) for i in range(30)],
        ["url"],
    )
    res = textprep.host_blocklist_split(pages, ["host1.example.com"])
    row = res.collect()[0]
    assert row["kept_docs"] == 20 and row["dropped_docs"] == 10
    assert row["kept_hosts"] == 2 and row["dropped_hosts"] == 1
    # the blocklist side must broadcast — no shuffle of the corpus side
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "left_anti" in plan.lower() or "LeftAnti" in plan


def test_gopher_quality_edge_cases_and_no_shuffle(spark):
    docs = spark.createDataFrame(
        [
            # 60 distinct-ish words, mean len ok, low repetition -> pass
            (0, "en", " ".join(f"word{i:02d}" for i in range(60))),
            # short doc -> fail word count only
            (1, "en", "alpha beta gamma"),
            # same word 60x -> fail top-word (and top-bigram)
            (2, "en", " ".join(["spam"] * 60)),
            # 60 one-char words -> mean word length < 3 fails
            (3, "de", " ".join(["a"] * 30 + ["b"] * 30)),
            # empty text -> 0 words: fails word count, others vacuous
            (4, "de", ""),
        ],
        ["doc_id", "lang", "text"],
    )
    rows = {r["lang"]: r for r in
            textprep.gopher_quality_stats(docs).collect()}
    en, de = rows["en"], rows["de"]
    assert en["docs"] == 3 and en["pass_all"] == 1
    assert en["fail_word_count"] == 1          # doc 1
    # doc 2 (all spam) AND doc 1 (3 words: top frac 1/3 > 1/10) fail
    assert en["fail_top_word"] == 2
    assert en["fail_top_bigram"] == 2
    assert de["docs"] == 2 and de["pass_all"] == 0
    assert de["fail_mean_word_len"] == 1       # doc 3
    # doc 3 is all 'a'/'b' so it also fails repetition
    assert de["fail_top_word"] == 1
    assert de["fail_word_count"] == 1          # doc 4 (0 words)

    # repetition scoring is per-row: exactly ONE exchange (the lang groupBy)
    plan = textprep.gopher_quality_stats(docs)._jdf \
        .queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan  # partial/final agg pair, nothing else


def test_canonicalize_url_components(spark):
    from pyspark.sql import functions as F

    cases = [
        # (input, expected canonical)
        ("https://Host1.Example.com:443/a/b/?utm_source=x&b=2&a=1#f",
         "https://host1.example.com/a/b?a=1&b=2"),
        ("http://site.org:80/", "http://site.org"),
        ("http://site.org:8080/p", "http://site.org:8080/p"),  # kept
        ("https://x.com/p?fbclid=abc&gclid=1", "https://x.com/p"),
        ("https://x.com/p?z=1&a=2", "https://x.com/p?a=2&z=1"),
        ("https://x.com", "https://x.com"),
        ("ftp://x.com:21/a?b=1#c", "ftp://x.com:21/a?b=1"),  # non-http kept
        ("not a url", None),          # junk rows null out, never throw
        ("", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in
           df.select(textprep.canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_hash_sample_deterministic_and_rate(spark):
    import hashlib

    from pyspark.sql import functions as F

    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    s1 = {r[0] for r in
          textprep.hash_sample(df, "doc_id", "10").collect()}
    s2 = {r[0] for r in
          textprep.hash_sample(df, "doc_id", "10").collect()}
    assert s1 == s2  # pure function of the key, no RNG state
    # matches a local recomputation of the same decision
    expect = {i for i in range(4000)
              if hashlib.md5(f"dgspark{i}".encode()).hexdigest()[:2] < "10"}
    assert s1 == expect
    # nominal rate 16/256 = 6.25%; binomial spread at n=4000 stays well
    # inside [4%, 9%]
    assert 0.04 < len(s1) / 4000 < 0.09
    # threshold widening is monotone: the 6.25% sample nests in the 25% one
    s4 = {r[0] for r in textprep.hash_sample(df, "doc_id", "40").collect()}
    assert s1 <= s4
    # different seed -> different (but still deterministic) subset
    sx = {r[0] for r in
          textprep.hash_sample(df, "doc_id", "10", seed="other").collect()}
    assert sx != s1


def test_split_by_hash_disjoint_exhaustive_stable(spark):
    import hashlib

    from pyspark.sql import functions as F

    df = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    out = textprep.split_by_hash(df, "doc_id").collect()
    assert len(out) == 3000  # exhaustive: every row gets exactly one split
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    # matches a local recomputation (engine-stable decision)
    for i in range(3000):
        h = hashlib.md5(f"dgsplit{i}".encode()).hexdigest()[:2]
        want = "train" if h < "e0" else ("val" if h < "f0" else "test")
        assert i in by_split[want]
    # growing the corpus never migrates existing rows between splits
    bigger = spark.range(0, 6000).select(F.col("id").alias("doc_id"))
    out2 = {r["doc_id"]: r["split"]
            for r in textprep.split_by_hash(bigger, "doc_id").collect()}
    for split, ids in by_split.items():
        assert all(out2[i] == split for i in ids)
