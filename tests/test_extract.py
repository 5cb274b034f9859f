"""HTML → text extraction (operators/extract.py): each rule pinned on
hand-built HTML, plus the env-gate and the UDF-free plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.extract import (
    extract_text,
    extract_text_trafilatura,
    html_to_lines,
    keep_content_lines,
)


def _extract(spark, html: str) -> dict:
    df = extract_text(
        spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    )
    return df.collect()[0].asDict()


def test_script_and_style_subtrees_dropped(spark):
    r = _extract(
        spark,
        "<p>keep these actual real content words here</p>"
        "<script>var tracker = 'scriptbody';</script>"
        "<style>p { color: red }</style>"
        "<p>also keep these other real content words</p>",
    )
    assert r["extract_text"] == (
        "keep these actual real content words here\n"
        "also keep these other real content words"
    )
    assert "scriptbody" not in r["extract_text"]
    assert r["n_lines_raw"] == 2 and r["n_lines_kept"] == 2


def test_entities_decode_after_tag_strip(spark):
    # '&lt;section&gt;' is TEXT — decoding before stripping would
    # turn it into a tag and swallow it.
    r = _extract(
        spark,
        "<p>alpha &lt;section&gt; beta &amp; gamma &quot;quoted&quot;"
        " delta</p>",
    )
    assert r["extract_text"] == 'alpha <section> beta & gamma "quoted" delta'


def test_boilerplate_lines_dropped(spark):
    html = (
        "<nav><a href='/'>Home</a> | <a href='/x'>About</a></nav>"
        "<p>this paragraph carries enough real words to keep</p>"
        "<p>Sponsored: click here to subscribe right now today</p>"
        "<div>Share</div>"
        "<footer>Copyright 2099 Nobody | Privacy</footer>"
    )
    r = _extract(spark, html)
    assert r["extract_text"] == (
        "this paragraph carries enough real words to keep"
    )
    assert r["n_lines_raw"] == 5 and r["n_lines_kept"] == 1


def test_whitespace_collapsed_and_blank_lines_dropped(spark):
    r = _extract(
        spark,
        "<p>  spaced   words   collapse   into  single  gaps </p><p>   </p>",
    )
    assert r["extract_text"] == "spaced words collapse into single gaps"
    assert r["n_lines_raw"] == 1


def test_block_closers_break_lines_inline_tags_do_not(spark):
    r = _extract(
        spark,
        "<p>first block of plenty real words here</p>"
        "<p>second <b>block</b> of plenty real words here</p>",
    )
    assert r["extract_text"].split("\n") == [
        "first block of plenty real words here",
        "second block of plenty real words here",
    ]


def test_plan_is_jvm_only(spark):
    """No Python UDF / eval node anywhere in the extraction plan —
    the 100 TB contract (module docstring)."""
    df = extract_text(
        spark.createDataFrame([(1, "<p>x</p>")], "doc_id bigint, html string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_helpers_compose(spark):
    df = spark.createDataFrame(
        [("<p>one two three four five six</p><div>x | y</div>",)],
        "html string",
    )
    out = df.select(
        keep_content_lines(html_to_lines(F.col("html"))).alias("k")
    ).collect()[0]["k"]
    assert out == ["one two three four five six"]


def test_trafilatura_tier_env_gated(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id bigint, html string")
    try:
        import trafilatura  # noqa: F401

        pytest.skip("trafilatura installed; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="trafilatura"):
        extract_text_trafilatura(df)


def test_multiline_and_uppercase_markup(spark):
    """Real crawl HTML: multi-line script bodies and uppercase tags —
    the (?is) flags on both engines' patterns (code-review r12)."""
    r = _extract(
        spark,
        "<SCRIPT type='text/javascript'>\nvar t = 1;\ntrack();\n</SCRIPT>"
        "<P>uppercase paragraph with enough real words kept</P>"
        "<Style>\np { color: red }\n</Style>"
        "<p>lowercase paragraph with enough real words kept</p>",
    )
    assert r["extract_text"] == (
        "uppercase paragraph with enough real words kept\n"
        "lowercase paragraph with enough real words kept"
    )
    assert "track" not in r["extract_text"]
    assert "color" not in r["extract_text"]


# --------------------------------------------------------------------------
# Property test: engine extraction ≡ a pure-Python reference extractor
# over hypothesis-generated markup (the CDC-resync rigor pattern)
# --------------------------------------------------------------------------

import re as _re


def _py_extract(html: str) -> tuple[int, int, str]:
    """Pure-Python mirror of the 6-stage pipeline (module docstring) —
    an independent implementation, not a transliteration of the Spark
    expressions: Python re with the same (?is) semantics."""
    x = _re.sub(r"(?is)<script[^>]*>.*?</script>", " ", html)
    x = _re.sub(r"(?is)<style[^>]*>.*?</style>", " ", x)
    x = _re.sub(
        r"(?i)</(title|h1|h2|h3|p|div|nav|footer|li|tr)>", "\n", x
    )
    x = _re.sub(r"<[^>]*>", "", x)
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        x = x.replace(ent, ch)
    lines = [
        _re.sub(" +", " ", l).strip() for l in x.split("\n")
    ]
    raw = [l for l in lines if l]
    kept = [
        l
        for l in raw
        if len(l.split(" ")) >= 5
        and "|" not in l
        and not any(
            m in l.lower()
            for m in (
                "copyright", "sponsored", "subscribe",
                "all rights reserved",
            )
        )
    ]
    return len(raw), len(kept), "\n".join(kept)


def test_extraction_equals_pure_python_on_random_markup(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(
        "alpha beta gamma delta epsilon zeta Copyright sponsored"
        " the quick brown fox".split()
    )
    text = st.lists(words, min_size=0, max_size=12).map(" ".join)
    piece = st.one_of(
        text.map(lambda t: f"<p>{t}</p>"),
        text.map(lambda t: f"<DIV class='x'>{t}</DIV>"),
        text.map(lambda t: f"<script>\n{t}\n</script>"),
        text.map(lambda t: f"<b>{t}</b>"),
        text.map(lambda t: t and f"{t} &amp; more &lt;tag&gt;" or t),
        st.just("<nav>Home | About</nav>"),
        st.just("<STYLE>p{x:1}\n.y{z:2}</STYLE>"),
    )
    docs = st.lists(
        st.lists(piece, min_size=0, max_size=6).map("".join),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=25, deadline=None)
    @given(docs)
    def run(htmls):
        df = extract_text(
            spark.createDataFrame(
                [(i, h) for i, h in enumerate(htmls)],
                "doc_id bigint, html string",
            )
        )
        got = {
            r["doc_id"]: (
                r["n_lines_raw"], r["n_lines_kept"], r["extract_text"]
            )
            for r in df.collect()
        }
        want = {i: _py_extract(h) for i, h in enumerate(htmls)}
        assert got == want

    run()


# --------------------------------------------------------------------------
# WARC container framing
# --------------------------------------------------------------------------

CRLF = "\r\n"


def _rec(typ: str, uri: str, payload: str) -> str:
    import hashlib

    rid = hashlib.md5((typ + uri).encode()).hexdigest()
    return (
        f"WARC/1.0{CRLF}WARC-Type: {typ}{CRLF}"
        f"WARC-Target-URI: {uri}{CRLF}"
        f"WARC-Record-ID: <urn:md5:{rid}>{CRLF}"
        f"Content-Length: {len(payload)}{CRLF}{CRLF}"
        f"{payload}{CRLF}{CRLF}"
    )


def test_warc_framing_survives_decoy_payloads(spark):
    """Payloads containing 'WARC/1.0', header-lookalike lines, and
    blank CRLF lines must be framed through, not split on — the
    difference between content-length framing and delimiter
    splitting."""
    from streamlit_flink_demo_spark.operators.extract import (
        split_warc_records,
    )

    poison = (
        f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
        f"Content-Length: 3{CRLF}{CRLF}abc{CRLF}{CRLF}"
    )
    warc = (
        _rec("request", "http://x/1", f"GET /1{CRLF}{CRLF}{poison}")
        + _rec("response", "http://x/1", poison)
        + _rec("response", "http://x/2", "plain body")
    )
    df = spark.createDataFrame([(0, warc)], "file_id long, warc string")
    rows = sorted(
        (r.typ, r.uri, r.payload)
        for r in split_warc_records(df).collect()
    )
    assert rows == sorted(
        [
            ("request", "http://x/1", f"GET /1{CRLF}{CRLF}{poison}"),
            ("response", "http://x/1", poison),
            ("response", "http://x/2", "plain body"),
        ]
    )


def test_warc_framing_bound_fails_loudly(spark):
    """A container with more records than max_records must raise, not
    silently truncate."""
    from streamlit_flink_demo_spark.operators.extract import (
        split_warc_records,
    )

    warc = "".join(
        _rec("response", f"http://x/{i}", f"body {i}") for i in range(5)
    )
    df = spark.createDataFrame([(0, warc)], "file_id long, warc string")
    ok = split_warc_records(df, max_records=5).collect()
    assert len(ok) == 5
    with pytest.raises(Exception, match="max_records|assert"):
        split_warc_records(df, max_records=4).collect()


def test_warc_empty_payload_and_unicode(spark):
    """Zero-length payloads frame correctly, and non-ASCII payloads
    frame by CHARACTER length on both engines (documented char —
    not byte — semantics of the synthetic container)."""
    from streamlit_flink_demo_spark.operators.extract import (
        split_warc_records,
    )

    warc = _rec("response", "http://x/e", "") + _rec(
        "response", "http://x/u", "héllo wörld — ünïcode"
    )
    df = spark.createDataFrame([(0, warc)], "file_id long, warc string")
    rows = {r.uri: r.payload for r in split_warc_records(df).collect()}
    assert rows["http://x/e"] == ""
    assert rows["http://x/u"] == "héllo wörld — ünïcode"


def test_warc_split_plan_is_jvm_only(spark, sf_dir):
    """The whole WARC→extraction chain stays JVM-side: no Python UDF
    nodes in the optimized plan."""
    from streamlit_flink_demo_spark.plans import load_all

    qs = load_all(exposed_only=False)
    df = qs["docs_warc_extract"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_url_canonicalization_rules(spark):
    """Each canonicalization rule on a hand-built case battery."""
    from streamlit_flink_demo_spark.operators.extract import (
        canonicalize_url,
    )

    cases = [
        # fragment strip + case fold + default port
        ("HTTP://Example.COM:80/a#frag", "http://example.com/a"),
        ("https://X.Y:443/p?q=1", "https://x.y/p?q=1"),
        # non-default port survives
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # relative resolution
        ("/about#top", "http://example.com/about"),
        # tracking params dropped, remainder sorted
        (
            "http://h/p?b=2&utm_source=x&a=1&ref=nav&gclid=g",
            "http://h/p?a=1&b=2",
        ),
        # all params tracking → no '?'
        ("http://h/p?utm_campaign=only", "http://h/p"),
        # empty path → '/'
        ("http://Host.com", "http://host.com/"),
        ("https://host.com?a=1", "https://host.com/?a=1"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw string")
    got = [
        r.c for r in df.select(canonicalize_url(F.col("raw")).alias("c"))
        .collect()
    ]
    assert got == [want for _, want in cases]


def test_url_frontier_collapses_variants(spark, sf_dir):
    """The planted messy variants collapse onto their canonical
    targets: v1 (upper-case host, :80, utm param, fragment) lands on
    the same canonical /doc/<m> URL family as the extracted hrefs,
    while the :8080 variant stays distinct."""
    from streamlit_flink_demo_spark.plans import load_all

    qs = load_all(exposed_only=False)
    rows = qs["docs_url_frontier"].fn(spark, sf_dir).collect()
    urls = {r.url for r in rows}
    hosts = {r.host for r in rows}
    assert "http://example.com/about" in urls  # '/about#top' + '/about'
    assert any(u.startswith("http://example.com:8080/doc/") for u in urls)
    assert "example.com:8080" in hosts and "example.com" in hosts
    assert not any("utm_" in u or "#" in u or "gclid" in u for u in urls)
    # upper-case scheme/host variants never surface
    assert not any("Example" in u or "HTTP:" in u for u in urls)


def test_robots_parse_group_model(spark):
    """RFC 9309 group semantics on the synthesized robots.txt: the
    greedybot-only group's rules and crawl-delay must NOT leak, the
    two-agent header (googlebot + *) group applies, the empty
    Disallow is a no-op, and crawl-delay comes from the '*' group."""
    from streamlit_flink_demo_spark.operators.extract import parse_robots

    rows = {r.host: r for r in parse_robots(spark).collect()}
    ex = rows["example.com"]
    rules = {(r["a"], r["p"]) for r in ex.rules}
    assert rules == {(0, "/doc/"), (1, "/doc/4"), (0, "/contact")}
    assert ex.delay_r == 2.0  # greedybot's 9 never leaks
    mi = rows["mirror.example.com"]
    assert {(r["a"], r["p"]) for r in mi.rules} == {(0, "/a"), (1, "/a/b")}
    assert mi.delay_r == 0.5
    p8 = rows["example.com:8080"]
    assert {(r["a"], r["p"]) for r in p8.rules} == {(0, "/")}
    assert p8.delay_r is None  # no crawl-delay -> default budget


def test_robots_gate_longest_match_and_waves(spark):
    """Longest-match precedence with Allow winning ties, default-allow
    on no match, full-block host, and deterministic wave assignment
    from the crawl-delay budget."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.operators.extract import (
        parse_robots,
        robots_gate,
    )

    frontier = spark.createDataFrame(
        [
            ("example.com", "http://example.com/", 10),
            ("example.com", "http://example.com/about", 9),
            ("example.com", "http://example.com/doc/7", 8),
            ("example.com", "http://example.com/doc/42?x=1", 7),
            ("example.com", "http://example.com/contact", 6),
            ("mirror.example.com", "https://mirror.example.com/a/b?b=1", 5),
            ("example.com:8080", "http://example.com:8080/doc/7", 4),
            ("unlisted.org", "http://unlisted.org/x", 3),
        ],
        "host string, url string, n_refs bigint",
    )
    out = {
        r.url: r
        for r in robots_gate(frontier, parse_robots(spark)).collect()
    }
    assert out["http://example.com/"].allowed_i == 1
    assert out["http://example.com/"].rule is None  # no rule matched
    assert out["http://example.com/doc/7"].allowed_i == 0
    assert out["http://example.com/doc/7"].rule == "/doc/"
    # Allow '/doc/4' (len 6) beats Disallow '/doc/' (len 5)
    assert out["http://example.com/doc/42?x=1"].allowed_i == 1
    assert out["http://example.com/doc/42?x=1"].rule == "/doc/4"
    assert out["http://example.com/contact"].allowed_i == 0
    # Allow '/a/b' beats Disallow '/a' on the mirror host
    assert out["https://mirror.example.com/a/b?b=1"].allowed_i == 1
    assert out["https://mirror.example.com/a/b?b=1"].rule == "/a/b"
    # full-block host and robots-less host
    assert out["http://example.com:8080/doc/7"].allowed_i == 0
    assert out["http://unlisted.org/x"].allowed_i == 1
    # waves: example.com budget = floor(10/2) = 5; three allowed urls
    # ordered by n_refs desc all land in wave 0; blocked rows get NULL
    assert out["http://example.com/"].wave_i == 0
    assert out["http://example.com/about"].wave_i == 0
    assert out["http://example.com/doc/7"].wave_i is None


def test_robots_gate_wave_budget_splits(spark):
    """A host with more allowed URLs than its per-wave budget rolls
    into later waves in n_refs-desc order (mirror budget = 20)."""
    from streamlit_flink_demo_spark.operators.extract import (
        parse_robots,
        robots_gate,
    )

    rows = [
        (
            "mirror.example.com",
            f"https://mirror.example.com/a/b?b={i}",
            100 - i,
        )
        for i in range(25)
    ]
    frontier = spark.createDataFrame(
        rows, "host string, url string, n_refs bigint"
    )
    out = robots_gate(frontier, parse_robots(spark)).collect()
    waves = {r.url: r.wave_i for r in out}
    # highest-n_refs 20 urls -> wave 0, remaining 5 -> wave 1
    assert waves["https://mirror.example.com/a/b?b=0"] == 0
    assert waves["https://mirror.example.com/a/b?b=19"] == 0
    assert waves["https://mirror.example.com/a/b?b=20"] == 1
    assert waves["https://mirror.example.com/a/b?b=24"] == 1


# --------------------------------------------------------------------------
# docs_recrawl_schedule: freshness estimation + refetch ordering
# --------------------------------------------------------------------------


def test_recrawl_schedule_matches_pure_python(spark, sf_dir):
    """Re-derive every change draw, estimator value, and per-host
    fetch order in pure Python (hashlib md5 — no shared code with the
    DataFrame path) and require row-exact agreement."""
    import hashlib

    from streamlit_flink_demo_spark.operators.extract import (
        _RC_BUDGET,
        _RC_INTERVALS,
    )
    from streamlit_flink_demo_spark.plans import load_all

    reg = load_all(exposed_only=False)
    got = reg["docs_recrawl_schedule"].fn(spark, sf_dir).toPandas()

    def u60py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = {}
    for r in got.itertuples():
        rate = 1 + u60py(f"rate:{r.url}") % 9
        changes = sum(
            1
            for i in range(1, _RC_INTERVALS + 1)
            if u60py(f"chg:{r.url}:{i}") % 10 < rate
        )
        assert r.n_changes == changes, r.url
        assert r.p_change_r == round(changes / _RC_INTERVALS, 6)
        assert r.priority_r == round(
            r.n_refs * changes / _RC_INTERVALS, 6
        )
        assert r.interval_i == _RC_BUDGET // (changes + 1) + 1
        rows.setdefault(r.host, []).append(r)
    # fetch order: rank of (n_refs * n_changes desc, url asc) per host
    for host, rs in rows.items():
        want = sorted(rs, key=lambda r: (-r.n_refs * r.n_changes, r.url))
        for pos, r in enumerate(want, 1):
            assert r.fetch_order_i == pos, (host, r.url)


def test_recrawl_schedule_rate_heterogeneity(spark, sf_dir):
    """The synthesized corpus must exercise the estimator across the
    range: both stable URLs (few/no changes -> long interval) and hot
    URLs (max changes -> interval 1 + budget floor) exist, and
    fetch_order is a dense 1..k per host."""
    from streamlit_flink_demo_spark.plans import load_all

    reg = load_all(exposed_only=False)
    got = reg["docs_recrawl_schedule"].fn(spark, sf_dir).toPandas()
    assert got.n_changes.min() <= 1
    assert got.n_changes.max() >= 3
    assert got.interval_i.min() >= 1
    assert (
        got.groupby("host").fetch_order_i.max()
        == got.groupby("host").size()
    ).all()


# --------------------------------------------------------------------------
# docs_crawl_plan: the composed fetch schedule
# --------------------------------------------------------------------------


def test_crawl_plan_orders_waves_by_authority(spark, sf_dir):
    from streamlit_flink_demo_spark.plans import load_all

    reg = load_all(exposed_only=False)
    got = reg["docs_crawl_plan"].fn(spark, sf_dir).toPandas()
    gate = reg["docs_crawl_gate"].fn(spark, sf_dir).toPandas()

    # only gate-allowed URLs appear (the full-block host and the
    # Disallowed subtrees never reach the plan)
    allowed = gate[gate.allowed_i == 1]
    assert set(got.url) == set(allowed.url)
    assert "example.com:8080" not in set(got.host)

    # ranks are dense 1..k within each wave
    for wave, grp in got.groupby("wave_i"):
        assert sorted(grp.fetch_rank_i) == list(range(1, len(grp) + 1))

    # authority ordering: within any wave containing both hosts,
    # every example.com URL (the hub, max host rank) outranks every
    # mirror URL
    for wave, grp in got.groupby("wave_i"):
        ex = grp[grp.host == "example.com"]
        mi = grp[grp.host == "mirror.example.com"]
        if len(ex) and len(mi):
            assert ex.fetch_rank_i.max() < mi.fetch_rank_i.min()
