"""Cross-engine pins for the mirrored TEXT primitives.

The FINITE-VECTOR fuzz proved the value of attacking a mirrored
primitive directly instead of waiting for fixture data to stumble on
an edge: this module does the same for the text surface. Every oracle
that tokenizes, measures, or fingerprints text assumes Spark and
DuckDB agree on `split(' ')` / `length()` / `md5()` over ARBITRARY
unicode — combining marks, astral-plane letters, NUL bytes,
zero-width and RTL controls. These tests pin that agreement, and pin
the ONE divergence the sweep found — `lower()` on U+0130 (LATIN
CAPITAL LETTER I WITH DOT ABOVE): Spark applies the full Unicode
mapping (`i` + combining dot U+0307) while DuckDB's utf8proc drops
the dot. Three registered queries mirror `lower()`:

- `near_dup_survivors`'s normalization strips `[^a-z0-9 ]` AFTER
  lowercasing, which deletes the combining dot on the Spark side and
  re-converges the engines (safe by construction);
- `priority_parse` lowercases `o_orderpriority`, a fixture-controlled
  ASCII enum (safe by domain);
- `doc_prefix_dup_groups` groups on `lower(substr(text, 1, N))` of
  RAW document text — the one latent exposure. The domain-guard test
  below asserts no fixture corpus carries U+0130, so every committed
  hash stands; widening the corpus past that guard means folding the
  divergence first (round-14 note in SCALING.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

#: Adversarial strings: NUL bytes, astral plane, combining marks,
#: Cyrillic, sharp-s, dotted/dotless I, ligatures, Roman numerals,
#: mathematical alphanumerics, RTL override, zero-width space, BOM,
#: NBSP (which is NOT the split character), and whitespace shapes.
NASTY = (
    None,
    "",
    " ",
    "  ",
    "\t",
    "\n",
    "a b",
    "a  b",
    " a b ",
    "\x00",
    "a\x00b",
    "\x00 \x00",
    "\U0001F600",
    "x \U0001F600 y",
    "é",
    "á b́",
    "абв",
    "STRASSE ß",
    "ı",
    "ſ",
    "‮txet",
    "​",
    "a​b",
    "﻿bom",
    " ",
    "a b",
    "ﬁ ligature",
    "Ⅻ roman",
    "①",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
    "𝕊𝕡𝕒𝕣𝕜 𝕖𝕟𝕘𝕚𝕟𝕖",
)


def test_tokenize_length_md5_agree_on_nasty_strings(spark):
    """token_count / char_count / fingerprint must agree cross-engine
    for every adversarial string (one Spark job, one DuckDB scan)."""
    import duckdb
    import pandas as pd

    from asritha_metamorphetl_spark.functions.text import (
        char_count,
        fingerprint,
        token_count,
    )

    rows = [(i, t) for i, t in enumerate(NASTY)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.tc, r.cc, r.fp)
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("tc"),
            char_count(F.col("text")).alias("cc"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "text"]))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "SELECT id,"
            " len(list_filter(string_split(text,' '), x -> x != '')) AS tc,"
            " length(text) AS cc,"
            " md5(text) AS fp"
            " FROM t"
        ).fetchall()
    }
    bad = {
        i: (got[i], want[i])
        for i in got
        if got[i] != want[i] and NASTY[i] is not None
    }
    # NULL text: Spark size(split(NULL)) is -1 vs DuckDB NULL — every
    # registered consumer filters or COALESCEs nulls first, so only
    # non-null rows are held to exact agreement here.
    assert not bad, {i: (NASTY[i], *bad[i]) for i in bad}


def test_lower_u0130_divergence_is_real(spark):
    """Pin the divergence itself so the domain guard below can never
    silently become vacuous: Spark lower('İ') keeps the combining dot
    (U+0307), DuckDB's drops it. If an engine upgrade converges them,
    this fails and the guard (and the round-14 note) can be retired."""
    import duckdb

    s = (
        spark.createDataFrame([("İ",)], "text string")
        .select(F.lower("text").alias("lo"))
        .collect()[0]
        .lo
    )
    d = duckdb.connect().execute("SELECT lower('İ')").fetchone()[0]
    assert s == "i̇"
    assert d == "i"
    assert s != d


@pytest.mark.parametrize("sf_dir", SFS)
def test_corpora_carry_no_lowercase_divergent_chars(sf_dir):
    """Domain guard for doc_prefix_dup_groups: no fixture corpus may
    contain U+0130 (the only lower() divergence the nasty-string sweep
    found), so the query's cross-engine hash equality is grounded in
    the data domain, not luck."""
    import duckdb

    n = (
        duckdb.connect()
        .execute(
            "SELECT COUNT(*) FROM "
            f"read_parquet('{sf_dir}/documents.parquet') "
            "WHERE contains(text, 'İ')"
        )
        .fetchone()[0]
    )
    assert n == 0


def test_date_format_mirrors_agree_on_edge_dates(spark):
    """The date_format <-> strftime mirror pairs used across the
    oracles ('yyyy-MM-dd'/'%Y-%m-%d', 'yyyy-MM', 'yyyy', 'EEEE'/
    dayname) agree on edge dates: year 1, a two-digit year (zero
    padding), the Gregorian cutover gap (both engines are proleptic),
    leap days incl. the 2000 century exception, and year 9999."""
    import datetime

    import duckdb
    import pandas as pd

    dates = [
        datetime.date(1, 1, 1),
        datetime.date(32, 7, 15),
        datetime.date(999, 12, 31),
        datetime.date(1000, 1, 1),
        datetime.date(1582, 10, 4),
        datetime.date(1582, 10, 15),
        datetime.date(1899, 12, 31),
        datetime.date(1970, 1, 1),
        datetime.date(1996, 2, 29),
        datetime.date(2000, 2, 29),
        datetime.date(9999, 12, 31),
    ]
    rows = [(i, d) for i, d in enumerate(dates)]
    df = spark.createDataFrame(rows, "id long, d date")
    got = {
        r.id: (r.ymd, r.ym, r.y, r.dow)
        for r in df.select(
            "id",
            F.date_format("d", "yyyy-MM-dd").alias("ymd"),
            F.date_format("d", "yyyy-MM").alias("ym"),
            F.date_format("d", "yyyy").alias("y"),
            F.date_format("d", "EEEE").alias("dow"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "d"]))
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            "SELECT id, strftime(d,'%Y-%m-%d'), strftime(d,'%Y-%m'),"
            " strftime(d,'%Y'), dayname(d) FROM t"
        ).fetchall()
    }
    bad = {dates[i]: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not bad, bad


def test_round_scale_n_divergence_is_real(spark):
    """ROUND(x, n > 0) on doubles is cross-engine DIVERGENT on a thin
    set of inputs: Spark rounds the SHORTEST DECIMAL REPR half-up
    (BigDecimal.valueOf), DuckDB rounds the x*10^n double PRODUCT — so
    1.005 / 1.015 / 1.025 (binary values just below their repr, with
    product error also below) split the engines, while 2.675 / 0.045
    (product error above) agree. Scale-0 quantization to an integer
    grid — ROUND(x*100), the repo's cents/1e-6 discipline — is the
    tie-safe form: exact binary .5 doubles exist there and both
    engines round them away from zero identically (second half of
    this test). The 370-query selfchecks green at both SFs are the
    empirical proof no fixture value currently lands in the divergent
    set; new oracles should keep final mirrored doubles on integer
    grids (SCALING.md note)."""
    import duckdb

    con = duckdb.connect()

    diverge = [1.005, 1.015, 1.025]
    rows = [(i, v) for i, v in enumerate(diverge)]
    df = spark.createDataFrame(rows, "id long, x double")
    s = {r.id: r.r2 for r in df.select("id", F.round("x", 2).alias("r2")).collect()}
    for i, v in enumerate(diverge):
        d = con.execute(f"SELECT ROUND({v!r}::DOUBLE, 2)").fetchone()[0]
        assert s[i] != d, (v, s[i], d)  # pin: the divergence exists

    # tie-safe form: scale-0 round after integer scaling agrees even
    # on EXACT binary ties (k + 0.5 is dyadic) and away-from-zero
    # negatives
    ties = [0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 100.5, -100.5]
    rows = [(i, v) for i, v in enumerate(ties)]
    df = spark.createDataFrame(rows, "id long, x double")
    s0 = {
        r.id: r.c
        for r in df.select(
            "id", F.round(F.col("x")).cast("long").alias("c")
        ).collect()
    }
    for i, v in enumerate(ties):
        d = con.execute(f"SELECT CAST(ROUND({v!r}::DOUBLE) AS BIGINT)").fetchone()[0]
        assert s0[i] == d, (v, s0[i], d)


def test_epoch_seconds_mirror_divergence_zones(spark):
    """The FLOOR-epoch discipline (round 11) makes unix_timestamp and
    FLOOR(epoch()) agree on the fixtures' domain, but the primitive
    sweep found its two residual divergence zones, pinned here so they
    stay KNOWN rather than rediscovered:

    - PRE-EPOCH fractional timestamps: Spark's unix_timestamp
      truncates toward zero (1969-12-31 23:59:59.999999 -> 0) while
      FLOOR(epoch()) floors (-1). Every fixture timestamp is >= 1990,
      so no registered oracle crosses this.
    - FAR-FUTURE timestamps: DuckDB's epoch() returns DOUBLE, and at
      year 9999 (epoch ~2.5e11) the microsecond fraction exceeds
      double's 2^52 integer grid — 253402300799.999999 rounds to
      ...800.0 before FLOOR. Double epochs carry microseconds exactly
      only while |epoch| < ~2^52/1e6 (~year 2112).

    Also pins the agreement on the fixtures' actual domain: in-range
    post-epoch timestamps with and without fractional seconds."""
    import datetime

    import duckdb

    cases = [
        (datetime.datetime(1969, 12, 31, 23, 59, 59, 999999), 0, -1),
        (datetime.datetime(9999, 12, 31, 23, 59, 59, 999999),
         253402300799, 253402300800),
    ]
    rows = [(i, t) for i, (t, _, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    s = {
        r.id: r.ep
        for r in df.select(
            "id", F.unix_timestamp("ts").cast("long").alias("ep")
        ).collect()
    }
    con = duckdb.connect()
    for i, (t, want_s, want_d) in enumerate(cases):
        d = con.execute(
            f"SELECT CAST(FLOOR(epoch(TIMESTAMP '{t}')) AS BIGINT)"
        ).fetchone()[0]
        assert s[i] == want_s, (t, s[i])
        assert d == want_d, (t, d)
        assert s[i] != d

    domain = [
        datetime.datetime(1992, 1, 1, 0, 0, 0),
        datetime.datetime(1995, 6, 15, 23, 59, 59, 500000),
        datetime.datetime(1998, 12, 31, 12, 34, 56, 999999),
        datetime.datetime(2038, 1, 19, 3, 14, 8),
    ]
    rows = [(i, t) for i, t in enumerate(domain)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    s = {
        r.id: r.ep
        for r in df.select(
            "id", F.unix_timestamp("ts").cast("long").alias("ep")
        ).collect()
    }
    for i, t in enumerate(domain):
        d = con.execute(
            f"SELECT CAST(FLOOR(epoch(TIMESTAMP '{t}')) AS BIGINT)"
        ).fetchone()[0]
        assert s[i] == d, (t, s[i], d)


def test_ascii_returns_full_codepoints_in_all_three_spellings(spark):
    """The winnow-hash premise (functions/text.py WINNOW_B note): Spark
    ascii(), DuckDB ascii(), and Python ord() all return the FULL
    Unicode codepoint — including astral-plane characters, where a
    UTF-16-based engine could leak a surrogate (0xD800-0xDFFF) and
    silently fork every polynomial gram hash on emoji-bearing text."""
    import duckdb

    chars = ["a", "é", "а", "☃", "\U0001F600", "\U0001F680", "\U00010000"]
    rows = [(i, c) for i, c in enumerate(chars)]
    df = spark.createDataFrame(rows, "id long, c string")
    got = {
        r.id: r.code
        for r in df.select("id", F.ascii("c").alias("code")).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(chars):
        d = con.execute("SELECT ascii(?)", [c]).fetchone()[0]
        assert got[i] == d == ord(c), (c, got[i], d, ord(c))
