"""Unicode hygiene operators: cleanup chain, mojibake detect/repair,
NFC normalization — unit goldens, an invertibility property, and plan
locks (the detectors must stay whole-JVM map-only)."""

from __future__ import annotations

import unicodedata

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from energy_pandas_spark.operators.normalize import (
    _fix_text,
    _sloppy_encode,
    clean_text,
    clean_text_stats,
    cleaned_text,
    fix_mojibake,
    mojibake_stats,
    nfc_text,
)
from energy_pandas_spark.plans.explain import exchange_count


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


class TestCleanText:
    def test_full_chain_golden(self, spark):
        dirty = (
            "\tA\x00B\x07 start \r\nline2\rline3  \n  tail​"
            "zw nb em　ideo  end  "
        )
        out = clean_text(_one(spark, dirty)).collect()[0].text
        assert out == "AB start\nline2\nline3\ntailzw nb em ideo end"
        # zero-width stripped in the full stats path too
        row = clean_text_stats(_one(spark, dirty)).collect()[0]
        assert "​" not in row.text_clean

    def test_counts_and_changed(self, spark):
        row = clean_text_stats(
            _one(spark, "a\x01b‌﻿c  d")
        ).collect()[0]
        assert (row.n_ctrl, row.n_zero_width, row.n_alt_space) == (1, 2, 2)
        assert row.changed
        assert row.text_clean == "ab‌﻿c d".replace(
            "‌", ""
        ).replace("﻿", "")

    def test_clean_noop_on_clean_text(self, spark):
        row = clean_text_stats(_one(spark, "plain text\nsecond line")).collect()[0]
        assert not row.changed
        assert (row.n_ctrl, row.n_zero_width, row.n_alt_space) == (0, 0, 0)

    def test_null_text(self, spark):
        row = clean_text_stats(_one(spark, None)).collect()[0]
        assert row.text_clean == ""
        assert row.n_ctrl == 0

    def test_in_place_out_col_still_reports_changed(self, spark):
        # regression: a trailing withColumn would compare the cleaned
        # text to itself when out_col == text_col
        rows = clean_text_stats(
            _one(spark, "a\x01b  c"), out_col="text"
        ).collect()[0]
        assert rows.text == "ab c"
        assert rows.changed
        clean = clean_text_stats(
            _one(spark, "already clean"), out_col="text"
        ).collect()[0]
        assert not clean.changed

    def test_c1_block_stripped(self, spark):
        out = clean_text(_one(spark, "a\x85b\x9fc")).collect()[0].text
        assert out == "abc"


class TestMojibake:
    def test_detects_classic_artifacts(self, spark):
        row = mojibake_stats(
            _one(spark, "cafÃ© â€™tis Â«q")
        ).collect()[0]
        assert row.n_mojibake == 3
        assert row.mojibake_flag

    def test_clean_text_not_flagged(self, spark):
        # legit accents / a lone Ã with a plain follower must not match
        row = mojibake_stats(_one(spark, "café naïve Ã x")).collect()[0]
        assert row.n_mojibake == 0
        assert not row.mojibake_flag

    def test_fix_golden(self, spark):
        broken = "cafÃ© â€™tis"
        out = fix_mojibake(_one(spark, broken)).collect()[0].text
        assert out == "café ’tis"

    def test_fix_double_encoded(self):
        s = "déjà vu — ok"
        once = _corrupt(s)
        twice = _corrupt(once)
        assert _fix_text(twice, max_rounds=3) == s

    def test_fix_leaves_unflagged_rows_untouched(self, spark):
        # 'café' round-trips cp1252 but is NOT utf-8 bytes — and the
        # JVM gate never flags it, so the kernel must pass it through
        out = fix_mojibake(_one(spark, "café naïve")).collect()[0].text
        assert out == "café naïve"

    def test_fix_null(self, spark):
        assert fix_mojibake(_one(spark, None)).collect()[0].text is None

    def test_non_cp1252_text_untouched(self):
        s = "日本語 Ã©"  # CJK can't encode to cp1252
        assert _fix_text(s, 3) == s


def _corrupt(s: str) -> str:
    """The breakage being repaired: UTF-8 bytes decoded as sloppy
    cp1252 (holes fall back to latin-1)."""
    from energy_pandas_spark.operators.normalize import _BYTE_TO_CP

    return "".join(chr(_BYTE_TO_CP[b]) for b in s.encode("utf-8"))


# alphabet: printable Latin-1 + curly punctuation — the chars whose
# UTF-8 encodings produce the classic artifact pairs
_ALPHABET = st.characters(
    whitelist_categories=("L", "N", "P", "S", "Z"),
    max_codepoint=0x2122,
)


class TestFixInvertibility:
    @settings(max_examples=60, deadline=None)
    @given(st.text(_ALPHABET, min_size=0, max_size=40))
    def test_fix_inverts_corrupt(self, s):
        s = unicodedata.normalize("NFC", s)
        corrupted = _corrupt(s)
        fixed = _fix_text(corrupted, max_rounds=3)
        # _fix_text stops at a fixed point; one corruption, one repair
        assert fixed == s or _sloppy_encode(s) is not None and (
            # strings that THEMSELVES round-trip cp1252->utf-8 are
            # ambiguous by construction (e.g. ''); repair may go deeper
            _fix_text(s, max_rounds=3) == fixed
        )

    @settings(max_examples=30, deadline=None)
    @given(st.text(st.characters(min_codepoint=32, max_codepoint=126),
                   max_size=40))
    def test_ascii_is_fixed_point(self, s):
        assert _fix_text(s, max_rounds=3) == s


class TestNfc:
    def test_composes_combining_sequences(self, spark):
        decomposed = "é Å 각"
        out = nfc_text(
            _one(spark, decomposed), out_col="t2", changed_col="chg"
        ).collect()[0]
        assert out.t2 == "é Å 각"
        assert out.chg

    def test_ccc_reordering(self, spark):
        # dot-above then dot-below: NFC reorders (ccc 220 < 230) and
        # composes d+0323 first — the classic normalization test
        out = nfc_text(_one(spark, "ḍ̇")).collect()[0].text
        assert out == "ḍ̇"

    def test_ascii_unchanged_and_null(self, spark):
        df = spark.createDataFrame(
            [(1, "plain"), (2, None)], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in
                nfc_text(df, out_col="t2", changed_col="chg").collect()}
        assert rows[1].t2 == "plain" and rows[1].chg is False
        assert rows[2].t2 is None and rows[2].chg is False

    def test_bad_form_rejected(self, spark):
        with pytest.raises(ValueError):
            nfc_text(_one(spark, "x"), form="NFX")

    def test_changed_requires_out_col(self, spark):
        with pytest.raises(ValueError):
            nfc_text(_one(spark, "x"), changed_col="chg")


class TestNormalizePlans:
    def test_detectors_are_map_only_jvm(self, spark):
        df = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t "), F.col("id").cast("string")).alias("text"),
        )
        for out in (clean_text_stats(df), mojibake_stats(df)):
            assert exchange_count(out) == 0
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Python" not in plan

    def test_fix_mojibake_single_arrow_kernel(self, spark):
        df = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.lit("cafÃ©").alias("text"),
        )
        plan = (
            fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan
