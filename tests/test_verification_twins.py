"""The two LSH-off verification twins (unregistered in r6 — no
O(n²)-per-block query remains in the registry).

They survive as explicit verification=True operators; these tests keep
their DuckDB-oracle parity (previously provided by the registry sweep)
on the bounded sf0.001 fixture, and pin that the opt-in gate actually
gates."""

from __future__ import annotations

import pytest

from flink_cdc_2_3_0_src_spark.io import load_table as ld
from flink_cdc_2_3_0_src_spark.operators import dedup as _dedup
from flink_cdc_2_3_0_src_spark.operators import similarity as _sim
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare


def test_ngram_jaccard_requires_verification_opt_in(spark):
    with pytest.raises(ValueError, match="verification=True"):
        _dedup.ngram_jaccard_pairs(
            ld(spark, SF_SMOKE, "documents"), ["source", "lang"], 0.1
        )


def test_neardup_cosine_requires_verification_opt_in(spark):
    with pytest.raises(ValueError, match="verification=True"):
        _sim.neardup_cosine(ld(spark, SF_SMOKE, "embeddings"))


def test_ngram_jaccard_verification_matches_oracle(spark):
    got = _dedup.ngram_jaccard_pairs(
        ld(spark, SF_SMOKE, "documents"), ["source", "lang"], 0.1,
        verification=True,
    )
    assert compare(got, _dedup.NGRAM_JACCARD_SQL, SF_SMOKE) is None


def test_neardup_cosine_verification_matches_oracle(spark):
    got = _sim.neardup_cosine(
        ld(spark, SF_SMOKE, "embeddings"), verification=True
    )
    assert compare(got, _sim.NEARDUP_COSINE_SQL, SF_SMOKE) is None
