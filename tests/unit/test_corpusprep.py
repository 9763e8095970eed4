"""pack_sequences and decontaminate vs DuckDB on the driver's parquet."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("override_blocks", [None, 1, 7])
def test_pack_sequences_matches_window_oracle(ray_session, override_blocks):
    from crawlray.ops.corpusprep import pack_sequences

    kwargs = {}
    if override_blocks:
        kwargs["override_num_blocks"] = override_blocks
    ds = ray.data.read_parquet(
        DOCS, columns=["source", "doc_id", "text"], **kwargs
    )
    got = pack_sequences(ds, budget=256).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
               CAST((SUM(n_tokens) OVER w - n_tokens) // 256 AS BIGINT)
                   AS pack_id
        FROM (SELECT source, doc_id, LEN(str_split(text, ' ')) AS n_tokens
              FROM '{DOCS}')
        WINDOW w AS (PARTITION BY source ORDER BY doc_id)
        """
    ).df()
    assert len(got) == len(want) > 0
    assert want["pack_id"].max() >= 2  # multiple packs actually exercised
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_word_ngrams_matches_unnest_oracle(ray_session):
    from crawlray.ops.corpusprep import word_ngrams

    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    got = word_ngrams(ds, n=8).to_pandas()
    want = duckdb.sql(
        f"""
        WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM '{DOCS}')
        SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram
        FROM toks, UNNEST(range(1, GREATEST(LEN(t)-7, 0)+1)) AS u(i)
        """
    ).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_decontaminate_matches_join_oracle(ray_session):
    from crawlray.ops.corpusprep import decontaminate
    from crawlray.ops.relational import hash_sample

    docs = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    bench = hash_sample(docs, key="doc_id", buckets_kept=16)
    cand = hash_sample(docs, key="doc_id", buckets_kept=16, invert=True)
    got = decontaminate(cand, bench, n=8).to_pandas()
    want = duckdb.sql(
        f"""
        WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM '{DOCS}'),
        grams AS (
          SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
          FROM toks, UNNEST(range(1, GREATEST(LEN(t)-7, 0)+1)) AS u(i)
        ),
        bench AS (SELECT DISTINCT g FROM grams
                  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10'),
        cand AS (SELECT DISTINCT doc_id, g FROM grams
                 WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '10')
        SELECT cand.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM cand JOIN bench USING (g)
        GROUP BY cand.doc_id
        """
    ).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_hash_sample_invert_partitions_exactly(ray_session):
    from crawlray.ops.relational import hash_sample

    docs = ray.data.read_parquet(DOCS, columns=["doc_id"])
    total = pq.read_metadata(DOCS).num_rows
    kept = hash_sample(docs, key="doc_id", buckets_kept=16).count()
    dropped = hash_sample(
        docs, key="doc_id", buckets_kept=16, invert=True
    ).count()
    assert kept + dropped == total
    assert kept > 0 and dropped > 0
