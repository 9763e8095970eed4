

def test_fuzzy_dedup_keep_end_to_end(ray_session):
    import pyarrow as pa
    import ray.data

    from crawlray.ops.dedup import fuzzy_dedup_keep

    # 20 distinct docs with disjoint vocabularies; near-dup variants of
    # docs 3 and 7 (one token changed out of 10 -> jaccard 9/11 ~ 0.82),
    # plus a chain 7 -> 107 -> 207 to exercise transitivity
    base = {
        i: " ".join(f"tok{i}x{k}" for k in range(10)) for i in range(20)
    }
    texts = dict(base)
    texts[103] = base[3].replace("tok3x9", "tok3x9b")
    texts[107] = base[7].replace("tok7x9", "tok7x9b")
    texts[207] = texts[107].replace("tok7x8", "tok7x8b")
    ids = sorted(texts)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "extra": pa.array([i * 2 for i in ids], pa.int64()),
            }
        )
    ).repartition(5)
    out = fuzzy_dedup_keep(ds, jaccard_threshold=0.6)
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    kept = sorted(t.column("doc_id").to_pylist())
    assert kept == sorted(set(range(20)))  # variants dropped, reps kept
    assert set(t.column_names) == {"doc_id", "text", "extra"}  # cols survive


def test_fuzzy_dedup_keep_no_dups_is_identity(ray_session):
    import pyarrow as pa
    import ray.data

    from crawlray.ops.dedup import fuzzy_dedup_keep

    tbl = pa.table(
        {
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array(
                [" ".join(f"w{i}y{k}" for k in range(8)) for i in range(12)]
            ),
        }
    )
    out = fuzzy_dedup_keep(ray.data.from_arrow(tbl), jaccard_threshold=0.5)
    got = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    assert sorted(got.column("doc_id").to_pylist()) == list(range(12))
