

def test_lsh_bucket_histogram_pair_mass(spark):
    from hebrew_ner_spark.operators import dedup
    # 1000 identical docs -> every band bucket holds all 1000 (bitlen 10),
    # pair mass = bands * 999*1000/2; plus one unique doc in singletons.
    docs = spark.createDataFrame(
        [(i, "the same exact document text for everyone here") for i in range(1000)]
        + [(5000, "a completely different text with other tokens inside")],
        "doc_id long, text string",
    )
    got = {r["bucket"]: (r["n_buckets"], r["pair_mass"])
           for r in dedup.lsh_bucket_histogram(docs).collect()}
    assert got[10] == (dedup.LSH_BANDS, dedup.LSH_BANDS * (1000 * 999) // 2)
    assert got[1] == (dedup.LSH_BANDS, 0)   # singleton buckets carry no pairs
