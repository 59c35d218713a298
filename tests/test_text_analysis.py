

def test_fuzzy_string_pairs_fastss(spark):
    from cdc_poc_spark.operators.text_analysis import fuzzy_string_pairs

    df = spark.createDataFrame(
        [("kitten",), ("sitten",), ("kittens",), ("kitte",), ("zebra",),
         ("",), ("a",)],
        "name string",
    )
    got = {(r.val_a, r.val_b) for r in fuzzy_string_pairs(df, "name").collect()}
    # substitution, insertion, deletion all at distance 1; zebra isolated
    assert ("kitten", "sitten") in got
    assert ("kitten", "kittens") in got
    assert ("kitte", "kitten") in got
    assert not any("zebra" in p for p in got)
    assert ("", "a") in got  # empty vs 1-char is a legit distance-1 pair
    assert ("kitte", "kittens") not in got  # distance 2 excluded
