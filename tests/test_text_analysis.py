

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


def test_pii_stats_and_redact(spark):
    from cdc_poc_spark.operators.privacy import pii_redact, pii_stats

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 555-123-4567 or ssn 123-45-6789"),
            (3, "host 192.168.1.254 up"),
            (4, "clean text with no pii at all"),
            (5, "a@b.io and c_d%e@f-g.museum twice"),
            (6, "not-a-phone 55-123-4567 and 5551234567"),
            (7, "reach 555-123-4567@relay.example.com now"),
        ],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in pii_stats(df).collect()}
    assert stats[1].n_email == 1 and stats[1].has_pii
    assert stats[2].n_phone == 1 and stats[2].n_ssn == 1
    assert stats[3].n_ipv4 == 1
    assert not stats[4].has_pii
    assert stats[5].n_email == 2
    assert not stats[6].has_pii  # wrong group widths / no separators
    red = {r.doc_id: r for r in pii_redact(df).collect()}
    assert red[1].clean_text == "mail [EMAIL] now"
    assert red[2].clean_text == "call [PHONE] or ssn [SSN]"
    assert red[2].n_redactions == 2
    assert red[3].clean_text == "host [IPV4] up"
    assert red[4].clean_text == "clean text with no pii at all"
    assert red[4].n_redactions == 0
    # overlap: the email subsumes the phone-shaped local part — stats
    # count both kinds independently, but redaction makes ONE replacement
    assert stats[7].n_email == 1 and stats[7].n_phone == 1
    assert red[7].clean_text == "reach [EMAIL] now"
    assert red[7].n_redactions == 1


def test_nb_confusion_separable_corpus(spark):
    """On a perfectly separable corpus (disjoint class vocabularies) NB
    must put every document on the diagonal; a doc of unseen-for-its-
    class tokens must land with the class that owns them. This pins the
    operator's semantics independently of the SQL oracle."""
    from cdc_poc_spark.operators.classify import nb_confusion

    rows = (
        [(i, "apple banana cherry apple", "fruit") for i in range(4)]
        + [(10 + i, "iron copper zinc iron zinc", "metal") for i in range(4)]
        # a "metal"-labelled doc made of fruit words: NB must call it fruit
        + [(99, "apple banana", "metal")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.true_label, r.pred_label): r.n_docs
        for r in nb_confusion(docs).collect()
    }
    assert got == {
        ("fruit", "fruit"): 4,
        ("metal", "metal"): 4,
        ("metal", "fruit"): 1,
    }


def test_nb_confusion_skips_empty_docs(spark):
    from cdc_poc_spark.operators.classify import nb_confusion

    docs = spark.createDataFrame(
        [(0, "a b", "x"), (1, "", "y"), (2, "   ", "y")],
        "doc_id long, text string, lang string",
    )
    got = {(r.true_label, r.pred_label): r.n_docs for r in nb_confusion(docs).collect()}
    assert got == {("x", "x"): 1}
