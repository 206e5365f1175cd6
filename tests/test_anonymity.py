"""Tests for operators.anonymity: k-anonymity / l-diversity audits,
suppression, generalization, and keyed pseudonymization."""

import pytest

from pyspark.sql import functions as F

from pipelinedp_spark.operators.anonymity import (
    generalize_bucket, k_anonymity_report, l_diversity_report,
    pseudonym_collision_audit, pseudonymize, suppress_small_groups)


def _people(spark):
    rows = [
        # (zip3, age, diagnosis)
        (0, "021", 30, "flu"), (1, "021", 30, "flu"),
        (2, "021", 30, "cold"), (3, "021", 30, "flu"),
        (4, "946", 40, "flu"),                     # singleton class
        (5, "113", 50, "covid"), (6, "113", 50, "covid"),
    ]
    return spark.createDataFrame(
        rows, "pid long, zip3 string, age int, diagnosis string")


def test_k_anonymity_report_flags_small_classes(spark):
    rep = {(r["zip3"], r["age"]): (r["group_size"], r["meets_k"])
           for r in k_anonymity_report(
               _people(spark), ["zip3", "age"], k=2).collect()}
    assert rep[("021", 30)] == (4, True)
    assert rep[("946", 40)] == (1, False)
    assert rep[("113", 50)] == (2, True)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_report(_people(spark), ["zip3"], k=0)


def test_l_diversity_flags_homogeneous_class(spark):
    rep = {(r["zip3"], r["age"]): (r["n_sensitive"], r["meets_l"])
           for r in l_diversity_report(
               _people(spark), ["zip3", "age"], "diagnosis",
               l=2).collect()}
    assert rep[("021", 30)] == (2, True)      # flu + cold
    # k-anonymous (size 2) but every member shares one diagnosis:
    # the homogeneity leak l-diversity exists to catch
    assert rep[("113", 50)] == (1, False)


def test_suppress_small_groups_reaches_k(spark):
    out = suppress_small_groups(_people(spark), ["zip3", "age"], k=2)
    ids = sorted(r["pid"] for r in out.collect())
    assert ids == [0, 1, 2, 3, 5, 6]          # singleton pid 4 dropped
    rep = k_anonymity_report(out, ["zip3", "age"], k=2)
    assert all(r["meets_k"] for r in rep.collect())


def test_generalize_bucket_and_validation(spark):
    df = spark.createDataFrame([(33.7,), (35.0,), (-2.1,)], "v double")
    got = [r["b"] for r in df.select(
        generalize_bucket(F.col("v"), 5.0).alias("b")).collect()]
    assert got == [30.0, 35.0, -5.0]
    with pytest.raises(ValueError, match="width"):
        generalize_bucket(F.col("v"), 0)


def test_pseudonymize_stable_and_salt_sensitive(spark):
    df = spark.createDataFrame([(7, "a"), (8, "b"), (7, "c")],
                               "uid long, x string")
    p1 = pseudonymize(df, ["uid"], salt="s1")
    assert "uid" not in p1.columns and "uid_pseudo" in p1.columns
    vals = {r["x"]: r["uid_pseudo"] for r in p1.collect()}
    assert vals["a"] == vals["c"]              # stable within salt
    p2 = {r["x"]: r["uid_pseudo"]
          for r in pseudonymize(df, ["uid"], salt="s2").collect()}
    assert p2["a"] != vals["a"]                # rotates with the salt
    kept = pseudonymize(df, ["uid"], salt="s1", drop_original=False)
    assert "uid" in kept.columns
    with pytest.raises(ValueError, match="salt"):
        pseudonymize(df, ["uid"], salt="")


def test_pseudonym_collision_audit_clean(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "uid long")
    row = pseudonym_collision_audit(df, "uid", "s1").collect()[0]
    assert row["n_ids"] == 50 == row["n_pseudonyms"]
    assert row["collision_free"]


# ---------------------------------------------------------------------------
# release manifests
# ---------------------------------------------------------------------------

def test_corpus_manifest_detects_any_change_and_is_incremental(spark):
    from pipelinedp_spark.operators.release import (corpus_manifest,
                                                    doc_content_hash,
                                                    schema_fingerprint)
    rows = [(0, "alpha text", "a"), (1, "beta text", "a"),
            (2, "gamma text", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    m = {r["group"]: r for r in corpus_manifest(df).collect()}
    assert m["a"]["n_docs"] == 2 and m["b"]["n_docs"] == 1
    # editing one doc changes exactly its group's checksum
    df2 = spark.createDataFrame(
        [(0, "alpha text EDITED", "a"), (1, "beta text", "a"),
         (2, "gamma text", "b")],
        "doc_id long, text string, source string")
    m2 = {r["group"]: r for r in corpus_manifest(df2).collect()}
    assert m2["a"]["content_xor"] != m["a"]["content_xor"]
    assert m2["b"]["content_xor"] == m["b"]["content_xor"]
    # swapping texts between ids changes the checksum even though the
    # text multiset is identical (the hash binds id AND text)
    df3 = spark.createDataFrame(
        [(0, "beta text", "a"), (1, "alpha text", "a"),
         (2, "gamma text", "b")],
        "doc_id long, text string, source string")
    m3 = {r["group"]: r for r in corpus_manifest(df3).collect()}
    assert m3["a"]["content_xor"] != m["a"]["content_xor"]
    # incremental patch: XOR of old and new doc-hash updates the group
    old_h = df.select(doc_content_hash()).collect()[0][0]
    new_h = df2.select(doc_content_hash()).collect()[0][0]
    assert m["a"]["content_xor"] ^ old_h ^ new_h == m2["a"]["content_xor"]
    # schema drift alarm
    assert schema_fingerprint(df) == schema_fingerprint(df2)
    assert schema_fingerprint(df) != schema_fingerprint(
        df.withColumn("extra", df.doc_id))


# ---------------------------------------------------------------------------
# chat rendering (SFT prep)
# ---------------------------------------------------------------------------

def test_render_chat_spans_and_stats(spark):
    from pipelinedp_spark.operators.chat import (conversation_stats,
                                                 render_chat)
    rows = [
        (0, [("system", "be brief"), ("user", "hi"),
             ("assistant", "hello"), ("user", "bye"),
             ("assistant", "later")]),
        (1, [("user", "a"), ("user", "b"), ("assistant", "c")]),
        (2, [("user", "only a question")]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, messages array<struct<"
              "role string, content string>>")
    out = {r["doc_id"]: r for r in render_chat(df).collect()}
    t0 = out[0]["text"]
    # every assistant span slices exactly the assistant content
    got = [t0[s["s"]:s["e"]] for s in out[0]["assistant_spans"]]
    assert got == ["hello", "later"]
    assert t0.startswith("<|im_start|>system\nbe brief<|im_end|>\n")
    assert out[0]["n_chars"] == len(t0)
    assert out[2]["assistant_spans"] == []
    st = {r["doc_id"]: r for r in conversation_stats(df).collect()}
    assert st[0]["alternation_ok"] and st[0]["ends_assistant"]
    assert st[0]["n_turns"] == 5 and st[0]["n_system"] == 1
    assert not st[1]["alternation_ok"]          # user,user repeats
    assert st[1]["ends_assistant"]
    assert not st[2]["ends_assistant"] and st[2]["n_assistant"] == 0


def test_preference_pairs_rules(spark):
    from pipelinedp_spark.operators.chat import preference_pairs
    rows = [
        ("p1", "weak answer", 1.0, 10),
        ("p1", "strong answer", 9.0, 11),
        ("p1", "middle answer", 5.0, 12),
        ("p2", "only response", 4.0, 20),          # singleton: dropped
        ("p3", "tie a", 3.0, 30), ("p3", "tie b", 3.0, 31),  # margin 0
    ]
    df = spark.createDataFrame(
        rows, "prompt string, response string, score double, "
              "resp_id long")
    out = {r["prompt"]: r for r in
           preference_pairs(df, min_margin=1.0).collect()}
    assert set(out) == {"p1"}                      # p2 singleton, p3 margin
    assert out["p1"]["chosen"] == "strong answer"
    assert out["p1"]["rejected"] == "weak answer"
    assert out["p1"]["margin"] == 8.0
    # margin 0 allowed when min_margin=0, but identical rows never pair
    out0 = {r["prompt"]: r for r in preference_pairs(df).collect()}
    assert out0["p3"]["chosen"] == "tie a"         # min id wins the tie
    assert out0["p3"]["rejected"] == "tie b"


def test_apply_changes_latest_wins_and_tombstones(spark):
    from pipelinedp_spark.operators.scd import apply_changes
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)],
        "k long, v string, version long")
    upd = spark.createDataFrame(
        [(1, "a2", 2, False), (1, "a1", 1, False),   # 2 updates: max wins
         (2, "dead", 3, True),                        # tombstone
         (4, "new", 1, False)],                       # insert
        "k long, v string, version long, _deleted boolean")
    out = {r["k"]: r for r in
           apply_changes(base, upd, "k", "version").collect()}
    assert set(out) == {1, 3, 4}                      # 2 deleted
    assert out[1]["v"] == "a2" and out[1]["version"] == 2
    assert out[3]["v"] == "c"                         # untouched base row
    assert out[4]["v"] == "new"
    import pytest as _pt
    with _pt.raises(ValueError, match="schemas differ"):
        apply_changes(base, upd.drop("v"), "k", "version")
